"""Fast (ELL) batched-forward path must match the COO segment-sum path."""

import jax
import numpy as np

import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.explain.masks import MaskSampler
from bikg_graph_explainability_public_tpu.graph import from_arrays
from bikg_graph_explainability_public_tpu.models.fast_gcn import FastBatchedGCN
from fixtures import make_graph


def _setup(conv_channels=(8,), n=30, e=90, f=12, seed=50):
    feat, ei, _ = make_graph(n=n, f=f, e=e, seed=seed)
    g = from_arrays(feat, ei)
    mdef = px.GCNNodeModel(f, conv_channels=conv_channels,
                           fc_channels=(conv_channels[-1], 8))
    params = mdef.init(jax.random.PRNGKey(seed))
    return g, mdef, params


class TestFastPathParity:
    def _compare(self, conv_channels, problem, seed=51):
        g, mdef, params = _setup(conv_channels=conv_channels, seed=seed)
        slow = px.Model(mdef, params, fast=False)
        fast = px.Model(mdef, params, fast=True)
        width = g.e_pad if "edge" in problem else g.n_pad
        n_el = g.num_edges if "edge" in problem else g.num_nodes
        sampler = MaskSampler(n_el, width, {"interpret_samples": 16, "epochs": 4}, None)
        masks, _, _ = sampler.sample(jax.random.PRNGKey(seed))
        query = None if "graph" in problem else 5
        a = np.asarray(slow.perturbed_query_outputs(g, masks, problem, query))
        b = np.asarray(fast.perturbed_query_outputs(g, masks, problem, query))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_one_layer_node(self):
        self._compare((8,), "node_prediction")

    def test_two_layer_node(self):
        self._compare((8, 8), "node_prediction", seed=52)

    def test_edge_problem(self):
        self._compare((8,), "edge_prediction", seed=53)

    def test_edge_problem_two_layers_dense_engine(self):
        self._compare((8, 8), "edge_prediction", seed=56)

    def test_graph_problem(self):
        self._compare((8,), "graph_prediction", seed=54)

    def test_graph_with_data_self_loops(self):
        feat, ei, _ = make_graph(n=20, f=6, e=50, seed=55, self_loops=True)
        assert (ei[0] == ei[1]).sum() > 0  # ensure the case is exercised
        g = from_arrays(feat, ei)
        mdef = px.GCNNodeModel(6, conv_channels=(4,), fc_channels=(4, 4))
        params = mdef.init(jax.random.PRNGKey(55))
        sampler = MaskSampler(20, g.n_pad, {"interpret_samples": 8, "epochs": 4}, None)
        masks, _, _ = sampler.sample(jax.random.PRNGKey(55))
        a = np.asarray(
            px.Model(mdef, params, fast=False).perturbed_query_outputs(
                g, masks, "node_prediction", 2
            )
        )
        b = np.asarray(
            px.Model(mdef, params, fast=True).perturbed_query_outputs(
                g, masks, "node_prediction", 2
            )
        )
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_forced_ell_mode_two_layers(self):
        """Exercise the ELL + sorted-CSR branch explicitly (small graphs
        default to dense mode)."""
        g, mdef, params = _setup(conv_channels=(8, 8), seed=60)
        slow = px.Model(mdef, params, fast=False)
        eng = FastBatchedGCN(mdef, params, g, mode="ell", restrict=False)
        sampler = MaskSampler(30, g.n_pad, {"interpret_samples": 16, "epochs": 4}, None)
        masks, _, _ = sampler.sample(jax.random.PRNGKey(60))
        a = np.asarray(slow.perturbed_query_outputs(g, masks, "node_prediction", 5))
        b = np.asarray(eng.query_outputs(masks, 5, "node_prediction"))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_forced_ell_mode_edge_problem(self):
        g, mdef, params = _setup(conv_channels=(8, 8), seed=61)
        slow = px.Model(mdef, params, fast=False)
        eng = FastBatchedGCN(mdef, params, g, mode="ell", restrict=False)
        sampler = MaskSampler(
            g.num_edges, g.e_pad, {"interpret_samples": 16, "epochs": 4}, None
        )
        masks, _, _ = sampler.sample(jax.random.PRNGKey(61))
        a = np.asarray(slow.perturbed_query_outputs(g, masks, "edge_prediction", 5))
        b = np.asarray(eng.query_outputs(masks, 5, "edge_prediction"))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_engine_direct(self):
        g, mdef, params = _setup()
        eng = FastBatchedGCN(mdef, params, g)
        sampler = MaskSampler(30, g.n_pad, {"interpret_samples": 8, "epochs": 2}, None)
        masks, _, _ = sampler.sample(jax.random.PRNGKey(1))
        out = np.asarray(eng.query_outputs(masks, 4))
        assert out.shape == (16,)
        assert np.isfinite(out).all()


class TestReceptiveFieldPlans:
    """The query-plan restricted paths must equal the unrestricted engine
    exactly (the query output cannot depend on nodes outside its ball)."""

    def _engines(self, conv_channels, n=40, e=160, f=10, seed=70, self_loops=True):
        feat, ei, _ = make_graph(n=n, f=f, e=e, seed=seed, self_loops=self_loops)
        # add duplicate edges (multigraph multiplicity must be preserved)
        ei = np.concatenate([ei, ei[:, :7]], axis=1)
        g = from_arrays(feat, ei)
        mdef = px.GCNNodeModel(f, conv_channels=conv_channels,
                               fc_channels=(conv_channels[-1], 8))
        params = mdef.init(jax.random.PRNGKey(seed))
        fast = FastBatchedGCN(mdef, params, g)
        ref = FastBatchedGCN(mdef, params, g, restrict=False)
        return g, fast, ref

    def _masks(self, g, width, n_el, seed):
        sampler = MaskSampler(n_el, width, {"interpret_samples": 12, "epochs": 4}, None)
        masks, _, _ = sampler.sample(jax.random.PRNGKey(seed))
        return masks

    def test_node_plan_three_layers(self):
        g, fast, ref = self._engines((8, 8, 8), seed=71)
        masks = self._masks(g, g.n_pad, g.num_nodes, 71)
        for q in (0, 5, g.num_nodes - 1):
            plan = fast.query_plan(q)
            assert plan is not None and plan.p_sizes[-1] >= 8
            a = np.asarray(ref.query_outputs(masks, q, "node_prediction"))
            b = np.asarray(fast.query_outputs(masks, q, "node_prediction"))
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_edge_plan_two_layers(self):
        g, fast, ref = self._engines((8, 8), seed=72)
        masks = self._masks(g, g.e_pad, g.num_edges, 72)
        for q in (0, 3):
            a = np.asarray(ref.query_outputs(masks, q, "edge_prediction"))
            b = np.asarray(fast.query_outputs(masks, q, "edge_prediction"))
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_isolated_query_node(self):
        """A node with no in-edges: plan ball is just the node itself."""
        feat = np.random.default_rng(0).normal(size=(12, 6)).astype(np.float32)
        ei = np.array([[1, 2, 3, 4], [2, 3, 4, 1]])  # node 0 isolated
        g = from_arrays(feat, ei)
        mdef = px.GCNNodeModel(6, conv_channels=(4, 4), fc_channels=(4, 4))
        params = mdef.init(jax.random.PRNGKey(3))
        fast = FastBatchedGCN(mdef, params, g)
        ref = FastBatchedGCN(mdef, params, g, restrict=False)
        masks = self._masks(g, g.n_pad, g.num_nodes, 73)
        a = np.asarray(ref.query_outputs(masks, 0, "node_prediction"))
        b = np.asarray(fast.query_outputs(masks, 0, "node_prediction"))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_ell_mode_uses_plan(self):
        g, fast, ref = self._engines((8, 8), seed=74)
        eng = FastBatchedGCN(fast.model_def, fast.params, g, mode="ell")
        masks = self._masks(g, g.n_pad, g.num_nodes, 74)
        a = np.asarray(ref.query_outputs(masks, 2, "node_prediction"))
        b = np.asarray(eng.query_outputs(masks, 2, "node_prediction"))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
