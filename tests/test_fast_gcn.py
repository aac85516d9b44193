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
        eng = FastBatchedGCN(mdef, params, g, mode="ell")
        sampler = MaskSampler(30, g.n_pad, {"interpret_samples": 16, "epochs": 4}, None)
        masks, _, _ = sampler.sample(jax.random.PRNGKey(60))
        a = np.asarray(slow.perturbed_query_outputs(g, masks, "node_prediction", 5))
        b = np.asarray(eng.query_outputs(masks, 5, "node_prediction"))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_forced_ell_mode_edge_problem(self):
        g, mdef, params = _setup(conv_channels=(8, 8), seed=61)
        slow = px.Model(mdef, params, fast=False)
        eng = FastBatchedGCN(mdef, params, g, mode="ell")
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
