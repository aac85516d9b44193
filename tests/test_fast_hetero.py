"""Hetero fast (dense per-relation) path must match the generic COO path."""

import os

import jax
import numpy as np
import pytest

import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.explain.masks import MaskSampler
from bikg_graph_explainability_public_tpu.graph import hetero_to_homo
from bikg_graph_explainability_public_tpu.models.fast_hetero import FastBatchedHeteroGCN
from bikg_graph_explainability_public_tpu.models.torch_import import (
    hetero_gcn_params,
    hetero_relations_from_state_dict,
    load_state_dict,
)

HETERO_CKPT = "/root/reference/test_data/gcn_hetero_1hop_lungCancer.pth.tar"


def _two_type_setup(seed=80, conv_channels=(6,)):
    rng = np.random.default_rng(seed)
    feat = {
        "a": rng.normal(size=(9, 5)).astype(np.float32),
        "b": rng.normal(size=(7, 5)).astype(np.float32),
    }
    relations = [("a", "r1", "b"), ("b", "r2", "a"), ("a", "r3", "a")]
    ei = {
        ("a", "r1", "b"): np.stack([rng.integers(0, 9, 12), rng.integers(0, 7, 12)]),
        ("b", "r2", "a"): np.stack([rng.integers(0, 7, 10), rng.integers(0, 9, 10)]),
        ("a", "r3", "a"): np.stack([rng.integers(0, 9, 8), rng.integers(0, 9, 8)]),
    }
    g, info = hetero_to_homo(feat, ei)
    mdef = px.hetero_gcn_for_relations(
        ["a", "b"], relations, in_features=5,
        conv_channels=conv_channels, fc_channels=(conv_channels[-1], 4),
    )
    params = mdef.init(jax.random.PRNGKey(seed))
    return g, mdef, params


class TestFastHeteroParity:
    def _compare(self, g, mdef, params, problem="node_prediction", query=3, seed=0):
        slow = px.Model(mdef, params, fast=False)
        sampler = MaskSampler(
            g.num_nodes, g.n_pad, {"interpret_samples": 16, "epochs": 4}, None
        )
        masks, _, _ = sampler.sample(jax.random.PRNGKey(seed))
        q = None if "graph" in problem else query
        a = np.asarray(slow.perturbed_query_outputs(g, masks, problem, q))
        eng = FastBatchedHeteroGCN(mdef, params, g)
        b = np.asarray(eng.query_outputs(masks, q, problem))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        # and via the adapter dispatch
        fast = px.Model(mdef, params, fast=True)
        c = np.asarray(fast.perturbed_query_outputs(g, masks, problem, q))
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)

    def test_two_type_one_layer(self):
        g, mdef, params = _two_type_setup()
        self._compare(g, mdef, params)

    def test_two_type_two_layers(self):
        g, mdef, params = _two_type_setup(seed=81, conv_channels=(6, 6))
        self._compare(g, mdef, params, seed=1)

    def test_graph_problem(self):
        g, mdef, params = _two_type_setup(seed=82)
        self._compare(g, mdef, params, problem="graph_prediction", seed=2)

    @pytest.mark.skipif(not os.path.exists(HETERO_CKPT), reason="checkpoint absent")
    def test_trained_checkpoint(self):
        rng = np.random.default_rng(83)
        sd = load_state_dict(HETERO_CKPT)
        rels = hetero_relations_from_state_dict(sd)
        mdef = px.hetero_gcn_for_relations(["gene"], rels, 84)
        params = hetero_gcn_params(sd)
        feat = {"gene": rng.normal(size=(16, 84)).astype(np.float32)}
        ei = {r: np.stack([rng.integers(0, 16, 20), rng.integers(0, 16, 20)]) for r in rels}
        g, _ = hetero_to_homo(feat, ei)
        self._compare(g, mdef, params, query=5, seed=3)

    def test_gat_falls_back(self):
        rng = np.random.default_rng(84)
        feat = {"a": rng.normal(size=(6, 4)).astype(np.float32)}
        rels = [("a", "r", "a")]
        ei = {("a", "r", "a"): np.stack([rng.integers(0, 6, 8), rng.integers(0, 6, 8)])}
        g, _ = hetero_to_homo(feat, ei)
        mdef = px.hetero_gat_for_relations(["a"], rels, 4, conv_channels=(3,), fc_channels=(3, 3))
        params = mdef.init(jax.random.PRNGKey(84))
        with pytest.raises(TypeError):
            FastBatchedHeteroGCN(mdef, params, g)
        # adapter silently uses the generic path
        sampler = MaskSampler(6, g.n_pad, {"interpret_samples": 4, "epochs": 2}, None)
        masks, _, _ = sampler.sample(jax.random.PRNGKey(84))
        out = px.Model(mdef, params).perturbed_query_outputs(
            g, masks, "node_prediction", 1
        )
        assert np.isfinite(np.asarray(out)).all()


class TestHeteroReceptiveFieldPlan:
    def _check(self, conv_channels, seed):
        g, mdef, params = _two_type_setup(seed=seed, conv_channels=conv_channels)
        fast = FastBatchedHeteroGCN(mdef, params, g)
        ref = FastBatchedHeteroGCN(mdef, params, g, restrict=False)
        rng = np.random.default_rng(seed)
        masks = rng.random((24, g.n_pad)) > 0.4
        for q in (0, 3, g.num_nodes - 1):
            a = np.asarray(ref.query_outputs(masks, q))
            b = np.asarray(fast.query_outputs(masks, q))
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_one_layer(self):
        self._check((6,), 83)

    def test_two_layers(self):
        self._check((6, 6), 84)


class TestFastHeteroGAT:
    def _gat_setup(self, seed=85, conv_channels=(6,), heads=1, self_loops=False):
        rng = np.random.default_rng(seed)
        feat = {
            "a": rng.normal(size=(9, 5)).astype(np.float32),
            "b": rng.normal(size=(7, 5)).astype(np.float32),
        }
        relations = [("a", "r1", "b"), ("b", "r2", "a"), ("a", "r3", "a")]
        ei = {
            ("a", "r1", "b"): np.stack([rng.integers(0, 9, 12), rng.integers(0, 7, 12)]),
            ("b", "r2", "a"): np.stack([rng.integers(0, 7, 10), rng.integers(0, 9, 10)]),
            ("a", "r3", "a"): np.stack([rng.integers(0, 9, 8), rng.integers(0, 9, 8)]),
        }
        if self_loops:
            ei[("a", "r3", "a")] = np.concatenate(
                [ei[("a", "r3", "a")], np.array([[2, 4], [2, 4]])], axis=1
            )
        g, info = hetero_to_homo(feat, ei)
        mdef = px.hetero_gat_for_relations(
            ["a", "b"], relations, in_features=5,
            conv_channels=conv_channels, fc_channels=(conv_channels[-1] * heads, 4),
        )
        params = mdef.init(jax.random.PRNGKey(seed))
        return g, mdef, params

    def _compare(self, g, mdef, params, seed=0, queries=(0, 3, 12)):
        from bikg_graph_explainability_public_tpu.models.fast_hetero import (
            FastBatchedHeteroGAT,
        )

        slow = px.Model(mdef, params, fast=False)
        eng = FastBatchedHeteroGAT(mdef, params, g)
        sampler = MaskSampler(
            g.num_nodes, g.n_pad, {"interpret_samples": 16, "epochs": 4}, None
        )
        masks, _, _ = sampler.sample(jax.random.PRNGKey(seed))
        for q in queries:
            a = np.asarray(slow.perturbed_query_outputs(g, masks, "node_prediction", q))
            b = np.asarray(eng.query_outputs(masks, q, "node_prediction"))
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        # adapter dispatch picks the GAT engine too
        fast = px.Model(mdef, params, fast=True)
        c = np.asarray(
            fast.perturbed_query_outputs(g, masks, "node_prediction", queries[0])
        )
        a0 = np.asarray(
            slow.perturbed_query_outputs(g, masks, "node_prediction", queries[0])
        )
        np.testing.assert_allclose(a0, c, rtol=1e-4, atol=1e-5)

    def test_one_layer(self):
        g, mdef, params = self._gat_setup(85)
        self._compare(g, mdef, params, seed=85)

    def test_two_layers_with_self_loops(self):
        g, mdef, params = self._gat_setup(86, conv_channels=(6, 6), self_loops=True)
        self._compare(g, mdef, params, seed=86)

    def test_graph_problem_falls_back(self):
        g, mdef, params = self._gat_setup(87)
        slow = px.Model(mdef, params, fast=False)
        fast = px.Model(mdef, params, fast=True)
        rng = np.random.default_rng(87)
        masks = rng.random((12, g.n_pad)) > 0.4
        a = np.asarray(slow.perturbed_query_outputs(g, masks, "graph_prediction", None))
        b = np.asarray(fast.perturbed_query_outputs(g, masks, "graph_prediction", None))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


class TestFastHeteroEdgeProblems:
    """Hetero edge-masked forwards via per-relation one-hot plans
    (VERDICT r2 item 4: edge problems previously always fell back to the
    generic COO path)."""

    def _compare_edge(self, conv_channels, seed=0, query=3):
        g, mdef, params = _two_type_setup(conv_channels=conv_channels)
        slow = px.Model(mdef, params, fast=False)
        sampler = MaskSampler(
            g.num_edges, g.e_pad, {"interpret_samples": 16, "epochs": 4}, None
        )
        masks, _, _ = sampler.sample(jax.random.PRNGKey(seed))
        problem = "edge_prediction"
        a = np.asarray(slow.perturbed_query_outputs(g, masks, problem, query))
        eng = FastBatchedHeteroGCN(mdef, params, g)
        plan = eng.edge_query_plan(query)
        assert plan is not None
        b = np.asarray(eng.query_outputs(masks, query, problem))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        fast = px.Model(mdef, params, fast=True)
        c = np.asarray(fast.perturbed_query_outputs(g, masks, problem, query))
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)

    def test_one_layer(self):
        self._compare_edge((6,))

    def test_two_layers(self):
        self._compare_edge((6, 5), query=1)

    def test_unrestricted_edge_declines(self):
        g, mdef, params = _two_type_setup()
        eng = FastBatchedHeteroGCN(mdef, params, g, restrict=False)
        masks = np.ones((4, g.e_pad), bool)
        assert eng.query_outputs(masks, 3, "edge_prediction") is None


class TestHeteroBeyondDenseCap:
    """Restricted node queries run at any size; only the unrestricted dense
    formulation is capped (lazy [R, N, N] adjacency)."""

    def test_restricted_node_query_beyond_cap(self, monkeypatch):
        g, mdef, params = _two_type_setup()
        monkeypatch.setattr(FastBatchedHeteroGCN, "DENSE_CAP", 4)
        slow = px.Model(mdef, params, fast=False)
        sampler = MaskSampler(
            g.num_nodes, g.n_pad, {"interpret_samples": 16, "epochs": 4}, None
        )
        masks, _, _ = sampler.sample(jax.random.PRNGKey(1))
        eng = FastBatchedHeteroGCN(mdef, params, g)
        assert eng._adj is None
        got = np.asarray(eng.query_outputs(masks, 3, "node_prediction"))
        assert eng._adj is None  # restricted path never built the dense adj
        want = np.asarray(
            slow.perturbed_query_outputs(g, masks, "node_prediction", 3)
        )
        np.testing.assert_allclose(want, got, rtol=1e-4, atol=1e-5)

    def test_graph_problem_beyond_cap_runs_ell(self, monkeypatch):
        """Beyond DENSE_CAP the unrestricted path runs the per-relation ELL
        tier (round-4: no more decline to the generic COO fallback)."""
        g, mdef, params = _two_type_setup(seed=86, conv_channels=(6, 6))
        monkeypatch.setattr(FastBatchedHeteroGCN, "DENSE_CAP", 4)
        slow = px.Model(mdef, params, fast=False)
        sampler = MaskSampler(
            g.num_nodes, g.n_pad, {"interpret_samples": 16, "epochs": 4}, None
        )
        masks, _, _ = sampler.sample(jax.random.PRNGKey(2))
        eng = FastBatchedHeteroGCN(mdef, params, g)
        got = np.asarray(eng.query_outputs(masks, None, "graph_prediction"))
        assert eng._adj is None  # ELL tier never built the dense adjacency
        want = np.asarray(
            slow.perturbed_query_outputs(g, masks, "graph_prediction", None)
        )
        np.testing.assert_allclose(want, got, rtol=1e-4, atol=1e-5)

    def test_unrestricted_node_beyond_cap_ell(self, monkeypatch):
        """Unrestricted node forwards beyond DENSE_CAP: ELL tier parity."""
        g, mdef, params = _two_type_setup(seed=87, conv_channels=(6, 6))
        monkeypatch.setattr(FastBatchedHeteroGCN, "DENSE_CAP", 4)
        slow = px.Model(mdef, params, fast=False)
        sampler = MaskSampler(
            g.num_nodes, g.n_pad, {"interpret_samples": 16, "epochs": 4}, None
        )
        masks, _, _ = sampler.sample(jax.random.PRNGKey(3))
        eng = FastBatchedHeteroGCN(mdef, params, g, restrict=False)
        got = np.asarray(eng.query_outputs(masks, 3, "node_prediction"))
        assert eng._adj is None
        want = np.asarray(
            slow.perturbed_query_outputs(g, masks, "node_prediction", 3)
        )
        np.testing.assert_allclose(want, got, rtol=1e-4, atol=1e-5)

    def test_unrestricted_edge_beyond_cap_ell(self, monkeypatch):
        """Unrestricted EDGE forwards beyond DENSE_CAP run the ELL tier's
        weighted path (round-5: the last configuration that declined to
        the generic COO fallback, VERDICT r4 missing 2)."""
        g, mdef, params = _two_type_setup(seed=89, conv_channels=(6, 6))
        monkeypatch.setattr(FastBatchedHeteroGCN, "DENSE_CAP", 4)
        slow = px.Model(mdef, params, fast=False)
        rng = np.random.default_rng(5)
        masks = jax.numpy.asarray(rng.random((12, g.e_pad)) < 0.6)
        eng = FastBatchedHeteroGCN(mdef, params, g, restrict=False)
        got = eng.query_outputs(masks, 3, "edge_prediction")
        assert got is not None  # served, not declined
        assert eng._adj is None
        want = np.asarray(
            slow.perturbed_query_outputs(g, masks, "edge_prediction", 3)
        )
        np.testing.assert_allclose(want, np.asarray(got), rtol=1e-4,
                                   atol=1e-5)

    def test_ell_tier_matches_dense_tier(self):
        """batch_node_outputs_ell == batch_node_outputs on a dense-sized
        graph (same engine, both tiers live)."""
        g, mdef, params = _two_type_setup(seed=88, conv_channels=(6, 6))
        eng = FastBatchedHeteroGCN(mdef, params, g)
        rng = np.random.default_rng(0)
        masks = rng.random((8, g.n_pad)) < 0.7
        a = np.asarray(eng.batch_node_outputs(masks))  # [B, N, C]
        b = np.asarray(eng.batch_node_outputs_ell(masks))  # [N, B, C]
        np.testing.assert_allclose(
            a, b.transpose(1, 0, 2), rtol=1e-4, atol=1e-5
        )

class TestHeteroSAGE:
    """Per-relation SAGEConv through HeteroGNN: PyG to_hetero semantics —
    every relation's output (root term included) lands on its destination
    type only (round-4 importer-zoo widening)."""

    def _setup(self, seed=90, conv_channels=(6,)):
        rng = np.random.default_rng(seed)
        feat = {
            "a": rng.normal(size=(9, 5)).astype(np.float32),
            "b": rng.normal(size=(7, 5)).astype(np.float32),
        }
        relations = [("a", "r1", "b"), ("b", "r2", "a"), ("a", "r3", "a")]
        ei = {
            ("a", "r1", "b"): np.stack(
                [rng.integers(0, 9, 12), rng.integers(0, 7, 12)]
            ),
            ("b", "r2", "a"): np.stack(
                [rng.integers(0, 7, 10), rng.integers(0, 9, 10)]
            ),
            ("a", "r3", "a"): np.stack(
                [rng.integers(0, 9, 8), rng.integers(0, 9, 8)]
            ),
        }
        g, info = hetero_to_homo(feat, ei)
        mdef = px.hetero_sage_for_relations(
            ["a", "b"], relations, in_features=5,
            conv_channels=conv_channels,
            fc_channels=(conv_channels[-1], 4),
        )
        params = mdef.init(jax.random.PRNGKey(seed))
        return g, mdef, params, relations

    def test_backbone_matches_dense_oracle(self):
        from fixtures import dense_sage_conv
        from bikg_graph_explainability_public_tpu.graph import host_view

        g, mdef, params, relations = self._setup()
        hv = host_view(g)
        ne = g.num_edges
        snd, rcv = hv.senders[:ne], hv.receivers[:ne]
        et, nt = hv.edge_type[:ne], hv.node_type
        got = np.asarray(
            mdef.backbone(
                params, g.x, g.senders, g.receivers,
                g.edge_mask.astype(np.float32), g.node_type, g.edge_type,
            )
        )
        x = np.asarray(hv.x, np.float64)
        for li, layer in enumerate(mdef.conv_layers):
            out = np.zeros((x.shape[0], 6))
            for ri, (rel, conv) in enumerate(layer.items()):
                p = params["conv"][li]["__".join(rel)]
                keep = et == ri
                contrib = dense_sage_conv(
                    x.astype(np.float32),
                    np.stack([snd[keep], rcv[keep]]),
                    np.asarray(p["lin_l"]["weight"]),
                    np.asarray(p["lin_l"].get("bias")),
                    np.asarray(p["lin_r"]["weight"]),
                )
                scope = (
                    nt == mdef.node_type_names.index(rel[-1])
                ) & hv.node_mask
                out += contrib * scope[:, None]
            x = np.maximum(out, 0.0)
        np.testing.assert_allclose(
            got[np.asarray(hv.node_mask)], x[np.asarray(hv.node_mask)],
            rtol=1e-4, atol=1e-5,
        )

    def test_importer_roundtrip(self):
        from bikg_graph_explainability_public_tpu.models.torch_import import (
            hetero_sage_params,
        )

        g, mdef, params, relations = self._setup(seed=91)
        sd = {}
        for li, lp in enumerate(params["conv"]):
            for rel_key, p in lp.items():
                pre = f"conv.{2 * li}.convs.{rel_key}."
                sd[pre + "lin_l.weight"] = np.asarray(p["lin_l"]["weight"])
                sd[pre + "lin_l.bias"] = np.asarray(p["lin_l"]["bias"])
                sd[pre + "lin_r.weight"] = np.asarray(p["lin_r"]["weight"])
        for j, p in enumerate(params["fc"]):
            sd[f"fc.{2 * j}.weight"] = np.asarray(p["weight"])
            sd[f"fc.{2 * j}.bias"] = np.asarray(p["bias"])
        imported = hetero_sage_params(sd)
        a = np.asarray(
            mdef.apply(
                params, g.x, g.senders, g.receivers,
                g.edge_mask.astype(np.float32), g.node_type, g.edge_type,
            )
        )
        b = np.asarray(
            mdef.apply(
                imported, g.x, g.senders, g.receivers,
                g.edge_mask.astype(np.float32), g.node_type, g.edge_type,
            )
        )
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_adapter_end_to_end(self):
        g, mdef, params, _ = self._setup(seed=92)
        with pytest.raises(TypeError):
            FastBatchedHeteroGCN(mdef, params, g)  # SAGE is not the GCN tier
        sampler = MaskSampler(
            g.num_nodes, g.n_pad, {"interpret_samples": 4, "epochs": 2}, None
        )
        masks, _, _ = sampler.sample(jax.random.PRNGKey(92))
        out = px.Model(mdef, params).perturbed_query_outputs(
            g, masks, "node_prediction", 3
        )
        assert np.isfinite(np.asarray(out)).all()
