"""Layer/model numerics vs dense oracle + trained-checkpoint parity
(reference scope: tests/test_model.py, plus the forward-parity gate the
reference lacks — SURVEY §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bikg_graph_explainability_public_tpu.graph import from_arrays, hetero_to_homo
from bikg_graph_explainability_public_tpu.models.adapter import Model
from bikg_graph_explainability_public_tpu.models.gnn import (
    GCNNodeModel,
    hetero_gcn_for_relations,
    hetero_gat_for_relations,
)
from bikg_graph_explainability_public_tpu.models.layers import GATConv, GCNConv
from bikg_graph_explainability_public_tpu.models.torch_import import (
    gcn_node_model_params,
    hetero_gcn_params,
    hetero_relations_from_state_dict,
    load_state_dict,
)
from fixtures import (
    dense_gat_conv,
    dense_gcn_conv,
    make_graph,
    mlp_head,
)

HOMO_CKPT = "/root/reference/test_data/gcn_homo_1hop_lungCancer.pth.tar"
HETERO_CKPT = "/root/reference/test_data/gcn_hetero_1hop_lungCancer.pth.tar"


def full_edge_weight(g):
    return g.edge_mask.astype(jnp.float32)


class TestGCNConv:
    def test_matches_dense_oracle(self):
        feat, ei, _ = make_graph(n=20, f=7, e=55, seed=11)
        g = from_arrays(feat, ei)
        conv = GCNConv(7, 5)
        params = conv.init(jax.random.PRNGKey(0))
        out = conv.apply(
            params, g.x, g.senders, g.receivers, full_edge_weight(g)
        )
        oracle = dense_gcn_conv(
            feat, ei, np.asarray(params["weight"]), np.asarray(params["bias"])
        )
        np.testing.assert_allclose(
            np.asarray(out)[:20], oracle, rtol=1e-5, atol=1e-5
        )

    def test_masked_equals_physically_removed(self):
        """Edge weight 0 must equal rebuilding the graph without those edges —
        the core equivalence behind replacing the reference's edge-drop
        perturbation (data.py:453-498) with masking."""
        feat, ei, _ = make_graph(n=15, f=6, e=40, seed=13)
        rng = np.random.default_rng(2)
        keep = rng.random(40) > 0.4
        conv = GCNConv(6, 4)
        params = conv.init(jax.random.PRNGKey(1))

        g_full = from_arrays(feat, ei)
        ew = np.zeros(g_full.e_pad, np.float32)
        ew[:40] = keep.astype(np.float32)
        out_masked = conv.apply(
            params, g_full.x, g_full.senders, g_full.receivers, jnp.asarray(ew)
        )

        g_cut = from_arrays(feat, ei[:, keep])
        out_cut = conv.apply(
            params, g_cut.x, g_cut.senders, g_cut.receivers, full_edge_weight(g_cut)
        )
        np.testing.assert_allclose(
            np.asarray(out_masked)[:15], np.asarray(out_cut)[:15], rtol=1e-5, atol=1e-6
        )


class TestGATConv:
    def test_matches_dense_oracle(self):
        feat, ei, _ = make_graph(n=12, f=5, e=30, seed=17)
        g = from_arrays(feat, ei)
        conv = GATConv((5, 5), 3, add_self_loops=False)
        params = conv.init(jax.random.PRNGKey(3))
        out = conv.apply(params, g.x, g.senders, g.receivers, full_edge_weight(g))
        oracle = dense_gat_conv(
            feat,
            feat,
            ei,
            np.asarray(params["lin_src"]["weight"]),
            np.asarray(params["lin_dst"]["weight"]),
            np.asarray(params["att_src"]),
            np.asarray(params["att_dst"]),
            np.asarray(params["bias"]),
        )
        np.testing.assert_allclose(np.asarray(out)[:12], oracle, rtol=1e-4, atol=1e-5)

    def test_masked_edges_leave_softmax(self):
        feat, ei, _ = make_graph(n=10, f=4, e=25, seed=19)
        rng = np.random.default_rng(4)
        keep = rng.random(25) > 0.5
        conv = GATConv((4, 4), 3, add_self_loops=False)
        params = conv.init(jax.random.PRNGKey(5))
        g = from_arrays(feat, ei)
        ew = np.zeros(g.e_pad, np.float32)
        ew[:25] = keep
        out = conv.apply(params, g.x, g.senders, g.receivers, jnp.asarray(ew))
        oracle = dense_gat_conv(
            feat,
            feat,
            ei,
            np.asarray(params["lin_src"]["weight"]),
            np.asarray(params["lin_dst"]["weight"]),
            np.asarray(params["att_src"]),
            np.asarray(params["att_dst"]),
            np.asarray(params["bias"]),
            edge_keep=keep,
        )
        np.testing.assert_allclose(np.asarray(out)[:10], oracle, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(HOMO_CKPT), reason="reference checkpoint absent")
class TestHomoCheckpointParity:
    def test_forward_allclose(self):
        """Import the trained lungCancer GCN and verify the full forward
        against the dense oracle — the parity gate of SURVEY §7.2 step 2."""
        sd = load_state_dict(HOMO_CKPT)
        params = gcn_node_model_params(sd)
        model = GCNNodeModel(in_features=84)
        feat, ei, _ = make_graph(n=36, f=84, e=116, seed=21)
        g = from_arrays(feat, ei)
        out = model.apply(params, g.x, g.senders, g.receivers, full_edge_weight(g))

        conv_out = dense_gcn_conv(
            feat, ei, sd["conv.0.lin.weight"], sd["conv.0.bias"]
        )
        conv_out = np.maximum(conv_out, 0.0)
        fc = [
            {"weight": sd[f"fc.{2 * j}.weight"], "bias": sd[f"fc.{2 * j}.bias"]}
            for j in range(3)
        ]
        oracle = mlp_head(conv_out, fc)
        np.testing.assert_allclose(np.asarray(out)[:36], oracle, rtol=1e-4, atol=1e-5)
        assert (np.asarray(out)[:36] >= 0).all() and (np.asarray(out)[:36] <= 1).all()

    def test_query_fast_path(self):
        sd = load_state_dict(HOMO_CKPT)
        params = gcn_node_model_params(sd)
        model = GCNNodeModel(in_features=84)
        feat, ei, _ = make_graph(n=20, f=84, e=60, seed=23)
        g = from_arrays(feat, ei)
        full = model.apply(params, g.x, g.senders, g.receivers, full_edge_weight(g))
        fast = model.apply_query(
            params, g.x, g.senders, g.receivers, full_edge_weight(g), 7
        )
        np.testing.assert_allclose(np.asarray(full)[7], np.asarray(fast), rtol=1e-6)


@pytest.mark.skipif(
    not os.path.exists(HETERO_CKPT), reason="reference checkpoint absent"
)
class TestHeteroCheckpointParity:
    def test_forward_allclose(self):
        sd = load_state_dict(HETERO_CKPT)
        relations = hetero_relations_from_state_dict(sd)
        assert relations == [
            ("gene", "interacts", "gene"),
            ("gene", "modifies", "gene"),
            ("gene", "regulates", "gene"),
        ]
        params = hetero_gcn_params(sd)
        model = hetero_gcn_for_relations(["gene"], relations, in_features=84)

        rng = np.random.default_rng(29)
        feat = {"gene": rng.normal(size=(14, 84)).astype(np.float32)}
        edge_index = {
            r: np.stack(
                [rng.integers(0, 14, size=10), rng.integers(0, 14, size=10)]
            )
            for r in relations
        }
        g, info = hetero_to_homo(feat, edge_index)
        adapter = Model(model, params)
        out = adapter.infer(g)

        # oracle: sum of per-relation dense GCNConvs, ReLU, shared MLP head
        acc = np.zeros((14, 16))
        for i, r in enumerate(relations):
            key = "__".join(r)
            acc += dense_gcn_conv(
                feat["gene"],
                edge_index[r],
                sd[f"conv.0.convs.{key}.lin.weight"],
                sd[f"conv.0.convs.{key}.bias"],
            )
        acc = np.maximum(acc, 0.0)
        fc = [
            {"weight": sd[f"fc.{2 * j}.weight"], "bias": sd[f"fc.{2 * j}.bias"]}
            for j in range(3)
        ]
        oracle = mlp_head(acc, fc)
        np.testing.assert_allclose(np.asarray(out)[:14], oracle, rtol=1e-4, atol=1e-5)


class TestHeteroGAT:
    def test_two_type_gat_vs_oracle(self):
        """Two node types + two relations with per-relation GAT, matching the
        reference hetero test model shape (tests/test_utils.py:86-182)."""
        rng = np.random.default_rng(31)
        feat = {
            "0": rng.normal(size=(6, 4)).astype(np.float32),
            "1": rng.normal(size=(5, 4)).astype(np.float32),
        }
        relations = [("0", "a", "1"), ("1", "b", "0")]
        edge_index = {
            ("0", "a", "1"): np.stack(
                [rng.integers(0, 6, size=8), rng.integers(0, 5, size=8)]
            ),
            ("1", "b", "0"): np.stack(
                [rng.integers(0, 5, size=7), rng.integers(0, 6, size=7)]
            ),
        }
        g, info = hetero_to_homo(feat, edge_index)
        model = hetero_gat_for_relations(
            ["0", "1"], relations, in_features=4, conv_channels=(3,), fc_channels=(3, 3)
        )
        params = model.init(jax.random.PRNGKey(7))
        adapter = Model(model, params)
        out = np.asarray(adapter.infer(g))[:11]
        assert np.isfinite(out).all()

        # oracle for the conv layer on the homogenised node set
        x_h = np.vstack([feat["0"], feat["1"]])
        acc = np.zeros((11, 3))
        for i, r in enumerate(relations):
            key = "__".join(r)
            p = params["conv"][0][key]
            shift_s = 0 if r[0] == "0" else 6
            shift_d = 0 if r[-1] == "0" else 6
            ei = edge_index[r] + np.array([[shift_s], [shift_d]])
            contrib = dense_gat_conv(
                x_h,
                x_h,
                ei,
                np.asarray(p["lin_src"]["weight"]),
                np.asarray(p["lin_dst"]["weight"]),
                np.asarray(p["att_src"]),
                np.asarray(p["att_dst"]),
                bias=None,
            )
            # bias only on dst-type rows (PyG HeteroConv per-type outputs)
            dst_rows = np.arange(11) >= 6 if r[-1] == "1" else np.arange(11) < 6
            contrib[dst_rows] += np.asarray(p["bias"])
            acc += contrib
        h = np.maximum(acc, 0.0)
        fc = [
            {
                "weight": np.asarray(params["fc"][j]["weight"]),
                "bias": np.asarray(params["fc"][j]["bias"]),
            }
            for j in range(2)
        ]
        oracle = mlp_head(h, fc)
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)


class TestGATSelfLoops:
    def test_matches_dense_oracle(self):
        from fixtures import dense_gat_conv_selfloops

        feat, ei, _ = make_graph(n=18, f=6, e=40, seed=21)
        g = from_arrays(feat, ei)
        conv = GATConv((6, 6), 4, add_self_loops=True)
        params = conv.init(jax.random.PRNGKey(3))
        # homogeneous PyG GAT shares the src/dst linear map
        params["lin_dst"] = params["lin_src"]
        out = conv.apply(params, g.x, g.senders, g.receivers, full_edge_weight(g))
        oracle = dense_gat_conv_selfloops(
            feat, ei,
            np.asarray(params["lin_src"]["weight"]),
            np.asarray(params["att_src"]),
            np.asarray(params["att_dst"]),
            np.asarray(params["bias"]),
        )
        np.testing.assert_allclose(np.asarray(out)[:18], oracle, rtol=1e-5, atol=1e-5)

    def test_masked_equals_physically_removed(self):
        """Dropping edges by weight 0 == rebuilding without them; self-loops
        survive either way (PyG re-adds them on the perturbed graph)."""
        from fixtures import dense_gat_conv_selfloops

        feat, ei, _ = make_graph(n=14, f=5, e=30, seed=22)
        keep = np.random.default_rng(0).random(30) > 0.4
        g = from_arrays(feat, ei, edge_budget=30)
        conv = GATConv((5, 5), 3, add_self_loops=True)
        params = conv.init(jax.random.PRNGKey(4))
        params["lin_dst"] = params["lin_src"]
        ew = jnp.asarray(keep.astype(np.float32))
        out = conv.apply(params, g.x, g.senders, g.receivers, ew)
        oracle = dense_gat_conv_selfloops(
            feat, ei,
            np.asarray(params["lin_src"]["weight"]),
            np.asarray(params["att_src"]),
            np.asarray(params["att_dst"]),
            np.asarray(params["bias"]),
            edge_keep=keep,
        )
        np.testing.assert_allclose(np.asarray(out)[:14], oracle, rtol=1e-5, atol=1e-5)


class TestSAGEConv:
    def test_matches_dense_oracle_masked(self):
        from fixtures import dense_sage_conv
        from bikg_graph_explainability_public_tpu.models.layers import SAGEConv

        feat, ei, _ = make_graph(n=16, f=6, e=36, seed=23)
        keep = np.random.default_rng(1).random(36) > 0.35
        g = from_arrays(feat, ei, edge_budget=36)
        conv = SAGEConv(6, 5)
        params = conv.init(jax.random.PRNGKey(5))
        out = conv.apply(
            params, g.x, g.senders, g.receivers,
            jnp.asarray(keep.astype(np.float32)),
        )
        oracle = dense_sage_conv(
            feat, ei,
            np.asarray(params["lin_l"]["weight"]),
            np.asarray(params["lin_l"]["bias"]),
            np.asarray(params["lin_r"]["weight"]),
            edge_keep=keep,
        )
        np.testing.assert_allclose(np.asarray(out)[:16], oracle, rtol=1e-5, atol=1e-5)


class TestGraphConv:
    def test_matches_dense_oracle_masked(self):
        from fixtures import dense_graph_conv
        from bikg_graph_explainability_public_tpu.models.layers import GraphConv

        feat, ei, _ = make_graph(n=16, f=6, e=36, seed=27)
        keep = np.random.default_rng(3).random(36) > 0.35
        g = from_arrays(feat, ei, edge_budget=36)
        conv = GraphConv(6, 5)
        params = conv.init(jax.random.PRNGKey(7))
        out = conv.apply(
            params, g.x, g.senders, g.receivers,
            jnp.asarray(keep.astype(np.float32)),
        )
        oracle = dense_graph_conv(
            feat, ei,
            np.asarray(params["lin_rel"]["weight"]),
            np.asarray(params["lin_rel"]["bias"]),
            np.asarray(params["lin_root"]["weight"]),
            edge_keep=keep,
        )
        np.testing.assert_allclose(
            np.asarray(out)[:16], oracle, rtol=1e-5, atol=1e-5
        )

    def test_torch_state_dict_import_roundtrip(self):
        """A torch GraphConv-style state dict imports and forward-matches
        the torch implementation of the documented semantics."""
        import torch

        from bikg_graph_explainability_public_tpu.models.torch_import import (
            graph_conv_node_model_params,
        )
        import bikg_graph_explainability_public_tpu as px

        tg = torch.Generator().manual_seed(5)
        f, h = 6, 4
        sd = {
            "conv.0.lin_rel.weight": torch.randn(h, f, generator=tg) * 0.3,
            "conv.0.lin_rel.bias": torch.randn(h, generator=tg) * 0.1,
            "conv.0.lin_root.weight": torch.randn(h, f, generator=tg) * 0.3,
            "fc.0.weight": torch.randn(1, h, generator=tg) * 0.3,
            "fc.0.bias": torch.randn(1, generator=tg) * 0.1,
        }
        params = graph_conv_node_model_params(
            {k: v.numpy() for k, v in sd.items()}
        )
        mdef = px.graph_conv_node_model(
            f, conv_channels=(h,), fc_channels=(h,)
        )
        feat, ei, _ = make_graph(n=12, f=f, e=30, seed=41)
        g = from_arrays(feat, ei, edge_budget=30)
        out = mdef.apply(
            params, g.x, g.senders, g.receivers,
            jnp.ones(30, jnp.float32),
        )
        # torch oracle of the same semantics
        with torch.no_grad():
            xt = torch.tensor(feat)
            agg = torch.zeros_like(xt)
            for s, d in zip(*ei):
                agg[d] += xt[s]
            hdd = torch.relu(
                agg @ sd["conv.0.lin_rel.weight"].T
                + sd["conv.0.lin_rel.bias"]
                + xt @ sd["conv.0.lin_root.weight"].T
            )
            ref = torch.sigmoid(hdd @ sd["fc.0.weight"].T + sd["fc.0.bias"])
        np.testing.assert_allclose(
            np.asarray(out)[:12], ref.numpy(), rtol=1e-4, atol=1e-4
        )


class TestGINConv:
    def test_matches_dense_oracle_masked(self):
        from fixtures import dense_gin_conv
        from bikg_graph_explainability_public_tpu.models.layers import GINConv

        feat, ei, _ = make_graph(n=16, f=6, e=36, seed=24)
        keep = np.random.default_rng(2).random(36) > 0.35
        g = from_arrays(feat, ei, edge_budget=36)
        conv = GINConv(6, 5, mlp_channels=(8,), eps=0.1)
        params = conv.init(jax.random.PRNGKey(6))
        out = conv.apply(
            params, g.x, g.senders, g.receivers,
            jnp.asarray(keep.astype(np.float32)),
        )
        mlp = [
            (np.asarray(p["weight"]), np.asarray(p["bias"]))
            for p in params["nn"]
        ]
        oracle = dense_gin_conv(feat, ei, mlp, eps=0.1, edge_keep=keep)
        np.testing.assert_allclose(np.asarray(out)[:16], oracle, rtol=1e-5, atol=1e-5)


GAT_CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "test_data", "gat_homo_1hop_36n_own.pth.tar",
)
TOY_GRAPH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "test_data", "toy_graph_36n.npz",
)


class TestGATCheckpointParity:
    """Trained-GAT checkpoint import + forward parity (VERDICT r1 item 2:
    torch_import could not import a GAT state dict)."""

    def test_forward_allclose(self):
        from fixtures import dense_gat_conv_selfloops, mlp_head
        from bikg_graph_explainability_public_tpu.models.gnn import gat_node_model
        from bikg_graph_explainability_public_tpu.models.torch_import import (
            gat_node_model_params,
        )

        sd = load_state_dict(GAT_CKPT)
        params = gat_node_model_params(sd)
        data = np.load(TOY_GRAPH)
        feat, ei = data["feat"], data["edge_index"]
        g = from_arrays(feat, ei)
        mdef = gat_node_model(84, conv_channels=(16,), fc_channels=(16, 16, 32))
        out = np.asarray(Model(mdef, params).infer(g))[:36]

        conv_out = dense_gat_conv_selfloops(
            feat, ei,
            sd["conv.0.lin_src.weight"],
            sd["conv.0.att_src"],
            sd["conv.0.att_dst"],
            sd["conv.0.bias"],
        )
        oracle = mlp_head(np.maximum(conv_out, 0.0), params["fc"])
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)

    def test_checkpoint_is_trained(self):
        import torch

        ck = torch.load(GAT_CKPT, map_location="cpu", weights_only=False)
        assert ck["acc"] > 0.85

    def test_explain_with_gat_checkpoint(self):
        import bikg_graph_explainability_public_tpu as px
        from bikg_graph_explainability_public_tpu.models.torch_import import (
            gat_node_model_params,
        )

        sd = load_state_dict(GAT_CKPT)
        data = np.load(TOY_GRAPH)
        names = [str(x) for x in data["names"]]
        mdef = px.gat_node_model(84, conv_channels=(16,), fc_channels=(16, 16, 32))
        model = Model(mdef, gat_node_model_params(sd))
        cfg = {"seed": 1, "interpret_samples": 10, "epochs": 10, "lr": 0.01,
               "l1_lambda": 1e-4}
        cv, _ = px.Explainer(
            data["feat"], data["edge_index"], model, cfg, names
        ).run("10", times=1)
        assert len(cv) > 0 and np.isfinite(cv.to_numpy()).all()


class TestCustomModelProtocol:
    """Any user object with ``apply(params, x, senders, receivers,
    edge_weight)`` + ``num_hops`` runs through Explainer — the documented
    black-box contract (reference accepts arbitrary PyG modules via arity
    dispatch, model.py:62-116)."""

    class MeanPoolNet:
        """A user-defined model NOT in the zoo: mean neighbour aggregation
        with a fixed projection and a tanh head."""

        num_hops = 1

        def init(self, key):
            k1, k2 = jax.random.split(key)
            return {
                "w": jax.random.normal(k1, (6, 4)) * 0.3,
                "v": jax.random.normal(k2, (4, 1)) * 0.3,
            }

        def apply(self, params, x, senders, receivers, edge_weight):
            n = x.shape[0]
            ew = edge_weight
            num = jax.ops.segment_sum(
                ew[:, None] * (x @ params["w"])[senders], receivers,
                num_segments=n,
            )
            den = jax.ops.segment_sum(ew, receivers, num_segments=n)
            h = num / jnp.where(den > 0, den, 1.0)[:, None]
            return jnp.tanh(h @ params["v"])

    def test_explainer_end_to_end(self):
        import bikg_graph_explainability_public_tpu as px

        feat, ei, _ = make_graph(n=20, f=6, e=50, seed=30)
        names = [str(i) for i in range(20)]
        mdef = self.MeanPoolNet()
        model = Model(mdef, mdef.init(jax.random.PRNGKey(0)))
        cfg = {"seed": 2, "interpret_samples": 8, "epochs": 8, "lr": 0.01,
               "l1_lambda": 1e-4}
        for problem, el in [
            ("node_prediction", "5"),
            ("graph_prediction", None),
        ]:
            cv, _ = px.Explainer(
                feat, ei, model, cfg, names, problem=problem
            ).run(el, times=1)
            assert len(cv) > 0 and np.isfinite(cv.to_numpy()).all()


class TestNewFamiliesExplain:
    """SAGE / GIN node models run end-to-end through the Explainer."""

    def test_sage_and_gin(self):
        import bikg_graph_explainability_public_tpu as px

        feat, ei, _ = make_graph(n=20, f=6, e=50, seed=31)
        names = [str(i) for i in range(20)]
        cfg = {"seed": 2, "interpret_samples": 8, "epochs": 8, "lr": 0.01,
               "l1_lambda": 1e-4}
        for mdef in [
            px.sage_node_model(6, conv_channels=(4,), fc_channels=(4, 4)),
            px.gin_node_model(6, conv_channels=(4,), mlp_hidden=4,
                              fc_channels=(4, 4)),
            px.graph_conv_node_model(6, conv_channels=(4,),
                                     fc_channels=(4, 4)),
        ]:
            model = Model(mdef, mdef.init(jax.random.PRNGKey(1)))
            cv, _ = px.Explainer(feat, ei, model, cfg, names).run("3", times=1)
            assert len(cv) > 0 and np.isfinite(cv.to_numpy()).all()


class TestMultiHeadGAT:
    """heads>1 GATConv vs the multi-head dense oracle (VERDICT r3 item 8:
    the importer zoo lacked multi-head GAT coverage)."""

    def test_concat_heads_no_self_loops(self):
        from fixtures import dense_gat_multihead

        feat, ei, _ = make_graph(n=11, f=5, e=28, seed=31)
        g = from_arrays(feat, ei)
        conv = GATConv((5, 5), 3, heads=4, add_self_loops=False)
        params = conv.init(jax.random.PRNGKey(7))
        out = conv.apply(params, g.x, g.senders, g.receivers, full_edge_weight(g))
        oracle = dense_gat_multihead(
            feat, ei,
            np.asarray(params["lin_src"]["weight"]),
            np.asarray(params["att_src"]),
            np.asarray(params["att_dst"]),
            np.asarray(params["bias"]),
            lin_dst=np.asarray(params["lin_dst"]["weight"]),
            add_self_loops=False,
        )
        assert out.shape[1] == 12  # H*C concat
        np.testing.assert_allclose(np.asarray(out)[:11], oracle, rtol=1e-4, atol=1e-5)

    def test_mean_heads_self_loops_masked(self):
        from fixtures import dense_gat_multihead

        feat, ei, _ = make_graph(n=9, f=4, e=24, seed=33)
        keep = np.random.default_rng(8).random(24) > 0.4
        g = from_arrays(feat, ei, edge_budget=24)
        conv = GATConv((4, 4), 3, heads=2, concat=False, add_self_loops=True)
        params = conv.init(jax.random.PRNGKey(9))
        out = conv.apply(
            params, g.x, g.senders, g.receivers,
            jnp.asarray(keep.astype(np.float32)),
        )
        oracle = dense_gat_multihead(
            feat, ei,
            np.asarray(params["lin_src"]["weight"]),
            np.asarray(params["att_src"]),
            np.asarray(params["att_dst"]),
            np.asarray(params["bias"]),
            lin_dst=np.asarray(params["lin_dst"]["weight"]),
            edge_keep=keep,
            add_self_loops=True,
            concat=False,
        )
        assert out.shape[1] == 3  # mean over heads
        np.testing.assert_allclose(np.asarray(out)[:9], oracle, rtol=1e-4, atol=1e-5)

    def test_multihead_import_and_config_sniff(self):
        """A heads=2 torch GAT state dict imports, the architecture is
        inferred from shapes, and the model explains end-to-end."""
        import bikg_graph_explainability_public_tpu as px
        from bikg_graph_explainability_public_tpu.models.torch_import import (
            gat_config_from_state_dict,
            gat_node_model_params,
        )

        rng = np.random.default_rng(11)
        f, c, h = 6, 3, 2
        sd = {
            "conv.0.lin_src.weight": rng.normal(size=(h * c, f)).astype(np.float32) * 0.3,
            "conv.0.att_src": rng.normal(size=(1, h, c)).astype(np.float32),
            "conv.0.att_dst": rng.normal(size=(1, h, c)).astype(np.float32),
            "conv.0.bias": rng.normal(size=(h * c,)).astype(np.float32) * 0.1,
            "fc.0.weight": rng.normal(size=(1, h * c)).astype(np.float32) * 0.3,
            "fc.0.bias": rng.normal(size=(1,)).astype(np.float32),
        }
        cfg = gat_config_from_state_dict(sd)
        assert cfg == [{"heads": 2, "channels": 3, "concat": True}]
        params = gat_node_model_params(sd)
        mdef = px.gat_node_model(
            f, conv_channels=(c,), heads=h, fc_channels=(h * c,)
        )
        feat, ei, names = make_graph(n=14, f=f, e=40, seed=35)
        model = Model(mdef, params)
        cfgp = {"seed": 0, "interpret_samples": 8, "epochs": 10,
                "lr": 0.01, "l1_lambda": 1e-4}
        cv, _ = px.Explainer(feat, ei, model, cfgp, names).run("2", times=1)
        assert np.isfinite(cv.to_numpy()).all()


class TestGATv2Conv:
    def test_matches_dense_oracle(self):
        from fixtures import dense_gatv2_conv
        from bikg_graph_explainability_public_tpu.models.layers import GATv2Conv

        feat, ei, _ = make_graph(n=12, f=5, e=30, seed=37)
        g = from_arrays(feat, ei)
        conv = GATv2Conv((5, 5), 3, heads=2, add_self_loops=True)
        params = conv.init(jax.random.PRNGKey(11))
        out = conv.apply(params, g.x, g.senders, g.receivers, full_edge_weight(g))
        oracle = dense_gatv2_conv(
            feat, ei,
            np.asarray(params["lin_l"]["weight"]),
            np.asarray(params["lin_r"]["weight"]),
            np.asarray(params["att"]),
            np.asarray(params["bias"]),
            bias_l=np.asarray(params["lin_l"]["bias"]),
            bias_r=np.asarray(params["lin_r"]["bias"]),
        )
        np.testing.assert_allclose(np.asarray(out)[:12], oracle, rtol=1e-4, atol=1e-5)

    def test_masked_edges_leave_softmax(self):
        from fixtures import dense_gatv2_conv
        from bikg_graph_explainability_public_tpu.models.layers import GATv2Conv

        feat, ei, _ = make_graph(n=10, f=4, e=26, seed=39)
        keep = np.random.default_rng(13).random(26) > 0.5
        g = from_arrays(feat, ei, edge_budget=26)
        conv = GATv2Conv((4, 4), 3, add_self_loops=False, bias=False)
        params = conv.init(jax.random.PRNGKey(13))
        out = conv.apply(
            params, g.x, g.senders, g.receivers,
            jnp.asarray(keep.astype(np.float32)),
        )
        oracle = dense_gatv2_conv(
            feat, ei,
            np.asarray(params["lin_l"]["weight"]),
            np.asarray(params["lin_r"]["weight"]),
            np.asarray(params["att"]),
            edge_keep=keep,
            add_self_loops=False,
        )
        np.testing.assert_allclose(np.asarray(out)[:10], oracle, rtol=1e-4, atol=1e-5)

    def test_torch_import_and_explain(self):
        """PyG GATv2Conv-layout state dict imports (lin_l/lin_r with biases)
        and explains end-to-end."""
        import bikg_graph_explainability_public_tpu as px
        from bikg_graph_explainability_public_tpu.models.torch_import import (
            gatv2_node_model_params,
        )

        rng = np.random.default_rng(17)
        f, c, h = 5, 3, 2
        sd = {
            "conv.0.lin_l.weight": rng.normal(size=(h * c, f)).astype(np.float32) * 0.3,
            "conv.0.lin_l.bias": rng.normal(size=(h * c,)).astype(np.float32) * 0.1,
            "conv.0.lin_r.weight": rng.normal(size=(h * c, f)).astype(np.float32) * 0.3,
            "conv.0.lin_r.bias": rng.normal(size=(h * c,)).astype(np.float32) * 0.1,
            "conv.0.att": rng.normal(size=(1, h, c)).astype(np.float32),
            "conv.0.bias": rng.normal(size=(h * c,)).astype(np.float32) * 0.1,
            "fc.0.weight": rng.normal(size=(1, h * c)).astype(np.float32) * 0.3,
            "fc.0.bias": rng.normal(size=(1,)).astype(np.float32),
        }
        params = gatv2_node_model_params(sd)
        mdef = px.gatv2_node_model(
            f, conv_channels=(c,), heads=h, fc_channels=(h * c,)
        )
        feat, ei, names = make_graph(n=13, f=f, e=34, seed=41)
        cfgp = {"seed": 0, "interpret_samples": 8, "epochs": 10,
                "lr": 0.01, "l1_lambda": 1e-4}
        cv, _ = px.Explainer(feat, ei, Model(mdef, params), cfgp, names).run(
            "3", times=1
        )
        assert np.isfinite(cv.to_numpy()).all()


class TestRGCN:
    def _typed_graph(self, n=14, f=5, e=40, r=3, seed=43):
        feat, ei, names = make_graph(n=n, f=f, e=e, seed=seed)
        et = np.random.default_rng(seed).integers(0, r, e)
        return feat, ei, et, names

    def test_conv_matches_dense_oracle(self):
        from fixtures import dense_rgcn_conv
        from bikg_graph_explainability_public_tpu.models.layers import RGCNConv

        feat, ei, et, _ = self._typed_graph()
        keep = np.random.default_rng(3).random(40) > 0.3
        g = from_arrays(feat, ei, edge_type=et, edge_budget=40)
        conv = RGCNConv(5, 4, num_relations=3)
        params = conv.init(jax.random.PRNGKey(15))
        out = conv.apply(
            params, g.x, g.senders, g.receivers,
            jnp.asarray(keep.astype(np.float32)), g.edge_type,
        )
        oracle = dense_rgcn_conv(
            feat, ei, et,
            np.asarray(params["weight"]),
            np.asarray(params["root"]),
            np.asarray(params["bias"]),
            edge_keep=keep,
        )
        np.testing.assert_allclose(np.asarray(out)[:14], oracle, rtol=1e-4, atol=1e-5)

    def test_basis_decomposition(self):
        from fixtures import dense_rgcn_conv
        from bikg_graph_explainability_public_tpu.models.layers import RGCNConv

        feat, ei, et, _ = self._typed_graph(seed=45)
        g = from_arrays(feat, ei, edge_type=et, edge_budget=40)
        conv = RGCNConv(5, 4, num_relations=3, num_bases=2)
        params = conv.init(jax.random.PRNGKey(17))
        out = conv.apply(
            params, g.x, g.senders, g.receivers,
            g.edge_mask.astype(jnp.float32), g.edge_type,
        )
        oracle = dense_rgcn_conv(
            feat, ei, et,
            np.asarray(params["weight"]),
            np.asarray(params["root"]),
            np.asarray(params["bias"]),
            comp=np.asarray(params["comp"]),
        )
        np.testing.assert_allclose(np.asarray(out)[:14], oracle, rtol=1e-4, atol=1e-5)

    def test_torch_import_and_explain(self):
        """PyG RGCNConv-layout state dict ([R,in,out] weight, [in,out] root —
        NOT Linear-transposed) imports; the typed model dispatches through
        the adapter and explains end-to-end."""
        import bikg_graph_explainability_public_tpu as px
        from bikg_graph_explainability_public_tpu.models.torch_import import (
            rgcn_node_model_params,
        )

        rng = np.random.default_rng(19)
        f, c, r = 5, 4, 3
        sd = {
            "conv.0.weight": rng.normal(size=(r, f, c)).astype(np.float32) * 0.3,
            "conv.0.root": rng.normal(size=(f, c)).astype(np.float32) * 0.3,
            "conv.0.bias": rng.normal(size=(c,)).astype(np.float32) * 0.1,
            "fc.0.weight": rng.normal(size=(1, c)).astype(np.float32) * 0.3,
            "fc.0.bias": rng.normal(size=(1,)).astype(np.float32),
        }
        params = rgcn_node_model_params(sd)
        mdef = px.RGCNNodeModel(f, num_relations=r, conv_channels=(c,),
                                fc_channels=(c,))
        feat, ei, et, names = self._typed_graph(seed=47)
        model = Model(mdef, params)
        cfgp = {"seed": 0, "interpret_samples": 8, "epochs": 10,
                "lr": 0.01, "l1_lambda": 1e-4}
        ex = px.Explainer(feat, ei, model, cfgp, names, edge_types=et)
        cv, _ = ex.run("4", times=2)
        assert np.isfinite(cv.to_numpy()).all()

        # the typed forward itself matches the conv oracle + head
        from fixtures import dense_rgcn_conv, mlp_head

        g = from_arrays(feat, ei, edge_type=et)
        out = np.asarray(model.infer(g))[:14]
        conv_out = dense_rgcn_conv(
            feat, ei, et, sd["conv.0.weight"], sd["conv.0.root"],
            sd["conv.0.bias"],
        )
        oracle = mlp_head(np.maximum(conv_out, 0.0), params["fc"])
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-4)
