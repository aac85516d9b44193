"""Generic state-dict walker (``import_any``): every supported family routes
through one entry, mixed stacks compose, unknown layouts fail loudly.

Reference analogue: arbitrary-module acceptance via arity dispatch
(``/root/reference/src/pathway_explanations/model.py:62-116``); here the
accepted surface is the checkpoint formats the reference documents
(``README.md:155-156``) for every PyG family the model zoo covers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bikg_graph_explainability_public_tpu.graph import from_arrays
from bikg_graph_explainability_public_tpu.models.adapter import Model
from bikg_graph_explainability_public_tpu.models.gnn import (
    ConvStackNodeModel,
    GCNNodeModel,
    HeteroGNN,
    RGCNNodeModel,
)
from bikg_graph_explainability_public_tpu.models.torch_import import (
    gcn_node_model_params,
    hetero_gcn_params,
    import_any,
    load_state_dict,
    sage_node_model_params,
)

HOMO_CKPT = "/root/reference/test_data/gcn_homo_1hop_lungCancer.pth.tar"
HETERO_CKPT = "/root/reference/test_data/gcn_hetero_1hop_lungCancer.pth.tar"


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _rand_graph(n=12, e=40, f=6, seed=0):
    rng = np.random.default_rng(seed)
    feat = rng.normal(size=(n, f)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    return from_arrays(feat, ei)


def _head(rng, widths):
    """fc head state-dict entries for input->widths[0]->...->1."""
    sd = {}
    for j, (i_, o_) in enumerate(zip(widths[:-1], widths[1:])):
        sd[f"fc.{2 * j}.weight"] = rng.normal(size=(o_, i_)).astype(np.float32)
        sd[f"fc.{2 * j}.bias"] = rng.normal(size=(o_,)).astype(np.float32)
    return sd


class TestImportAnyCheckpoints:
    def test_homo_gcn_checkpoint(self):
        sd = load_state_dict(HOMO_CKPT)
        mdef, params = import_any(sd)
        assert isinstance(mdef, GCNNodeModel)
        _tree_equal(params, gcn_node_model_params(sd))
        assert mdef.in_features == 84
        assert mdef.conv_channels == (16,)
        assert mdef.fc_channels == (16, 16, 32)

    def test_hetero_gcn_checkpoint(self):
        sd = load_state_dict(HETERO_CKPT)
        mdef, params = import_any(sd)
        assert isinstance(mdef, HeteroGNN)
        _tree_equal(params, hetero_gcn_params(sd))
        assert len(mdef.conv_layers[0]) == 3  # three gene-gene relations

    def test_homo_checkpoint_forward_matches_explicit(self):
        sd = load_state_dict(HOMO_CKPT)
        mdef, params = import_any(sd)
        g = _rand_graph(f=84, seed=3)
        got = np.asarray(Model(mdef, params).infer(g))
        explicit = Model(
            GCNNodeModel(84, (16,), (16, 16, 32)), gcn_node_model_params(sd)
        )
        np.testing.assert_allclose(got, np.asarray(explicit.infer(g)))


class TestImportAnyFamilies:
    def test_sage(self):
        rng = np.random.default_rng(1)
        sd = {
            "conv.0.lin_l.weight": rng.normal(size=(8, 6)).astype(np.float32),
            "conv.0.lin_l.bias": rng.normal(size=(8,)).astype(np.float32),
            "conv.0.lin_r.weight": rng.normal(size=(8, 6)).astype(np.float32),
        }
        sd.update(_head(rng, (8, 4, 1)))
        mdef, params = import_any(sd)
        assert isinstance(mdef, ConvStackNodeModel)
        _tree_equal(params, sage_node_model_params(sd))
        g = _rand_graph()
        out = Model(mdef, params).infer(g)
        assert np.isfinite(np.asarray(out)).all()

    def test_gin_graphconv_gatv2(self):
        rng = np.random.default_rng(2)
        cases = {
            "gin": {
                "conv.0.nn.0.weight": rng.normal(size=(5, 6)).astype(np.float32),
                "conv.0.nn.0.bias": rng.normal(size=(5,)).astype(np.float32),
                "conv.0.nn.2.weight": rng.normal(size=(8, 5)).astype(np.float32),
                "conv.0.nn.2.bias": rng.normal(size=(8,)).astype(np.float32),
                "conv.0.eps": np.zeros((), np.float32),
            },
            "graphconv": {
                "conv.0.lin_rel.weight": rng.normal(size=(8, 6)).astype(np.float32),
                "conv.0.lin_rel.bias": rng.normal(size=(8,)).astype(np.float32),
                "conv.0.lin_root.weight": rng.normal(size=(8, 6)).astype(np.float32),
            },
            "gatv2": {
                "conv.0.lin_l.weight": rng.normal(size=(8, 6)).astype(np.float32),
                "conv.0.lin_l.bias": rng.normal(size=(8,)).astype(np.float32),
                "conv.0.lin_r.weight": rng.normal(size=(8, 6)).astype(np.float32),
                "conv.0.att": rng.normal(size=(1, 1, 8)).astype(np.float32),
                "conv.0.bias": rng.normal(size=(8,)).astype(np.float32),
            },
        }
        for name, conv_sd in cases.items():
            sd = dict(conv_sd)
            sd.update(_head(np.random.default_rng(5), (8, 4, 1)))
            mdef, params = import_any(sd)
            assert isinstance(mdef, ConvStackNodeModel), name
            out = Model(mdef, params).infer(_rand_graph())
            assert np.isfinite(np.asarray(out)).all(), name

    def test_rgcn(self):
        rng = np.random.default_rng(3)
        sd = {
            "conv.0.weight": rng.normal(size=(3, 6, 8)).astype(np.float32),
            "conv.0.root": rng.normal(size=(6, 8)).astype(np.float32),
            "conv.0.bias": rng.normal(size=(8,)).astype(np.float32),
        }
        sd.update(_head(rng, (8, 4, 1)))
        mdef, params = import_any(sd)
        assert isinstance(mdef, RGCNNodeModel)
        assert mdef.num_relations == 3

    def test_mixed_stack_gcn_then_sage(self):
        """A layout no single-family importer accepts: layer 0 GCN, layer 1
        SAGE.  import_any composes them and the forward matches a manually
        assembled ConvStackNodeModel."""
        from bikg_graph_explainability_public_tpu.models.layers import (
            GCNConv, SAGEConv,
        )

        rng = np.random.default_rng(4)
        sd = {
            "conv.0.lin.weight": rng.normal(size=(7, 6)).astype(np.float32),
            "conv.0.bias": rng.normal(size=(7,)).astype(np.float32),
            "conv.2.lin_l.weight": rng.normal(size=(8, 7)).astype(np.float32),
            "conv.2.lin_l.bias": rng.normal(size=(8,)).astype(np.float32),
            "conv.2.lin_r.weight": rng.normal(size=(8, 7)).astype(np.float32),
        }
        sd.update(_head(rng, (8, 4, 1)))
        mdef, params = import_any(sd)
        assert isinstance(mdef, ConvStackNodeModel)
        assert isinstance(mdef.convs[0], GCNConv)
        assert isinstance(mdef.convs[1], SAGEConv)
        assert mdef.num_hops == 2

        g = _rand_graph()
        got = np.asarray(Model(mdef, params).infer(g))

        manual = ConvStackNodeModel(
            [GCNConv(6, 7), SAGEConv(7, 8)], (8, 4), 1
        )
        mp = {
            "conv": [
                {"weight": jnp.asarray(sd["conv.0.lin.weight"]),
                 "bias": jnp.asarray(sd["conv.0.bias"])},
                {"lin_l": {"weight": jnp.asarray(sd["conv.2.lin_l.weight"]),
                           "bias": jnp.asarray(sd["conv.2.lin_l.bias"])},
                 "lin_r": {"weight": jnp.asarray(sd["conv.2.lin_r.weight"])}},
            ],
            "fc": params["fc"],
        }
        np.testing.assert_allclose(
            got, np.asarray(Model(manual, mp).infer(g)), rtol=1e-6
        )

    def test_unknown_layout_raises(self):
        rng = np.random.default_rng(6)
        sd = {"conv.0.mystery.weight": np.zeros((4, 4), np.float32)}
        sd.update(_head(rng, (4, 1)))
        with pytest.raises(ValueError, match="conv.0"):
            import_any(sd)

    def test_headless_raises(self):
        with pytest.raises(ValueError, match="fc"):
            import_any({"conv.0.lin.weight": np.zeros((4, 4), np.float32)})
