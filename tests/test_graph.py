"""Tests for the graph substrate (mirrors reference tests/test_data.py scope)."""

import numpy as np
import pytest

from bikg_graph_explainability_public_tpu.graph import (
    from_arrays,
    hetero_to_homo,
    hetero_names_to_homo,
    homo_to_hetero_features,
    element_size,
    pad_feature_blocks,
)
from fixtures import make_graph


class TestFromArrays:
    def test_padding_and_masks(self):
        feat, ei, _ = make_graph(n=10, f=5, e=13)
        g = from_arrays(feat, ei)
        assert g.num_nodes == 10 and g.num_edges == 13
        assert g.n_pad % 8 == 0 and g.e_pad % 8 == 0
        assert g.n_pad >= 10 and g.e_pad >= 13
        nm = np.asarray(g.node_mask)
        assert nm[:10].all() and not nm[10:].any()
        em = np.asarray(g.edge_mask)
        assert em[:13].all() and not em[13:].any()
        np.testing.assert_allclose(np.asarray(g.x)[:10], feat)
        assert (np.asarray(g.x)[10:] == 0).all()
        np.testing.assert_array_equal(np.asarray(g.senders)[:13], ei[0])
        np.testing.assert_array_equal(np.asarray(g.receivers)[:13], ei[1])

    def test_element_size(self):
        feat, ei, _ = make_graph(n=10, f=5, e=13)
        g = from_arrays(feat, ei)
        assert element_size(g, "node_prediction") == 10
        assert element_size(g, "edge_prediction") == 13
        assert element_size(g, "graph_prediction") == 10

    def test_bad_edge_index_shape(self):
        with pytest.raises(ValueError):
            from_arrays(np.zeros((3, 2)), np.zeros((3, 4)))


class TestHetero:
    def _hetero_graph(self):
        feat = {
            "gene": np.arange(12, dtype=np.float32).reshape(4, 3),
            "drug": np.arange(10, dtype=np.float32).reshape(2, 5),
        }
        edge_index = {
            ("gene", "interacts", "gene"): np.array([[0, 1, 2], [1, 2, 3]]),
            ("gene", "targets", "drug"): np.array([[0, 3], [0, 1]]),
            ("drug", "affects", "gene"): np.array([[1], [2]]),
        }
        return feat, edge_index

    def test_pad_feature_blocks(self):
        feat, _ = self._hetero_graph()
        blocks, padded_dims, pointers = pad_feature_blocks(list(feat.values()))
        assert padded_dims == [2, 0]
        assert pointers == [0, 4]
        assert blocks[0].shape == (4, 5)
        assert (blocks[0][:, 3:] == 0).all()

    def test_hetero_to_homo_pointers_and_shifts(self):
        feat, edge_index = self._hetero_graph()
        g, info = hetero_to_homo(feat, edge_index)
        assert g.num_nodes == 6 and g.num_edges == 6
        assert info.node_pointers == [0, 4]
        assert info.edge_pointers == [0, 3, 5]
        assert info.padded_dims == [2, 0]
        # gene->drug edges: targets shifted by drug block start (4)
        snd = np.asarray(g.senders)[: g.num_edges]
        rcv = np.asarray(g.receivers)[: g.num_edges]
        np.testing.assert_array_equal(snd[3:5], [0, 3])
        np.testing.assert_array_equal(rcv[3:5], [4, 5])
        # drug->gene edge: source shifted by 4
        assert snd[5] == 5 and rcv[5] == 2
        nt = np.asarray(g.node_type)[: g.num_nodes]
        np.testing.assert_array_equal(nt, [0, 0, 0, 0, 1, 1])
        et = np.asarray(g.edge_type)[: g.num_edges]
        np.testing.assert_array_equal(et, [0, 0, 0, 1, 1, 2])

    def test_homo_to_hetero_roundtrip(self):
        feat, edge_index = self._hetero_graph()
        g, info = hetero_to_homo(feat, edge_index)
        x = np.asarray(g.x)[: g.num_nodes]
        nt = np.asarray(g.node_type)[: g.num_nodes]
        back = homo_to_hetero_features(x, nt, info)
        np.testing.assert_allclose(back["gene"], feat["gene"])
        np.testing.assert_allclose(back["drug"], feat["drug"])

    def test_hetero_names_to_homo(self):
        names = {"gene": ["g0", "g1"], "drug": ["d0", "d1", "d2"]}
        homo, types = hetero_names_to_homo(names)
        assert homo == ["g0", "g1", "d0", "d1", "d2"]
        np.testing.assert_array_equal(types, [0, 0, 1, 1, 1])
        homo2, types2 = hetero_names_to_homo(["a", "b"])
        assert homo2 == ["a", "b"] and types2 is None


class TestHostView:
    def test_seeded_no_refetch(self):
        import bikg_graph_explainability_public_tpu.graph as G

        feat = np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32)
        ei = np.array([[0, 1, 2], [1, 2, 3]])
        g = G.from_arrays(feat, ei)
        hv = G.host_view(g)
        # from_arrays seeds every field: no device fetch should be needed
        assert set(hv._cache) >= {
            "x", "senders", "receivers", "node_mask", "edge_mask",
            "node_type", "edge_type",
        }
        assert isinstance(hv.x, np.ndarray)
        np.testing.assert_array_equal(hv.senders[:3], [0, 1, 2])

    def test_memoised_per_instance(self):
        import bikg_graph_explainability_public_tpu.graph as G

        feat = np.zeros((4, 2), np.float32)
        ei = np.array([[0], [1]])
        g1 = G.from_arrays(feat, ei)
        g2 = G.from_arrays(feat, ei)
        assert G.host_view(g1) is G.host_view(g1)
        assert G.host_view(g1) is not G.host_view(g2)

    def test_unseeded_fetch(self):
        import jax.numpy as jnp
        import bikg_graph_explainability_public_tpu.graph as G

        feat = np.arange(8, dtype=np.float32).reshape(4, 2)
        g = G.from_arrays(feat, np.array([[0], [1]]))
        g2 = g.with_features(jnp.asarray(feat) * 2)  # new instance, unseeded
        hv = G.host_view(g2)
        np.testing.assert_allclose(hv.x[:4], feat * 2)
