"""Native C++ graph-builder tests (vs numpy oracles)."""

import numpy as np

from bikg_graph_explainability_public_tpu.runtime import native
from fixtures import dense_khop, make_graph


class TestNative:
    def test_compiles(self):
        assert native.native_available(), "g++ compile of graph_builder.cpp failed"

    def test_build_csr(self):
        _, ei, _ = make_graph(n=50, f=4, e=200, seed=1)
        row_ptr, col, eid = native.build_csr(50, ei[0], ei[1])
        assert row_ptr[-1] == 200
        for v in range(50):
            seg = slice(row_ptr[v], row_ptr[v + 1])
            # every edge in row v targets v, col holds its sender
            np.testing.assert_array_equal(ei[1][eid[seg]], v)
            np.testing.assert_array_equal(ei[0][eid[seg]], col[seg])
        counts = np.bincount(ei[1], minlength=50)
        np.testing.assert_array_equal(np.diff(row_ptr), counts)

    def test_build_ell_roundtrip(self):
        _, ei, _ = make_graph(n=40, f=4, e=150, seed=2)
        k = native.max_degree(40, ei[1])
        nbr, eid, valid, dropped = native.build_ell(40, ei[0], ei[1], k)
        assert dropped == 0
        assert valid.sum() == 150
        for v in range(40):
            slots = valid[v]
            np.testing.assert_array_equal(ei[1][eid[v][slots]], v)
            np.testing.assert_array_equal(ei[0][eid[v][slots]], nbr[v][slots])

    def test_build_ell_overflow(self):
        src = np.zeros(10, np.int32)
        dst = np.zeros(10, np.int32)  # all into node 0
        nbr, eid, valid, dropped = native.build_ell(4, src, dst, 6)
        assert dropped == 4
        assert valid[0].sum() == 6

    def test_khop_matches_oracle(self):
        _, ei, _ = make_graph(n=36, f=4, e=116, seed=3)
        for hops in (1, 2, 3):
            got = native.khop_reachable(36, ei[0], ei[1], 7, hops)
            want = dense_khop(ei, 7, hops, 36)
            np.testing.assert_array_equal(got, want)

    def test_edge_mask(self):
        _, ei, _ = make_graph(n=20, f=4, e=60, seed=4)
        nm = np.random.default_rng(0).random(20) > 0.5
        got = native.edge_mask_from_node_mask(ei[0], ei[1], nm)
        np.testing.assert_array_equal(got, nm[ei[0]] & nm[ei[1]])
