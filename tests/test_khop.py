"""k-hop computational-subgraph extraction vs a dense oracle
(reference scope: tests/test_data.py test_comp_graph, with randomized hops)."""

import numpy as np

from bikg_graph_explainability_public_tpu.graph import from_arrays
from bikg_graph_explainability_public_tpu.ops.khop import extract_khop_subgraph
from fixtures import make_graph, dense_khop


class TestKhop:
    def test_matches_dense_oracle(self):
        feat, ei, _ = make_graph(n=36, f=8, e=116, seed=3)
        g = from_arrays(feat, ei)
        rng = np.random.default_rng(7)
        for _ in range(6):
            hops = int(rng.integers(1, 4))
            query = int(rng.integers(0, 36))
            sub = extract_khop_subgraph(g, query, hops)
            reach = dense_khop(ei, query, hops, 36)
            kept = np.nonzero(reach)[0]
            assert sub.graph.num_nodes == kept.shape[0]
            np.testing.assert_array_equal(
                np.asarray(sub.parent_nodes[: sub.graph.num_nodes]), kept
            )
            # query relabel: ascending original order
            assert kept[sub.query] == query
            # induced edges
            keep_e = reach[ei[0]] & reach[ei[1]]
            assert sub.graph.num_edges == int(keep_e.sum())
            relabel = {int(o): i for i, o in enumerate(kept)}
            exp_snd = [relabel[int(s)] for s, k in zip(ei[0], keep_e) if k]
            exp_rcv = [relabel[int(d)] for d, k in zip(ei[1], keep_e) if k]
            np.testing.assert_array_equal(
                np.asarray(sub.graph.senders)[: sub.graph.num_edges], exp_snd
            )
            np.testing.assert_array_equal(
                np.asarray(sub.graph.receivers)[: sub.graph.num_edges], exp_rcv
            )
            # features gathered in order
            np.testing.assert_allclose(
                np.asarray(sub.graph.x)[: sub.graph.num_nodes], feat[kept]
            )

    def test_isolated_query_self_loop_fallback(self):
        # node 5 has no edges at all -> single self-loop (reference data.py:337-339)
        feat = np.eye(6, dtype=np.float32)
        ei = np.array([[0, 1], [1, 2]])
        g = from_arrays(feat, ei)
        sub = extract_khop_subgraph(g, 5, 2)
        assert sub.graph.num_nodes == 1
        assert sub.graph.num_edges == 1
        assert int(sub.graph.senders[0]) == sub.query
        assert int(sub.graph.receivers[0]) == sub.query

    def test_hop_zero_is_query_only(self):
        feat, ei, _ = make_graph(n=12, f=4, e=30, seed=5)
        g = from_arrays(feat, ei)
        sub = extract_khop_subgraph(g, 4, 0)
        assert np.asarray(sub.parent_nodes[: sub.graph.num_nodes]).tolist() == [4]
