"""Community-layer tests (reference scope: tests/test_pathways.py — mixed
exact / structural)."""

import numpy as np
import pandas as pd
import pandas.testing as pdt

from bikg_graph_explainability_public_tpu.explain.pathways import (
    Pathways,
    segment_table,
)


class TestCompGraph:
    def test_filters_and_drops_empty(self):
        pathways = [["a", "b", "c"], ["d", "e"], ["x", "y"]]
        names = ["b", "c", "e", "q"]
        p = Pathways(pathways, ["p0", "p1", "p2"])
        sub, sub_names, types = p.comp_graph(names)
        assert sub == [["b", "c"], ["e"]]
        assert sub_names == ["p0", "p1"]
        assert types is None

    def test_types_follow(self):
        p = Pathways(
            [["a"], ["z"]], ["p0", "p1"], community_types=np.array([3, 7])
        )
        sub, names, types = p.comp_graph(["a"])
        assert names == ["p0"]
        np.testing.assert_array_equal(types, [3])


class TestNames2Inds:
    def test_string_names(self):
        p = Pathways([["n2", "n0"], ["n1"]], None)
        inds = p.names2inds(["n0", "n1", "n2"])
        assert sorted(inds[0]) == [0, 2]
        assert inds[1] == [1]

    def test_already_ints_passthrough(self):
        p = Pathways([[0, 2], [1]], None)
        assert p.names2inds(["a", "b", "c"]) == [[0, 2], [1]]


class TestHetero2Homo:
    def test_flatten_and_shift(self):
        comms = {"gene": [[0, 1], [2]], "drug": [[0], [1, 2]]}
        names = {"gene": ["gA", "gB"], "drug": ["dA", "dB"]}
        p = Pathways(comms, names)
        # node pointers: gene block at 0, drug block at 10
        homo, homo_names, types = p.hetero2homo("node_prediction", [0, 10], None)
        assert homo == [[0, 1], [2], [10], [11, 12]]
        assert homo_names == ["gA", "gB", "dA", "dB"]
        np.testing.assert_array_equal(types, [0, 0, 1, 1])

    def test_string_communities_not_shifted(self):
        comms = {"gene": [["a", "b"]], "drug": [["c"]]}
        names = {"gene": ["gA"], "drug": ["dA"]}
        p = Pathways(comms, names)
        homo, homo_names, types = p.hetero2homo("node_prediction", [0, 5], None)
        assert homo == [["a", "b"], ["c"]]

    def test_homogeneous_passthrough(self):
        p = Pathways([[0, 1]], ["p"])
        homo, names, types = p.hetero2homo("node_prediction")
        assert homo == [[0, 1]] and names == ["p"] and types is None


class TestAggregate:
    def test_exact_sorted_dataframe(self):
        """Exact DataFrame parity (reference test_aggregate,
        tests/test_pathways.py:452-495 uses assert_frame_equal)."""
        p = Pathways([[0, 1], [2, 3]], ["low", "high"])
        config_val = np.array([0.1, 0.3, 0.5, 0.7])
        df = p.aggregate(config_val, [[0, 1], [2, 3]])
        expected = pd.DataFrame(
            {"name": ["high", "low"], "score": [0.6, 0.2]}
        ).set_index("name")
        pdt.assert_frame_equal(df, expected)

    def test_empty_community_dropped(self):
        p = Pathways([[0], []], ["a", "b"])
        df = p.aggregate(np.array([1.0]), [[0], []])
        assert list(df.index) == ["a"]


class TestSegmentTable:
    def test_layout(self):
        elements, seg, lengths = segment_table([[3, 1], [5], [2, 4, 0]])
        np.testing.assert_array_equal(elements, [3, 1, 5, 2, 4, 0])
        np.testing.assert_array_equal(seg, [0, 0, 1, 2, 2, 2])
        np.testing.assert_array_equal(lengths, [2, 1, 3])
