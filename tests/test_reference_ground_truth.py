"""Exact ground truths ported from the reference's test corpus.

Unlike ``test_reference_parity.py`` (which runs the reference's own modules as
a live oracle), these tests assert against the reference's *hand-enumerated*
expected values, extracted verbatim from its test literals:

- the fixed 36-node graph with per-hop computational subgraphs of node 10
  (``/root/reference/tests/test_data.py:369-1640``), extracted into
  ``test_data/ref_comp_graph_gt.npz`` by
  ``scripts/extract_reference_ground_truth.py``;
- the exact community-mask expansion case
  (``/root/reference/tests/test_pathways.py:393-450``);
- the exact ``aggregate`` DataFrame case asserted with
  ``assert_frame_equal`` (``/root/reference/tests/test_pathways.py:452-495``).

Plus mesh-shape invariance {1,2,4,8} of full explanation results — the
distributed guarantee the reference (single-device) never needed.

Reference-enumeration caveats, verified during extraction:

- the "116-edge" literal actually holds 117 edge rows (a trailing
  ``[34, 29]``);
- the reference's dead ``hops == 1`` branch is still a valid 1-hop ground
  truth, so it is asserted here even though the reference never reaches it;
- the ``hops == 4`` enumeration is internally inconsistent (34 nodes listed,
  35 reachable; 38 node-type entries) — the reference README warns this test
  "may present some issues" (``/root/reference/README.md:301``).  Hop 4 is
  asserted only as a superset-consistency check.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
from pandas.testing import assert_frame_equal

import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.explain.pathways import (
    Pathways,
    segment_table,
)
from bikg_graph_explainability_public_tpu.graph import from_arrays
from bikg_graph_explainability_public_tpu.ops.khop import extract_khop_subgraph

HERE = os.path.dirname(os.path.abspath(__file__))
GT = os.path.join(HERE, "..", "test_data", "ref_comp_graph_gt.npz")
GT_NAMES = os.path.join(HERE, "..", "test_data", "ref_comp_graph_gt_names.json")


@pytest.fixture(scope="module")
def gt():
    d = np.load(GT)
    with open(GT_NAMES) as f:
        names = json.load(f)
    return d, names


@pytest.fixture(scope="module")
def ref_graph(gt):
    d, _ = gt
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((36, 12), dtype=np.float32)
    g = from_arrays(
        feat,
        d["edge_index"],
        node_type=d["node_types"],
        edge_type=d["edge_types"],
        pad_mode="exact",
    )
    return g, feat


class TestCompGraphGroundTruth:
    """Exact per-hop subgraphs of node 10 (reference test_data.py:369-1640)."""

    @pytest.mark.parametrize("hops", [1, 2, 3])
    def test_exact_nodes_names_types_query(self, gt, ref_graph, hops):
        d, names = gt
        g, feat = ref_graph
        sub = extract_khop_subgraph(g, int(d["query"]), hops, pad_mode="exact")

        kept = np.asarray(sub.parent_nodes)[: sub.graph.num_nodes]
        expected_nodes = d[f"hop{hops}_nodes"]
        np.testing.assert_array_equal(kept, expected_nodes)

        # names: ours are original ids as strings in ascending order — the
        # reference asserts the same after its sort_feature canonicalizer
        assert [str(i) for i in kept] == names[str(hops)]

        # query position inside the (sorted) subgraph
        assert int(sub.query) == int(d[f"hop{hops}_query_pos"])

        # node types survive extraction exactly
        hv_types = np.asarray(sub.graph.node_type)[: sub.graph.num_nodes]
        np.testing.assert_array_equal(hv_types, d[f"hop{hops}_node_types"])

        # features gathered in the same (ascending-id) order
        np.testing.assert_allclose(
            np.asarray(sub.graph.x)[: sub.graph.num_nodes], feat[expected_nodes]
        )

    @pytest.mark.parametrize("hops", [1, 2, 3])
    def test_exact_edges(self, gt, ref_graph, hops):
        """The enumerated edge lists equal the induced edges among kept nodes
        (the reference enumerates exactly those; its own edge assertion is
        commented out because its edge *name* extraction is broken —
        SURVEY §7.3 — but the enumeration itself is checkable)."""
        d, _ = gt
        g, _ = ref_graph
        sub = extract_khop_subgraph(g, int(d["query"]), hops, pad_mode="exact")
        got = {
            (int(s), int(r))
            for s, r in zip(
                np.asarray(sub.graph.senders)[: sub.graph.num_edges],
                np.asarray(sub.graph.receivers)[: sub.graph.num_edges],
            )
        }
        exp_ei = d[f"hop{hops}_edge_index"]
        expected = {(int(s), int(r)) for s, r in exp_ei.T}
        assert got == expected

    def test_hop4_superset_consistency(self, gt, ref_graph):
        """Hop 4: the reference's enumeration is itself inconsistent (see
        module docstring), so assert the defensible direction only — every
        enumerated node is genuinely within 4 reverse hops of the query."""
        d, _ = gt
        g, _ = ref_graph
        sub = extract_khop_subgraph(g, int(d["query"]), 4, pad_mode="exact")
        kept = set(np.asarray(sub.parent_nodes)[: sub.graph.num_nodes].tolist())
        enumerated = set(d["hop4_nodes"].tolist())
        assert enumerated <= kept
        # the one extra reachable node the reference's enumeration missed
        assert len(kept - enumerated) == 1


class TestPathwaysGroundTruth:
    """Exact cases from /root/reference/tests/test_pathways.py."""

    PATHWAYS = [[3], [1, 2, 3, 4], [5, 7], [7, 8, 0, 4]]
    NAMES = ["1", "2", "3", "4"]

    def test_pathway_mask_expansion_exact(self):
        """test_pathways.py:393-450: pathway-level mask rows expand to the
        flattened (repeat_interleave-ordered) element mask."""
        pathway_mask = np.array(
            [
                [0, 0, 0, 0],
                [0, 0, 0, 1],
                [0, 1, 0, 0],
                [0, 0, 1, 0],
                [0, 0, 1, 0],
                [0, 1, 0, 1],
                [1, 1, 0, 0],
                [1, 1, 1, 0],
                [1, 0, 0, 0],
            ],
            dtype=bool,
        )
        expected = np.array(
            [
                [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1],
                [0, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0],
                [0, 1, 1, 1, 1, 0, 0, 1, 1, 1, 1],
                [1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
                [1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0],
                [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            ],
            dtype=bool,
        )
        _, seg_ids, _ = segment_table(self.PATHWAYS)
        got = pathway_mask[:, seg_ids]
        np.testing.assert_array_equal(got, expected)

    def test_aggregate_exact_frame(self):
        """test_pathways.py:452-495: exact sorted DataFrame via
        assert_frame_equal."""
        config_val = np.array(
            [0.21, 0.23, 0.95, 0.65, 0.98, -0.21, 0.32, 0.94, -0.34]
        )
        expected = pd.DataFrame(
            np.array([0.7025, 0.65, 0.4475, 0.365], dtype=np.float64),
            index=["2", "1", "4", "3"],
            columns=["score"],
        )
        expected.index.name = "name"
        got = Pathways(self.PATHWAYS, self.NAMES).aggregate(
            config_val, self.PATHWAYS
        )
        assert_frame_equal(expected, got)


class TestMeshShapeInvariance:
    """Full explanation results are identical on {1,2,4,8}-device meshes."""

    def test_explain_many_mesh_invariant(self, gt, ref_graph):
        import jax

        from bikg_graph_explainability_public_tpu.parallel.mesh import make_mesh

        g, _ = ref_graph
        mdef = px.GCNNodeModel(12, conv_channels=(8,), fc_channels=(8, 8))
        params = mdef.init(jax.random.PRNGKey(0))
        model = px.Model(mdef, params)
        cfg = {"seed": 3, "interpret_samples": 8, "epochs": 4, "lr": 0.01,
               "l1_lambda": 1e-4}
        queries = [10, 3, 25, 30]

        results = {}
        for nd in (1, 2, 4, 8):
            dfs = px.explain_many(model, g, queries, cfg, mesh=make_mesh(nd))
            results[nd] = dfs
        base = results[1]
        for nd in (2, 4, 8):
            for df_b, df_n in zip(base, results[nd]):
                assert list(df_b.index) == list(df_n.index)
                np.testing.assert_allclose(
                    df_b["config_value_mean"].to_numpy(),
                    df_n["config_value_mean"].to_numpy(),
                    rtol=1e-5,
                    atol=1e-6,
                )
