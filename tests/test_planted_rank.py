"""Planted-ground-truth rank tests (VERDICT r2 item 7).

Tiny graphs where the causally important element is known BY CONSTRUCTION —
the query's prediction is (almost entirely) a function of exactly one
neighbour's feature / one edge / one node — and the explainer must rank that
element first.  This operationalizes BASELINE.md's "matching attribution
rankings" gate beyond the reference's structure-only assertions
(``/root/reference/tests/test_wlm.py:199-216``): node, edge and graph
problems, homogeneous and heterogeneous.
"""

import jax
import jax.numpy as jnp
import numpy as np

import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.graph import hetero_to_homo
from bikg_graph_explainability_public_tpu.models.gnn import (
    hetero_gcn_for_relations,
)

CFG = {"seed": 0, "interpret_samples": 100, "epochs": 100, "lr": 0.1,
       "l1_lambda": 1e-5}


class SumNeighborFeature:
    """Protocol model: out[v] = sum over in-edges of w_e * x[snd, 0].

    The query's prediction is exactly the masked sum of its neighbours'
    first feature — the neighbour with the planted large feature IS the
    ground-truth top attribution.
    """

    num_hops = 1

    def apply(self, params, x, senders, receivers, edge_weight):
        msg = edge_weight * x[senders, 0]
        out = jax.ops.segment_sum(msg, receivers, num_segments=x.shape[0])
        return out[:, None]


def _star(planted=3, n=8, hub=0, value=10.0):
    """Star graph: spokes 1..n-1 -> hub; node ``planted`` carries the
    signal feature, everyone else noise."""
    feat = np.full((n, 4), 0.1, np.float32)
    feat[planted, 0] = value
    snd = np.arange(1, n)
    rcv = np.full(n - 1, hub)
    ei = np.stack([snd, rcv])
    names = [str(i) for i in range(n)]
    return feat, ei, names


class TestPlantedNode:
    def test_homo_node_prediction_ranks_planted_first(self):
        feat, ei, names = _star(planted=3)
        model = px.Model(SumNeighborFeature(), {})
        df, _ = px.Explainer(
            feat, ei, model, CFG, names, problem="node_prediction"
        ).run("0", times=2)
        # the query node gates every edge, so it may legitimately rank at
        # the top; among all OTHER elements the planted neighbour must win
        ranked = [nm for nm in df.index.tolist() if nm != "0"]
        assert ranked[0] == "3", df

    def test_homo_node_planted_beats_noise_with_margin(self):
        feat, ei, names = _star(planted=5)
        model = px.Model(SumNeighborFeature(), {})
        df, _ = px.Explainer(
            feat, ei, model, CFG, names, problem="node_prediction"
        ).run("0", times=2)
        s = df["config_value_mean"]
        others = [nm for nm in df.index if nm not in ("0", "5")]
        assert s["5"] > 3.0 * max(abs(s[nm]) for nm in others), df


class TestPlantedEdge:
    def test_homo_edge_prediction_ranks_planted_first(self):
        feat, ei, names = _star(planted=4)
        edge_names = [f"e{i}" for i in range(ei.shape[1])]
        # the planted edge is the one from node 4 into the hub
        planted_edge = f"e{int(np.nonzero(ei[0] == 4)[0][0])}"
        model = px.Model(SumNeighborFeature(), {})
        df, _ = px.Explainer(
            feat, ei, model, CFG, edge_names, problem="edge_prediction"
        ).run(planted_edge, times=2)
        assert df.index.tolist()[0] == planted_edge, df


class TestPlantedGraph:
    def test_homo_graph_prediction_ranks_planted_first(self):
        # ring so every node has an edge; pooled prediction = mean of
        # per-node neighbour-feature sums -> dominated by the planted
        # node's out-edge contribution
        n = 8
        feat = np.full((n, 4), 0.1, np.float32)
        feat[6, 0] = 10.0
        snd = np.arange(n)
        rcv = (snd + 1) % n
        ei = np.stack([snd, rcv])
        names = [str(i) for i in range(n)]
        model = px.Model(SumNeighborFeature(), {})
        df, _ = px.Explainer(
            feat, ei, model, CFG, names, problem="graph_prediction"
        ).run(None, times=2)
        # masking node 6 kills the dominant contribution; 7 (its receiver)
        # gates the same edge, so top-2 = {6, 7} with 6 expected first
        assert "6" in df.index.tolist()[:2], df
        assert df.index.tolist()[0] in ("6", "7"), df


class TestPlantedHetero:
    def _hetero(self, planted_local=2, value=10.0):
        npt = 6
        f = 4
        feat = {
            "a": np.full((npt, f), 0.1, np.float32),
            "b": np.full((npt, f), 0.1, np.float32),
        }
        # planted signal lives on an 'a' node feeding the queried a0 (the
        # reference's hetero graphs are same-type relations — gene__X__gene;
        # cross-type GCN relations zero all messages because gcn_norm's
        # self-loops are dst-scoped and pure senders then have degree 0)
        feat["a"][planted_local, 0] = value
        relations = [("a", "feeds", "a"), ("b", "links", "b")]
        ei = {
            # every a -> a0 (star); plus a b-ring so the second type exists
            ("a", "feeds", "a"): np.stack(
                [np.arange(1, npt), np.zeros(npt - 1, np.int64)]
            ),
            ("b", "links", "b"): np.stack(
                [np.arange(npt), (np.arange(npt) + 1) % npt]
            ),
        }
        g, info = hetero_to_homo(feat, ei)
        mdef = hetero_gcn_for_relations(
            ["a", "b"], relations, in_features=f, conv_channels=(1,),
            fc_channels=(1,),
        )
        params = mdef.init(jax.random.PRNGKey(0))
        # handcraft monotone params: conv reads feature 0 positively, head
        # passes it through (sigmoid is monotone, ranks preserved)
        for rel in relations:
            key = "__".join(rel)
            params["conv"][0][key]["weight"] = jnp.array([[1.0, 0, 0, 0]])
            if "bias" in params["conv"][0][key]:
                params["conv"][0][key]["bias"] = jnp.zeros((1,))
        params["fc"] = [
            {"weight": jnp.ones((1, 1)), "bias": jnp.zeros((1,))}
        ]
        names = [f"{t}{i}" for t in ("a", "b") for i in range(npt)]
        return g, mdef, params, names

    def test_hetero_node_prediction_ranks_planted_first(self):
        g, mdef, params, names = self._hetero(planted_local=2)
        model = px.Model(mdef, params)
        # sigmoid squashes the signal's output spread to ~0.44, so the
        # surrogate needs a deeper budget to separate it from the uniform
        # fit (and the reference's hardcoded weight_decay=1e-2 biases
        # toward uniform weights at this scale — off here)
        cfg = dict(CFG, epochs=400, lr=0.2, weight_decay=0.0)
        dfs = px.explain_many(
            model, g, [0], cfg, names=names, times=2,
            problem="node_prediction",
        )
        df = dfs[0]
        ranked = [nm for nm in df.index.tolist() if nm != "a0"]
        assert ranked[0] == "a2", df
