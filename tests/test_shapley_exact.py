"""End-to-end estimator correctness: the trained surrogate must agree with
the CLOSED-FORM minimizer of its own objective computed over the complete
coalition space.

This is a stronger gate than anything in the reference's suite (which only
asserts structure for the stochastic path, SURVEY §4): on a small
computational subgraph (S <= 10 elements -> 2^S coalitions) we enumerate
every mask, run the real black box on each, solve the kernel-weighted least
squares exactly, and require the SGD pipeline (at a converged budget, without
regularisation) to recover it.
"""

import itertools
import os

import jax
import numpy as np
import pytest

import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.explain.kernels import shap_kernel
from bikg_graph_explainability_public_tpu.graph import from_arrays
from bikg_graph_explainability_public_tpu.ops.khop import extract_khop_subgraph
from bikg_graph_explainability_public_tpu.models.torch_import import (
    gcn_node_model_params,
    load_state_dict,
)
from fixtures import make_graph

HOMO_CKPT = "/root/reference/test_data/gcn_homo_1hop_lungCancer.pth.tar"


@pytest.mark.skipif(not os.path.exists(HOMO_CKPT), reason="ckpt absent")
class TestExactShapley:
    def test_converged_pipeline_matches_closed_form(self):
        feat, ei, names = make_graph(n=36, f=84, e=116, seed=9)
        sd = load_state_dict(HOMO_CKPT)
        model = px.Model(px.GCNNodeModel(84), gcn_node_model_params(sd))
        g = from_arrays(feat, ei)

        # query 10's 2-hop computational subgraph has 7 elements (seed 9)
        sub = extract_khop_subgraph(g, 10, 2)
        s_el = sub.graph.num_nodes
        assert s_el <= 10

        # all 2^S coalitions over the padded width
        width = sub.graph.n_pad
        all_masks = np.zeros((2**s_el, width), bool)
        for i, bits in enumerate(itertools.product([0, 1], repeat=s_el)):
            all_masks[i, :s_el] = bits
        outputs = np.asarray(
            model.perturbed_query_outputs(
                sub.graph, jax.numpy.asarray(all_masks), "node_prediction",
                sub.query, chunk_size=2**s_el,
            )
        )
        kern = np.asarray(shap_kernel(jax.numpy.asarray(all_masks), s_el))

        # closed-form minimizer of the surrogate objective (no reg):
        # min_w sum_z k(z) (z.w - f(z))^2
        z = all_masks[:, :s_el].astype(np.float64)
        kw = kern.astype(np.float64)
        a = (z * kw[:, None]).T @ z
        b = (z * kw[:, None]).T @ outputs.astype(np.float64)
        w_exact = np.linalg.solve(a + 1e-12 * np.eye(s_el), b)

        # pipeline at converged budget, regularisation off (400 samples x 4
        # repeats: corr 0.994 measured; 100x2 sat at 0.94, inside estimator
        # noise of the 0.95 gate and flaky across RNG-stream changes)
        cfg = {"seed": 0, "interpret_samples": 400, "epochs": 600,
               "lr": 0.02, "l1_lambda": 0.0, "weight_decay": 0.0}
        df, _ = px.Explainer(feat, ei, model, cfg, names).run("10", times=4)
        w_est = df.sort_index().loc[
            [names[i] for i in sorted(np.asarray(sub.parent_nodes[:s_el]))]
        ]
        # align: df index are original names; sort both by original node id
        order = np.argsort(np.asarray(sub.parent_nodes[:s_el]))
        w_exact_sorted = w_exact[order]
        est = w_est["config_value_mean"].to_numpy()

        corr = np.corrcoef(est, w_exact_sorted)[0, 1]
        assert corr > 0.95, (corr, est, w_exact_sorted)
        # and the top element agrees
        assert int(np.argmax(est)) == int(np.argmax(w_exact_sorted))
