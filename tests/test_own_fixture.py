"""Standalone operation: the repo's own trained fixture (no reference
checkpoints required)."""

import os

import numpy as np

import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.models.checkpoint import load_params

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OWN_CKPT = os.path.join(HERE, "test_data", "gcn_homo_36n_own.npz")
OWN_GRAPH = os.path.join(HERE, "test_data", "toy_graph_36n.npz")


class TestOwnFixture:
    def test_fixture_exists(self):
        assert os.path.exists(OWN_CKPT)
        assert os.path.exists(OWN_GRAPH)

    def test_explain_with_own_checkpoint(self):
        data = np.load(OWN_GRAPH)
        feat, ei = data["feat"], data["edge_index"]
        names = [str(x) for x in data["names"]]
        model = px.Model(px.GCNNodeModel(84), load_params(OWN_CKPT))
        cfg = {"seed": 1, "interpret_samples": 10, "epochs": 20, "lr": 0.01,
               "l1_lambda": 1e-4}
        cv, pw = px.Explainer(feat, ei, model, cfg, names).run("10", times=1)
        assert len(cv) > 0
        assert np.isfinite(cv.to_numpy()).all()

    def test_model_fits_training_labels(self):
        data = np.load(OWN_GRAPH)
        g = px.from_arrays(data["feat"], data["edge_index"])
        model = px.Model(px.GCNNodeModel(84), load_params(OWN_CKPT))
        out = np.asarray(model.infer(g))[:36, 0]
        acc = ((out > 0.5) == (data["labels"] > 0.5)).mean()
        assert acc > 0.95
