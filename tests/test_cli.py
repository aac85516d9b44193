"""CLI tests (the reference declares but never implements its CLI —
setup.cfg:88-90; this one is real)."""

import json
import os

import numpy as np
import pytest

from bikg_graph_explainability_public_tpu.cli import main
from fixtures import make_graph

HOMO_CKPT = "/root/reference/test_data/gcn_homo_1hop_lungCancer.pth.tar"


@pytest.fixture
def graph_npz(tmp_path):
    feat, ei, names = make_graph(n=20, f=84, e=50, seed=5)
    path = tmp_path / "g.npz"
    np.savez(path, feat=feat, edge_index=ei, names=np.array(names))
    return str(path)


class TestCLI:
    def test_version(self, capsys):
        assert main(["version"]) == 0
        assert capsys.readouterr().out.strip()

    def test_missing_graph_clean_error(self, capsys):
        with pytest.raises(SystemExit) as e:
            main(["explain", "--graph", "nope.npz", "--checkpoint", "x",
                  "--element", "1"])
        assert e.value.code == 2
        assert "not found" in capsys.readouterr().err

    @pytest.mark.skipif(not os.path.exists(HOMO_CKPT), reason="ckpt absent")
    def test_missing_checkpoint_clean_error(self, graph_npz, capsys):
        with pytest.raises(SystemExit) as e:
            main(["explain", "--graph", graph_npz, "--checkpoint", "nope.tar",
                  "--element", "1"])
        assert e.value.code == 2
        assert "checkpoint not found" in capsys.readouterr().err

    @pytest.mark.skipif(not os.path.exists(HOMO_CKPT), reason="ckpt absent")
    def test_explain_to_csv(self, graph_npz, tmp_path, capsys):
        out = str(tmp_path / "scores.csv")
        pw = tmp_path / "pw.json"
        pw.write_text(json.dumps({
            "pathways": [[str(i) for i in range(10)], [str(i) for i in range(10, 20)]],
            "names": ["left", "right"],
        }))
        cfg = tmp_path / "cfg.json"
        cfg.write_text(json.dumps({
            "seed": 1, "interpret_samples": 5, "epochs": 10,
            "lr": 0.01, "l1_lambda": 1e-4,
        }))
        rc = main([
            "explain", "--graph", graph_npz, "--checkpoint", HOMO_CKPT,
            "--element", "3", "--pathways", str(pw), "--config", str(cfg),
            "--out", out,
        ])
        assert rc == 0
        assert os.path.exists(out)
        assert os.path.exists(out.replace(".csv", "_pathways.csv"))
        header = open(out).readline().strip()
        assert header == "name,config_value_mean,config_value_std"


class TestExplainBatchCommand:
    """explain-batch: the multi-query throughput path via the CLI."""

    @pytest.mark.skipif(not os.path.exists(HOMO_CKPT), reason="ckpt absent")
    def test_explain_batch_homo(self, graph_npz, tmp_path):
        cfgp = tmp_path / "cfg.json"
        cfgp.write_text(json.dumps({
            "seed": 1, "interpret_samples": 6, "epochs": 4,
            "lr": 0.01, "l1_lambda": 1e-4,
        }))
        out = tmp_path / "scores.csv"
        rc = main([
            "explain-batch", "--graph", graph_npz, "--checkpoint", HOMO_CKPT,
            "--elements", "3,7", "--config", str(cfgp),
            "--out", str(out),
        ])
        assert rc == 0
        import pandas as pd

        for el in ("3", "7"):
            df = pd.read_csv(tmp_path / f"scores_{el}.csv", index_col=0)
            assert len(df) > 0 and df["config_value_mean"].notna().all()

    def test_explain_batch_unknown_element(self, tmp_path):
        from bikg_graph_explainability_public_tpu.cli import main

        rng = np.random.default_rng(22)
        feat = rng.normal(size=(10, 4)).astype(np.float32)
        ei = np.stack([rng.integers(0, 10, 30), rng.integers(0, 10, 30)])
        gpath = tmp_path / "g.npz"
        np.savez(gpath, feat=feat, edge_index=ei)
        with pytest.raises(SystemExit):
            main([
                "explain-batch", "--graph", str(gpath),
                "--checkpoint", "/nonexistent.pth.tar",
                "--elements", "notanode",
            ])
