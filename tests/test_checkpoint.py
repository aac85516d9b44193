"""Checkpoint IO round-trips."""

import os

import jax
import numpy as np
import pytest

import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.models.checkpoint import (
    gcn_params_to_torch_state_dict,
    load_params,
    save_params,
)
from bikg_graph_explainability_public_tpu.models.torch_import import (
    gcn_node_model_params,
    load_state_dict,
)

HOMO_CKPT = "/root/reference/test_data/gcn_homo_1hop_lungCancer.pth.tar"


class TestCheckpointIO:
    def test_npz_roundtrip(self, tmp_path):
        mdef = px.GCNNodeModel(6, conv_channels=(4,), fc_channels=(4, 4))
        params = mdef.init(jax.random.PRNGKey(0))
        path = str(tmp_path / "p.npz")
        save_params(path, params)
        loaded = load_params(path)
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(loaded)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.skipif(not os.path.exists(HOMO_CKPT), reason="checkpoint absent")
    def test_torch_state_dict_roundtrip(self):
        sd = load_state_dict(HOMO_CKPT)
        params = gcn_node_model_params(sd)
        back = gcn_params_to_torch_state_dict(params)
        for k, v in sd.items():
            np.testing.assert_array_equal(back[k], v)
