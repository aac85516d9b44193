"""Direct numerical parity against the *actual* reference implementation.

torch_geometric is unavailable here, so only the reference modules with no
PyG dependency are importable as oracles: ``kernels.py`` (torch + scipy) and
``pathways.py`` (torch + numpy + pandas).  These tests execute the reference
code from its read-only mount and assert our outputs match — the strongest
parity signal available without a PyG install.  (Forward parity vs the
trained reference *checkpoints* lives in tests/test_models.py.)
"""

import importlib.util
import os

import numpy as np
import pandas as pd
import pytest
import torch

from bikg_graph_explainability_public_tpu.explain.kernels import shap_kernel
from bikg_graph_explainability_public_tpu.explain.pathways import Pathways

REF = "/root/reference/src/pathway_explanations"


def _load_ref(name):
    path = os.path.join(REF, f"{name}.py")
    if not os.path.exists(path):
        pytest.skip("reference mount unavailable")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestKernelParity:
    def _ref_kernel(self, mask_np):
        kernels = _load_ref("kernels")
        return kernels.Kernel(torch.tensor(mask_np)).compute().numpy()

    @staticmethod
    def _norm(k):
        # our kernel is computed in log space and normalized to max 1 for
        # stability; the surrogate loss is invariant to kernel scale
        # (wlm.py:517: mean(k*diff)/k.sum()), so parity is up to a constant
        m = k.max()
        return k / m if m > 0 else k

    def test_exact_regime(self):
        rng = np.random.default_rng(0)
        mask = rng.random((64, 40)) > 0.5
        ref = self._ref_kernel(mask)
        # reference convention: num_total = width - 1 (kernels.py:146); our
        # width equals the mask width, valid columns = all of them
        ours = np.asarray(shap_kernel(mask, num_valid_columns=mask.shape[1]))
        np.testing.assert_allclose(self._norm(ours), self._norm(ref), rtol=1e-4)

    def test_exact_regime_includes_degenerate_rows(self):
        """All-zero and all-one coalitions must zero out exactly like the
        reference's nan_to_num symmetrization (kernels.py:172)."""
        rng = np.random.default_rng(1)
        mask = rng.random((16, 12)) > 0.5
        mask[0] = False
        mask[1] = True
        ref = self._ref_kernel(mask)
        ours = np.asarray(shap_kernel(mask, num_valid_columns=mask.shape[1]))
        np.testing.assert_allclose(
            self._norm(ours), self._norm(ref), rtol=1e-4, atol=1e-7
        )

    def test_approximate_regime(self):
        """>1000 elements: the reference's ref=1000, 0.9x-decay approximation
        (kernels.py:148-162) vs our parity implementation."""
        from bikg_graph_explainability_public_tpu.explain.kernels import (
            approximate_shap_kernel_parity,
        )

        rng = np.random.default_rng(2)
        width = 1200
        mask = rng.random((32, width)) > 0.5
        ref = self._ref_kernel(mask)
        ours = np.asarray(approximate_shap_kernel_parity(mask))
        rmax = ref.max()
        omax = ours.max()
        np.testing.assert_allclose(
            ours / omax if omax > 0 else ours,
            ref / rmax if rmax > 0 else ref,
            rtol=1e-3, atol=1e-7,
        )


class TestPathwaysParity:
    def test_names2inds(self):
        ref_mod = _load_ref("pathways")
        names = [f"n{i}" for i in range(20)]
        comms = [[f"n{i}" for i in (3, 5, 7)], [f"n{i}" for i in (0, 11, 19, 4)]]
        ref = ref_mod.Pathways(comms, ["a", "b"]).names2inds(names)
        ours = Pathways(comms, ["a", "b"]).names2inds(names)
        assert [sorted(r) for r in ref] == [sorted(o) for o in ours]

    def test_comp_graph_filtering(self):
        """Community filtering to the computational graph (pathways.py:33-102)."""
        ref_mod = _load_ref("pathways")
        comms = [["a", "b", "c"], ["d", "e"], ["x", "y"]]
        cnames = ["abc", "de", "xy"]
        sub_names = ["b", "c", "d", "q"]
        ref_pw, ref_names, _ = ref_mod.Pathways(comms, cnames).comp_graph(sub_names)
        our_pw, our_names, _ = Pathways(comms, cnames).comp_graph(sub_names)
        assert [sorted(p) for p in ref_pw] == [sorted(p) for p in our_pw]
        assert list(ref_names) == list(our_names)

    def test_aggregate_dataframe(self):
        ref_mod = _load_ref("pathways")
        rng = np.random.default_rng(3)
        cv = rng.normal(size=12).astype(np.float32)
        inds = [[0, 1, 2], [3, 4], [5, 6, 7, 8], []]
        cnames = ["p0", "p1", "p2", "pempty"]
        ref_df = ref_mod.Pathways(inds, cnames).aggregate(
            torch.tensor(cv), [torch.tensor(i, dtype=torch.long) for i in inds[:3]]
            + [torch.tensor([], dtype=torch.long)]
        )
        our_df = Pathways(inds, cnames).aggregate(cv, inds)
        pd.testing.assert_frame_equal(
            our_df, ref_df, check_dtype=False, atol=1e-6
        )
