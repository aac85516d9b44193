"""KernelSHAP weight tests (reference scope: tests/test_kernels.py —
near-exact numeric vs math.comb ground truth)."""

import math

import jax.numpy as jnp
import numpy as np

from bikg_graph_explainability_public_tpu.explain.kernels import (
    approximate_shap_kernel_parity,
    shap_kernel,
)


def reference_kernel(k: int, s: int) -> float:
    """Ground truth straight from the formula (kernels.py:82-113 with the
    num_total = S-1 quirk at kernels.py:146)."""
    n = s - 1
    if k == 0 or k >= n + 1:
        return 0.0
    return n / (math.comb(n + 1, k) * (n + 1 - k) * k)


class TestShapKernel:
    def test_matches_comb_ground_truth(self):
        s = 12
        rows = []
        for k in range(s + 1):
            row = np.zeros(s, bool)
            row[:k] = True
            rows.append(row)
        mask = jnp.asarray(np.stack(rows))
        got = np.asarray(shap_kernel(mask, normalized=False))
        want = np.array([reference_kernel(k, s) for k in range(s + 1)])
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_all_active_and_all_inactive_zero(self):
        mask = jnp.asarray(np.array([[False] * 8, [True] * 8]))
        got = np.asarray(shap_kernel(mask))
        assert got[0] == 0.0 and got[1] == 0.0

    def test_normalization_preserves_ratios(self):
        rng = np.random.default_rng(0)
        mask = jnp.asarray(rng.random((40, 10)) > 0.5)
        raw = np.asarray(shap_kernel(mask, normalized=False))
        norm = np.asarray(shap_kernel(mask, normalized=True))
        nz = raw > 0
        ratios = norm[nz] / raw[nz]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)
        assert np.max(norm) <= 1.0 + 1e-6

    def test_padded_columns_ignored(self):
        rng = np.random.default_rng(1)
        core = rng.random((30, 9)) > 0.5
        mask_small = jnp.asarray(core)
        padded = np.zeros((30, 16), bool)
        padded[:, :9] = core
        got = np.asarray(shap_kernel(jnp.asarray(padded), num_valid_columns=9))
        want = np.asarray(shap_kernel(mask_small))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_large_no_overflow(self):
        """>1000 elements: log-space kernel stays finite and positive — the
        case where the reference must approximate (kernels.py:148-162)."""
        s = 5000
        rng = np.random.default_rng(2)
        mask = jnp.asarray(rng.random((16, s)) > 0.5)
        got = np.asarray(shap_kernel(mask))
        assert np.isfinite(got).all()
        assert (got > 0).all()

    def test_parity_approximation_runs(self):
        rng = np.random.default_rng(3)
        mask = jnp.asarray(rng.random((8, 2000)) > 0.5)
        got = np.asarray(approximate_shap_kernel_parity(mask))
        assert np.isfinite(got).all()
