"""KernelSHAP weighting, computed in log space.

Reference: ``src/pathway_explanations/kernels.py``.  The reference computes
``binom(num_total+1, k)`` directly with scipy (``kernels.py:82-113``) and must
fall back to a scaled 1000-element approximation with a ``ref *= 0.9`` retry
loop above 1000 elements (``kernels.py:148-162``) because the binomial
overflows.

Here the kernel is computed as ``exp(log-kernel - max(log-kernel))`` using
``lgamma``.  Two facts make this exactly equivalent and strictly better:

* the surrogate loss ``mean(w * diff) / w.sum()`` (``wlm.py:491-520``) is
  invariant to scaling ``w`` by any positive constant, so max-normalisation
  changes nothing downstream;
* in log space there is no overflow at any element count, so the >1000
  approximation becomes unnecessary (it is retained behind
  ``approx_parity=True`` for behavioural comparison).

Reference quirk preserved for parity: ``num_total = S - 1`` where S is the
mask width (``kernels.py:146``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _log_binom(n, k):
    """log C(n, k) via lgamma (n, k float arrays)."""
    return (
        jax.lax.lgamma(n + 1.0) - jax.lax.lgamma(k + 1.0) - jax.lax.lgamma(n - k + 1.0)
    )


def shap_kernel(
    mask: jax.Array,
    num_valid_columns: int | None = None,
    *,
    normalized: bool = True,
) -> jax.Array:
    """Per-row KernelSHAP weight for a [M, S] boolean mask.

    kernel(k) = n / (C(n+1, k) * (n+1-k) * k) with n = num_total = S_eff - 1
    (reference ``original_shap_kernel``, ``kernels.py:82-113`` + the
    ``shape[1]-1`` quirk at ``kernels.py:146``).  Rows with k == 0 or
    k == S_eff get weight 0 (the reference's ``nan_to_num(posinf=0,
    neginf=0)``, ``kernels.py:172``).

    ``num_valid_columns``: actual element count S_eff when the mask is padded
    to a wider static width (padding columns must be False).
    """
    s_eff = num_valid_columns if num_valid_columns is not None else mask.shape[1]
    k = jnp.sum(mask, axis=1).astype(jnp.float32)
    n = jnp.float32(s_eff - 1)

    logw = (
        jnp.log(n)
        - _log_binom(n + 1.0, k)
        - jnp.log(jnp.maximum(n + 1.0 - k, 1e-30))
        - jnp.log(jnp.maximum(k, 1e-30))
    )
    valid = (k >= 1.0) & (k <= n)
    if normalized:
        safe = jnp.where(valid, logw, -jnp.inf)
        logw = logw - jnp.max(jnp.where(jnp.isfinite(safe), safe, -1e30))
    w = jnp.exp(logw)
    return jnp.where(valid, w, 0.0)


def approximate_shap_kernel_parity(
    mask: jax.Array, num_valid_columns: int | None = None, ref: int = 1000
) -> jax.Array:
    """Behavioural-parity port of the reference's >1000-element approximation
    (``kernels.py:22-80``): scaled C(ref, k*ref/n) lookup.  Kept only so the
    two weighting schemes can be compared; the log-space kernel is exact and
    is the default."""
    s_eff = num_valid_columns if num_valid_columns is not None else mask.shape[1]
    num_active = jnp.sum(mask, axis=1).astype(jnp.float32)
    num_total = float(s_eff - 1)
    idx_grid = jnp.arange(ref, dtype=jnp.float32)
    log_choose = _log_binom(jnp.float32(ref), idx_grid)
    index = jnp.clip((num_active * 1000.0 / num_total).astype(jnp.int32), 0, ref - 1)
    # log-space: the reference computes this in float64 and reaches 1e-300
    # denormals; kernel scale cancels in the surrogate loss, so the parity
    # output is normalized to max 1 (like shap_kernel)
    log_kernel = (
        jnp.log(num_total)
        - (log_choose[index] + jnp.log(num_total / 1000.0))
        - jnp.log(jnp.maximum(num_active, 1e-30))
        - jnp.log(jnp.maximum(num_total - num_active, 1e-30))
    )
    valid = (num_active >= 1.0) & (num_active <= num_total)
    safe = jnp.where(valid, log_kernel, -jnp.inf)
    mx = jnp.max(jnp.where(jnp.isfinite(safe), safe, -1e30))
    return jnp.where(valid, jnp.exp(log_kernel - mx), 0.0)
