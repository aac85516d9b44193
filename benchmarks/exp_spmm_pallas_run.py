"""Run only the Pallas ELL SpMM prototype variants (fast iteration)."""

import sys

sys.path.insert(0, "benchmarks")

import numpy as np
import jax
import jax.numpy as jnp

from exp_spmm_kernels import build_ell, marginal_time
from exp_spmm_pallas_proto import make_pallas_ell


def main(n=100_000, e=1_000_000, f=128, variants=((256, 8), (512, 16), (128, 32))):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    snd = rng.integers(0, n, e).astype(np.int32)
    rcv = np.sort(rng.integers(0, n, e).astype(np.int32))
    w = rng.random(e).astype(np.float32)
    nbr, wk, k = build_ell(snd, rcv, w, n)
    nbr_j, wk_j = jnp.asarray(nbr), jnp.asarray(wk)
    gb_min = (e * f * 4 + n * f * 4) / 1e9
    print(f"ELL K={k} pad x{n*k/e:.2f}; SoL ~{gb_min/819*1e3:.2f} ms", flush=True)

    ref = jax.ops.segment_sum(
        jnp.asarray(w)[:, None] * x[jnp.asarray(snd)], jnp.asarray(rcv),
        num_segments=n, indices_are_sorted=True)
    ref = np.asarray(ref)

    for tr, g in variants:
        op = make_pallas_ell(n, k, f, tr=tr, g=g)
        err = np.abs(np.asarray(op(nbr_j, wk_j, x)) - ref).max()
        t = marginal_time(lambda wi: op(nbr_j, wi, x), wk_j)
        print(f"Pallas ELL tr={tr} g={g}: {t*1e3:8.2f} ms "
              f"({gb_min/t:5.0f} GB/s eff)  err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
