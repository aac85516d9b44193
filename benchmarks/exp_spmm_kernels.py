"""Measure SpMM formulations on the real chip to pick the Pallas design.

Workload: out[v] = sum_e w_e * x[snd_e] over E receiver-sorted edges,
N nodes, F features (the weighted_gather_sum hot op).

The axon tunnel adds ~25 ms RPC overhead per dispatch, so every variant is
timed with the scan-slope method (run the op n times inside ONE jit with a
data dependence; per-op cost = slope between two n values).

Run: python benchmarks/exp_spmm_kernels.py [N] [E] [F]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def marginal_time(make_op, w, *operands, n1=2, n2=10):
    """Seconds per op; make_op(w_i, *operands) -> array. The weight vector w
    is perturbed per iteration through an always-false data dependence.
    Large arrays must be passed via ``operands`` (jit arguments) — closures
    become HLO constants and can exceed the compile-RPC body limit."""

    def scan_n(n):
        @jax.jit
        def run(w, *ops):
            def body(carry, _):
                w_i = jnp.where(carry > 1e30, 0.0, w)
                out = make_op(w_i, *ops)
                return carry + out.ravel()[0], ()

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return out

        return run

    def best_of(n, reps=3):
        f = scan_n(n)
        np.asarray(f(w, *operands))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(w, *operands))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(n1)
    t2 = best_of(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def build_ell(snd, rcv, w, n, k_round=8):
    deg = np.bincount(rcv, minlength=n)
    k = -(-int(deg.max()) // k_round) * k_round
    nbr = np.zeros((n, k), np.int32)
    wk = np.zeros((n, k), np.float32)
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=starts[1:])
    slot = np.arange(len(rcv)) - starts[rcv]
    nbr[rcv, slot] = snd
    wk[rcv, slot] = w
    return nbr, wk, k


def main(n=100_000, e=1_000_000, f=128):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    snd = rng.integers(0, n, e).astype(np.int32)
    rcv = np.sort(rng.integers(0, n, e).astype(np.int32))
    w = rng.random(e).astype(np.float32)
    snd_j, rcv_j = jnp.asarray(snd), jnp.asarray(rcv)
    w_j = jnp.asarray(w)

    gb_min = (e * f * 4 + n * f * 4) / 1e9
    print(f"N={n} E={e} F={f}  min bytes ~{gb_min:.2f} GB; v5e HBM ~819 GB/s "
          f"=> SoL ~{gb_min / 819 * 1e3:.2f} ms", flush=True)

    def report(name, t):
        print(f"{name:34s} {t*1e3:8.2f} ms  ({gb_min/t:5.0f} GB/s eff)",
              flush=True)

    # raw gather (w_i used to scale gathered rows -> dependence w/o scatter)
    t = marginal_time(lambda wi: (wi[:, None] * x[snd_j]).sum(0), w_j)
    report("gather+colsum (roofline proxy)", t)

    t_a = marginal_time(
        lambda wi: jax.ops.segment_sum(
            wi[:, None] * x[snd_j], rcv_j, num_segments=n,
            indices_are_sorted=True),
        w_j,
    )
    report("A XLA scatter (sorted)", t_a)

    nbr, wk, k = build_ell(snd, rcv, w, n)
    nbr_j, wk_j = jnp.asarray(nbr), jnp.asarray(wk)
    print(f"ELL K={k} pad x{n*k/e:.2f}", flush=True)
    t_b = marginal_time(lambda wi: (wi[:, :, None] * x[nbr_j]).sum(1), wk_j)
    report("B XLA ELL gather+sum", t_b)

    t_b2 = marginal_time(
        lambda wi: jnp.einsum("nk,nkf->nf", wi, x[nbr_j],
                              preferred_element_type=jnp.float32),
        wk_j,
    )
    report("B2 XLA ELL einsum", t_b2)

    try:
        from exp_spmm_pallas_proto import make_pallas_ell

        for tr, g in [(256, 8), (512, 8), (256, 16)]:
            op = make_pallas_ell(n, k, f, tr=tr, g=g)
            t_c = marginal_time(lambda wi: op(nbr_j, wi, x), wk_j)
            report(f"C Pallas ELL DMA tr={tr} g={g}", t_c)
        ref = jax.ops.segment_sum(w_j[:, None] * x[snd_j], rcv_j,
                                  num_segments=n, indices_are_sorted=True)
        op = make_pallas_ell(n, k, f, tr=256, g=8)
        err = np.abs(np.asarray(op(nbr_j, wk_j, x)) - np.asarray(ref)).max()
        print(f"  max err vs scatter: {err:.2e}", flush=True)
    except ImportError as ex:
        print(f"(no pallas proto: {ex})", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "benchmarks")
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
