"""v5 fused-sum kernel on-chip: correctness vs the XLA segment-sum and
slope-timed throughput vs v3, at the production 100k/1M random workload.

Run on the real chip: python benchmarks/exp_spmm_v5.py
"""

import sys

sys.path.insert(0, "benchmarks")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from exp_spmm_kernels import marginal_time

from bikg_graph_explainability_public_tpu.graph import from_arrays
from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table
from bikg_graph_explainability_public_tpu.ops.spmm_pallas import (
    build_compact_plan,
    spmm_ell_pallas,
    _static_weights,
)


def main(n=100_000, e=1_000_000, f=128):
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((n, 8), dtype=np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(
        np.int64
    )
    g = from_arrays(feat, ei, pad_mode="exact")
    table = build_neighbor_table(g)
    nbr = np.asarray(table.nbr)
    valid = np.asarray(table.valid)
    k = table.k
    print(f"table K={k}", flush=True)
    assert jax.default_backend() == "tpu"

    # correctness on chip at a reduced width first
    b = 16
    w_width = b * f
    feats = jnp.asarray(
        rng.standard_normal((g.n_pad, w_width), dtype=np.float32)
    )
    # exact XLA reference for on-chip parity (k-slice loop: a one-shot
    # [N, K, W] gather would materialise 26 GB)
    valid_j = jnp.asarray(valid)
    nbr_j = jnp.asarray(nbr)

    @jax.jit
    def ref(fx):
        def body(i, acc):
            return acc + valid_j[:, i, None] * fx[nbr_j[:, i]]

        return jax.lax.fori_loop(0, k, body, jnp.zeros_like(fx))

    want = np.asarray(ref(feats))

    def run(tr, sched, dt=jnp.float32, ablate=""):
        mode = "v5" if sched == "v5" else "v3"
        plan = build_compact_plan(nbr, valid, tr, mode=mode)
        w2 = jnp.asarray(_static_weights(valid, tr))
        fx = feats.astype(dt)
        isz = jnp.dtype(dt).itemsize
        bytes_min = ((e + n) * w_width * isz + n * w_width * 4) / 1e9
        src_a = jnp.asarray(plan.src)

        # the serialising data dependence must flow through an input the
        # kernel actually READS in every sched (v5 ignores w entirely) —
        # use the plan src indices (+0 at runtime, opaque to XLA)
        def op(wd, fx, src_a):
            bump = jnp.where(wd > 1e30, 1, 0).astype(jnp.int32)
            return spmm_ell_pallas(
                src_a + bump, plan.dst, plan.cnt, w2, fx,
                k=k, tr=tr, b=b, n=g.n_pad, interpret=False,
                sched=sched, ablate=ablate,
            )

        if ablate == "" and dt == jnp.float32:
            got = np.asarray(
                jax.jit(op)(jnp.zeros((), jnp.float32), fx, src_a)
            )
            err = np.abs(got - want).max()
            print(f"  parity vs XLA exact: max err {err:.2e}", flush=True)
        t = marginal_time(op, jnp.zeros((), jnp.float32), fx, src_a)
        name = "bf16" if dt == jnp.bfloat16 else "f32 "
        print(
            f"{sched:5s} B={b:3d} {name} TR={tr:3d} {ablate or 'full':9s}: "
            f"{t*1e3:8.2f} ms  {bytes_min/t:5.0f} GB/s",
            flush=True,
        )

    run(64, "v6")
    run(64, "v6", ablate="noreduce")
    run(128, "v6")
    run(128, "v6", ablate="noreduce")
    run(128, "v6", dt=jnp.bfloat16)
    run(64, "v3")


if __name__ == "__main__":
    main()
