"""v4 fused-schedule SpMM sweep: does interleaving the K-reduce into the
DMA-issue loop overlap scalar issue with VPU reduce, and how far does a
larger TR (possible now the reduce is per-row VPU, no MXU TR-fold
redundancy) cut the grid overhead?

Grid of measurements on the 100k/1M random workload:
  sched in {v3, fused} x TR in {64, 128} x static/weighted, plus
  noreduce ablation for fused, plus bf16xB32 at the best shape.

Run on the real chip: python benchmarks/exp_spmm_v4.py
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
    print(f"table K={k} n_pad={g.n_pad}", flush=True)

    def run_one(b, dt, tr, sched, mode, ablate=""):
        w_width = b * f
        isz = jnp.dtype(dt).itemsize
        feats = jnp.asarray(
            rng.standard_normal((g.n_pad, w_width), dtype=np.float32)
        ).astype(dt)
        bytes_min = ((e + n) * w_width * isz + n * w_width * 4) / 1e9
        plan = build_compact_plan(nbr, valid, tr)
        if mode == "static":
            w2 = jnp.asarray(_static_weights(valid, tr))

            def op(wdummy, feats, w2):
                return spmm_ell_pallas(
                    plan.src, plan.dst, plan.cnt, w2 + wdummy, feats,
                    k=k, tr=tr, b=b, n=g.n_pad, interpret=False,
                    sched=sched, ablate=ablate,
                )

            t = marginal_time(op, jnp.zeros((), jnp.float32), feats, w2)
        else:
            wslot = jnp.asarray(
                (valid[:, :, None]
                 * rng.standard_normal((g.n_pad, k, b))).astype(np.float32)
            )

            def op(wdummy, feats, wslot):
                return spmm_ell_pallas(
                    plan.src, plan.dst, plan.cnt, wslot + wdummy, feats,
                    k=k, tr=tr, b=b, interpret=False,
                    sched=sched, ablate=ablate,
                )

            t = marginal_time(op, jnp.zeros((), jnp.float32), feats, wslot)
        name = "bf16" if dt == jnp.bfloat16 else "f32 "
        tag = f"{ablate or 'full':9s}"
        print(
            f"{sched:5s} {mode:8s} {tag} B={b:3d} {name} TR={tr:3d}: "
            f"{t*1e3:8.2f} ms  {bytes_min/t:5.0f} GB/s eff",
            flush=True,
        )
        return t

    assert jax.default_backend() == "tpu"
    # headline static path
    run_one(16, jnp.float32, 64, "v3", "static")
    run_one(16, jnp.float32, 64, "fused", "static")
    run_one(16, jnp.float32, 64, "fused", "static", ablate="noreduce")
    run_one(16, jnp.float32, 128, "fused", "static")
    run_one(16, jnp.float32, 128, "fused", "static", ablate="noreduce")
    run_one(16, jnp.float32, 256, "fused", "static")
    # weighted path
    run_one(16, jnp.float32, 64, "v3", "weighted")
    run_one(16, jnp.float32, 64, "fused", "weighted")
    run_one(16, jnp.float32, 128, "fused", "weighted")
    # wider rows / bf16
    run_one(32, jnp.float32, 64, "fused", "static")
    run_one(32, jnp.bfloat16, 128, "fused", "static")


if __name__ == "__main__":
    main()
