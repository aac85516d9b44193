"""Sweep the reworked blocked-ELL kernel (MXU block-diag reduce + cross-block
double buffering) over batch-chunk width and row dtype on the 100k/1M random
workload.  Usage: python benchmarks/exp_spmm_v2.py [n e]"""

import sys
import time

sys.path.insert(0, "benchmarks")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from exp_spmm_kernels import marginal_time

from bikg_graph_explainability_public_tpu.graph import from_arrays, host_view
from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table
from bikg_graph_explainability_public_tpu.ops.spmm_pallas import (
    batched_gather_sum,
    gather_sum_static,
    plan_for_table,
)


def main(n=100_000, e=1_000_000, f=128):
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((n, 8), dtype=np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int64)
    g = from_arrays(feat, ei, pad_mode="exact")
    table = build_neighbor_table(g)
    print(f"table K={table.k}", flush=True)

    for b in (8, 16, 32):
        for dt in (jnp.float32, jnp.bfloat16):
            w_width = b * f
            isz = jnp.dtype(dt).itemsize
            plan = plan_for_table(table, w_width, isz)
            feats = jnp.asarray(
                rng.standard_normal((g.n_pad, w_width), dtype=np.float32)
            ).astype(dt)
            bytes_min = ((e + n) * w_width * isz + n * w_width * 4) / 1e9

            def op_static(wdummy, feats):
                return gather_sum_static(table, feats + wdummy, b=b,
                                         interpret=False)

            t = marginal_time(op_static, jnp.zeros((), dt), feats)
            name = "bf16" if dt == jnp.bfloat16 else "f32 "
            print(
                f"static  B={b:3d} {name} TR={plan.tr:3d}: {t*1e3:8.2f} ms "
                f"({bytes_min/t:5.0f} GB/s eff, row {w_width*isz//1024} KB)",
                flush=True,
            )

    # weighted path at the bench shape
    b = 16
    feats = jnp.asarray(
        rng.standard_normal((g.n_pad, b * f), dtype=np.float32)
    )
    w_eb = jnp.asarray(rng.random((g.e_pad, b), dtype=np.float32))

    def op_w(wi, feats):
        return batched_gather_sum(table, wi, feats, b=b, interpret=False)

    t = marginal_time(op_w, w_eb, feats)
    bytes_min = ((e + n) * b * f * 4 + e * b * 4) / 1e9
    print(f"weighted B={b} f32: {t*1e3:8.2f} ms ({bytes_min/t:5.0f} GB/s eff)",
          flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
