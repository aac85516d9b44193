"""TR sweep for the MXU static-reduce mode: the block-diagonal matmul does
TR-fold redundant FLOPs, so smaller row blocks cut MXU work linearly while
DMA issue stays constant.  Usage: python benchmarks/exp_spmm_v3.py"""

import sys

sys.path.insert(0, "benchmarks")
sys.path.insert(0, ".")

import numpy as np
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
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int64)
    g = from_arrays(feat, ei, pad_mode="exact")
    table = build_neighbor_table(g)
    nbr = np.asarray(table.nbr)
    valid = np.asarray(table.valid)
    k = table.k
    print(f"table K={k}", flush=True)

    for b, dt in ((16, jnp.float32), (16, jnp.bfloat16), (32, jnp.bfloat16)):
        w_width = b * f
        isz = jnp.dtype(dt).itemsize
        feats = jnp.asarray(
            rng.standard_normal((g.n_pad, w_width), dtype=np.float32)
        ).astype(dt)
        bytes_min = ((e + n) * w_width * isz + n * w_width * 4) / 1e9
        for tr in (8, 16, 32):
            plan = build_compact_plan(nbr, valid, tr)
            w2 = jnp.asarray(_static_weights(valid, tr))

            def op(wdummy, feats, w2):
                return spmm_ell_pallas(
                    plan.src, plan.dst, plan.cnt, w2 + wdummy, feats,
                    k=k, tr=tr, b=b, n=g.n_pad, interpret=False,
                )

            t = marginal_time(op, jnp.zeros((), jnp.float32), feats, w2)
            name = "bf16" if dt == jnp.bfloat16 else "f32 "
            print(
                f"static B={b:3d} {name} TR={tr:3d}: {t*1e3:8.2f} ms "
                f"({bytes_min/t:5.0f} GB/s eff)",
                flush=True,
            )


if __name__ == "__main__":
    main()
