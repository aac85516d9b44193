"""v7 degree-clustered kernel on-chip: parity vs the XLA reference and
slope-timed throughput vs v6 at the production 100k/1M random workload.

The v6 reduce reads all TR*K slots (69% ELL padding at K=32 vs mean degree
10); v7 stores slots K-major and reads only ceil(maxdeg/8) plane groups per
block, so with degree-sorted rows most blocks reduce 8 or 16 planes instead
of 32.  Run on the real chip: python benchmarks/exp_spmm_v7.py
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
    deg = valid.sum(1)
    perm = np.argsort(-deg, kind="stable")
    invp = np.argsort(perm)
    nbr_s, valid_s = nbr[perm], valid[perm]
    print(f"table K={k} meandeg={deg.mean():.1f}", flush=True)
    assert jax.default_backend() == "tpu"

    valid_j = jnp.asarray(valid)
    nbr_j = jnp.asarray(nbr)

    for b in (32, 16):
        w_width = b * f
        feats = jnp.asarray(
            rng.standard_normal((g.n_pad, w_width), dtype=np.float32)
        )

        @jax.jit
        def ref(fx):
            def body(i, acc):
                return acc + valid_j[:, i, None] * fx[nbr_j[:, i]]

            return jax.lax.fori_loop(0, k, body, jnp.zeros_like(fx))

        want = np.asarray(ref(feats))

        def run(tr, sched, sort, ablate=""):
            nb_, vd_ = (nbr_s, valid_s) if sort else (nbr, valid)
            mode = "v7" if sched == "v7" else "v3"
            plan = build_compact_plan(nb_, vd_, tr, mode=mode)
            w2 = jnp.asarray(_static_weights(vd_, tr))
            bytes_min = ((e + n) * w_width * 4 + n * w_width * 4) / 1e9
            src_a = jnp.asarray(plan.src)

            def op(wd, fx, src_a):
                bump = jnp.where(wd > 1e30, 1, 0).astype(jnp.int32)
                return spmm_ell_pallas(
                    src_a + bump, plan.dst, plan.cnt, w2, fx,
                    k=k, tr=tr, b=b, n=g.n_pad, interpret=False,
                    sched=sched, ablate=ablate,
                )

            if ablate == "":
                got = np.asarray(
                    jax.jit(op)(jnp.zeros((), jnp.float32), feats, src_a)
                )
                if sort:
                    got = got[invp]
                err = np.abs(got - want).max()
                print(f"  parity vs XLA exact: max err {err:.2e}", flush=True)
            t = marginal_time(op, jnp.zeros((), jnp.float32), feats, src_a)
            print(
                f"{sched:3s} B={b:3d} TR={tr:3d} sort={int(sort)} "
                f"{ablate or 'full':9s}: {t*1e3:8.2f} ms  "
                f"{bytes_min/t:5.0f} GB/s",
                flush=True,
            )

        trmax = 64 if b == 16 else 32
        run(trmax, "v6", False)
        run(trmax, "v7", True)
        run(trmax, "v7", False)
        run(trmax, "v7", True, ablate="noreduce")


if __name__ == "__main__":
    main()
