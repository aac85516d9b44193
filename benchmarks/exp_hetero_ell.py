"""Hetero ELL-tier phase profile: where does the fullgraph forward spend?

The hetero fullgraph bench (2x50k nodes, 3x333k edges, GCN 128x2) trails
the homo figure at identical node/edge totals (VERDICT r4 weak 6).  This
experiment slope-times ablated sub-programs of
``FastBatchedHeteroGCN.batch_node_outputs_ell`` on the real chip:

  deg      — the fused degree gather + segment-sum + rsqrt only
  layer1   — deg + the three relation layer-1 aggregations
  full     — the whole two-layer forward + head

at the engine's effective chunk, for both layer-1 formulations
(broadcast+SpMM vs shared-gather einsum, toggled via _G0_BUDGET_BYTES).

Run on the real chip: python benchmarks/exp_hetero_ell.py
"""

import sys

sys.path.insert(0, "benchmarks")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import bench
import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.graph import hetero_to_homo
from bikg_graph_explainability_public_tpu.models.fast_hetero import (
    FastBatchedHeteroGCN,
)
from bikg_graph_explainability_public_tpu.models.layers import relu


def make_engine(g0_budget=None):
    rng = np.random.default_rng(11)
    f = 32
    n_per_type, e_per_rel = bench.BIG_N // 2, bench.BIG_E // 3
    feat = {
        "a": rng.normal(size=(n_per_type, f)).astype(np.float32),
        "b": rng.normal(size=(n_per_type, f)).astype(np.float32),
    }
    relations = [("a", "r1", "b"), ("b", "r2", "a"), ("a", "r3", "a")]
    ei = {
        r: np.stack([
            rng.integers(0, n_per_type, e_per_rel),
            rng.integers(0, n_per_type, e_per_rel),
        ]) for r in relations
    }
    g, _ = hetero_to_homo(feat, ei)
    mdef = px.hetero_gcn_for_relations(
        ["a", "b"], relations, in_features=f,
        conv_channels=(bench.HIDDEN, bench.HIDDEN),
        fc_channels=(bench.HIDDEN, 64),
    )
    params = mdef.init(jax.random.PRNGKey(11))
    cls = FastBatchedHeteroGCN
    old = cls._G0_BUDGET_BYTES
    if g0_budget is not None:
        cls._G0_BUDGET_BYTES = g0_budget
    try:
        engine = cls(mdef, params, g)
    finally:
        cls._G0_BUDGET_BYTES = old
    return engine, rng


def phase_fns(engine):
    """(name, fn(masks, ops) -> [B]-reducible) sub-programs of the tier."""
    from bikg_graph_explainability_public_tpu.ops.spmm import (
        gather_sum_batched_separable,
    )
    from bikg_graph_explainability_public_tpu.ops.spmm_pallas import (
        CompactPlan, _pick_tr,
    )

    tables, snds_s, rcvs_s, tables_s = engine._ell_setup()
    itemsize = jnp.dtype(engine.dtype).itemsize

    def degrees(masks, ops):
        return engine.batch_node_outputs_ell(masks, ops, _upto="deg")

    def layer1(masks, ops):
        return engine.batch_node_outputs_ell(masks, ops, _upto="layer1")

    def full(masks, ops):
        h = engine.batch_node_outputs_ell(masks, ops)
        nv = ops["nvalid"]
        out = engine.model_def.head(engine.params, h)
        return (out[..., 0] * nv[:, None]).sum(0) / jnp.maximum(
            nv.sum(), 1.0
        )

    return [("deg", degrees), ("layer1", layer1), ("full", full)]


def slope_time(fn, masks, ops, n1=2, n2=8):
    """Marginal seconds/call with ops as jit arguments."""
    import time

    def scan_n(nn):
        @jax.jit
        def run(masks, ops):
            def body(carry, _):
                dep = (carry[:1] > 1e30)[None, :]
                out = fn(jnp.logical_xor(masks, dep), ops)
                return carry + out, ()

            out, _ = jax.lax.scan(
                body, jnp.zeros((masks.shape[0],), jnp.float32),
                None, length=nn,
            )
            return out

        return run

    def best_of(nn, reps=3):
        f = scan_n(nn)
        np.asarray(f(masks, ops))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(masks, ops))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = best_of(n1), best_of(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    assert jax.default_backend() == "tpu"
    variants = (("broadcast+spmm", 0), ("fused einsum", 8 << 30))
    if "--fused-only" in sys.argv:
        variants = variants[1:]
    for a in sys.argv:
        if a.startswith("--chunk="):
            FastBatchedHeteroGCN._ELL_CHUNK = int(a.split("=")[1])
    for label, budget in variants:
        engine, rng = make_engine(g0_budget=budget)
        b = engine._ell_chunk_eff
        ops = engine._ops()
        masks = jnp.asarray(rng.random((b, engine.graph.n_pad)) > 0.3)
        fused = engine._nbr_all is not None
        print(f"layer1={label}  chunk={b}  fused={'yes' if fused else 'no'}")
        prev = 0.0
        for name, fn in phase_fns(engine):
            dt = slope_time(fn, masks, ops)
            print(
                f"  {name:8s}: {dt*1e3:8.2f} ms/chunk  "
                f"(+{(dt-prev)*1e3:7.2f})  -> {b/dt:8.1f} fwd/s",
                flush=True,
            )
            prev = dt


if __name__ == "__main__":
    main()
