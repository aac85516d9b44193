"""Restricted-path roofline decomposition: is mfu_restricted = 0.17 a
schedule deficiency or the speed of light for this arithmetic intensity?

Per masked forward the restricted engine runs (bench.py FLOP model):
  deg   einsum [R0, N] x [N, B]           (contraction over the subgraph)
  agg_i einsum [R_i, R_{i-1}] x [R_{i-1}, B*C]  per layer
  hw_i  matmul [B*R_{i-1}, C] x [C, C]    per layer >= 1
with R = plan rows per hop (128 -> 16 -> 8 at the bench workload).  The
MXU-tile-quantized FLOP count is only 1.14x the nominal model, so shape
padding cannot explain a 0.17 MFU.  This experiment measures achieved
TFLOP/s AND achieved bytes/s under a conservative per-forward HBM traffic
model (mask row + per-sample activations at every layer boundary; shared
plan operands amortized over the chunk), and reports both roofline
fractions at several chunk sizes and widths.

Run on the real chip: python benchmarks/exp_mfu_restricted.py
"""

import sys

sys.path.insert(0, "benchmarks")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import bench
import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.models.fast_gcn import FastBatchedGCN


def traffic_per_forward(engine, query):
    """Conservative per-sample HBM bytes: the mask row, plus each layer's
    per-sample activation slab read and written once (XLA fuses elementwise
    producers into the einsums, so scaled copies are not double-counted);
    chunk-shared operands (a_deg, a_layers, xw0 rows) amortize to ~0."""
    plan = engine.query_plan(query)
    n = engine.graph.n_pad
    by = 4 * n  # mask row read (f32 after cast)
    prev_rows = plan.a_deg.shape[0]
    by += 4 * prev_rows  # deg/s vector write+read (per sample)
    for i, (conv, a_i) in enumerate(
        zip(engine.model_def.convs, plan.a_layers)
    ):
        c = conv.out_features
        if i == 0:
            # xw0 is chunk-shared; per-sample output [rows_1, c]
            by += 4 * a_i.shape[0] * c
        else:
            # read prev activations, write hw, write agg out
            by += 4 * (a_i.shape[1] * conv.in_features
                       + a_i.shape[1] * c + a_i.shape[0] * c)
    return by


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    n, e = bench.SUB_N, bench.SUB_E
    feat = rng.normal(size=(n, bench.N_FEATS)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = px.from_arrays(feat, ei, pad_mode="exact")
    peak = bench.mxu_peak_flops()
    roof = bench.hbm_roofline_gbps() * 1e9

    for hidden in (128, 256):
        mdef = px.GCNNodeModel(
            bench.N_FEATS, conv_channels=(hidden, hidden),
            fc_channels=(hidden, 64),
        )
        params = mdef.init(jax.random.PRNGKey(0))
        engine = FastBatchedGCN(mdef, params, g, restrict=True)
        fl = bench._dense_flops_per_forward(engine, 17, True)
        by = traffic_per_forward(engine, 17)
        ai = fl / by
        for chunk in (125, 250, 500, 1000):
            masks = jnp.asarray(rng.random((1000, g.n_pad)) > 0.3)
            dt = bench._marginal_time(
                lambda m: engine.query_outputs(
                    m, 17, "node_prediction", chunk_size=chunk
                ),
                masks,
            )
            fps = 1000 / dt
            tfs = fps * fl / 1e12
            gbs = fps * by / 1e9
            print(
                f"hidden={hidden:4d} chunk={chunk:5d}: {fps/1e6:6.2f} Mf/s  "
                f"{tfs:6.1f} TF/s (mfu {tfs*1e12/peak:.3f})  "
                f"{gbs:6.0f} GB/s (hbm frac {gbs*1e9/roof:.2f})  "
                f"AI={ai:.0f} fl/B",
                flush=True,
            )
        # roofline verdict for this shape
        bound = min(peak, ai * roof)
        print(
            f"  -> roofline for AI={ai:.0f}: min(MXU {peak/1e12:.0f} TF, "
            f"AI*HBM {ai*roof/1e12:.1f} TF) = {bound/1e12:.1f} TF/s "
            f"=> max achievable MFU {bound/peak:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
