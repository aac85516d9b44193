"""Halo-exchange communication audit on the virtual mesh.

The >=80%% multi-chip scaling north star cannot be *measured* in this
environment (one real chip; the 8-device CPU mesh is host-core-bound), but
the halo path's communication volume can: this script builds the partition
for 2/4/8 shards of the 100k/1M workload, counts the TRUE boundary rows
(the model: every (owner -> requester) pair ships the unique remote senders
its edge shard reads), reads the padded operand the all_to_all actually
ships (static shapes in HaloPartition), and cross-checks the compiled HLO's
all-to-all operand bytes on the virtual mesh.  The published table
(docs/distributed.md) is the auditable communication budget behind the
scaling claim.

Run anywhere: python benchmarks/exp_halo_comm.py  (forces CPU x8)
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

sys.path.insert(0, "benchmarks")
sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bikg_graph_explainability_public_tpu.parallel.halo import (
    build_halo_partition,
)
from bikg_graph_explainability_public_tpu.utils.padding import round_up


def true_boundary_rows(snd, rcv, n_local, d):
    """Exact per-(owner, requester) unique remote-sender counts."""
    owner_e = rcv // n_local
    total = 0
    per_pair_max = 0
    for dd in range(d):
        s = snd[owner_e == dd]
        s_own = s // n_local
        for o in range(d):
            if o == dd:
                continue
            c = np.unique(s[s_own == o]).size
            total += c
            per_pair_max = max(per_pair_max, c)
    return total, per_pair_max


def hlo_all_to_all_bytes(part, d, f):
    """Compile the exchange on the virtual mesh and read the all-to-all
    operand shape out of the HLO."""
    from bikg_graph_explainability_public_tpu.parallel._shard_map import (
        shard_map,
    )

    mesh = Mesh(np.array(jax.devices()[:d]), ("x",))

    def run(x_loc, send_idx):
        send = x_loc[send_idx[0]]  # [D, halo, F]
        recv = jax.lax.all_to_all(send, "x", split_axis=0, concat_axis=0)
        return recv.reshape(-1, x_loc.shape[-1])

    sm = shard_map(
        run, mesh=mesh,
        in_specs=(P("x"), P("x")),
        out_specs=P("x"),
    )
    x = jnp.zeros((d * part.n_local, f), jnp.float32)
    txt = (
        jax.jit(sm)
        .lower(x, part.send_idx)
        .compile()
        .as_text()
    )
    for line in txt.splitlines():
        if "all-to-all" in line and "f32" in line:
            return line.strip()[:120]
    return "(no all-to-all line found)"


def main(n=100_000, e=1_000_000, f=128, layers=2):
    rng = np.random.default_rng(0)
    snd = rng.integers(0, n, e).astype(np.int64)
    rcv = rng.integers(0, n, e).astype(np.int64)

    print(f"workload: {n} nodes / {e} edges, F={f}, {layers} layers")
    print(
        f"{'D':>2} {'halo(pad)':>9} {'max true':>9} {'model MB/layer':>14} "
        f"{'shipped MB/layer':>16} {'pad factor':>10} {'MB/dev/layer':>12}"
    )
    for d in (2, 4, 8):
        n_local = round_up(max((n + d - 1) // d, 1), 8)
        part = build_halo_partition(snd, rcv, n, d)
        true_total, true_max = true_boundary_rows(snd, rcv, n_local, d)
        model_mb = true_total * f * 4 / 1e6
        shipped_rows = d * d * part.halo  # incl. the d self slices (zeros)
        shipped_mb = shipped_rows * f * 4 / 1e6
        print(
            f"{d:2d} {part.halo:9d} {true_max:9d} {model_mb:14.1f} "
            f"{shipped_mb:16.1f} {shipped_mb / model_mb:10.2f} "
            f"{shipped_mb / d:12.1f}"
        )
        hlo = hlo_all_to_all_bytes(part, d, f)
        print(f"    HLO: {hlo}")

    # context: per-layer compute traffic (batched B=64 activations)
    b = 64
    act_mb = n * f * 4 * b / 1e6
    print(
        f"\nper-layer per-sample activation slab: {n * f * 4 / 1e6:.0f} MB; "
        f"batch B={b}: {act_mb:.0f} MB streamed per layer"
    )


if __name__ == "__main__":
    main()
