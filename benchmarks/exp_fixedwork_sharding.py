"""Attribute the fixed-work sharding overhead (VERDICT r3 weak item 4).

``sharding_overhead_8dev`` compares explain_many throughput on the same 128
queries under a 1-device vs an 8-device virtual CPU mesh (2 physical host
cores).  This experiment separates the candidate costs:

* ``compute``   — the sharded jitted program itself: jit(vmap(f)) over
  [128, ...] inputs placed on 1 vs 8 devices, f = a scan of matmuls shaped
  like surrogate training (pure XLA, no host work).
* ``device_put`` — splitting the host-side input stack into 8 per-device
  buffers vs one.
* ``end-to-end`` — explain_many itself (host sampling + put + compute +
  fetch), mesh=None / 1 / 8.

Run CPU-only: ``JAX_PLATFORMS=cpu python benchmarks/exp_fixedwork_sharding.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def best_of(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def compute_only(q=128, n=256, f=32, steps=10):
    """Sharded-vs-single pure-compute ratio for a training-shaped program."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bikg_graph_explainability_public_tpu.parallel.mesh import make_mesh

    x = np.random.default_rng(0).normal(size=(q, n, f)).astype(np.float32)

    def one(xi):
        def step(c, _):
            c = jnp.tanh(xi @ (xi.T @ c))
            return c, c.sum()
        c0 = jnp.ones((n, f), np.float32)
        _, ys = jax.lax.scan(step, c0, None, length=steps)
        return ys

    fn = jax.jit(jax.vmap(one))
    out = {}
    for nd in (1, 8):
        mesh = make_mesh(nd)
        xs = jax.device_put(
            x, NamedSharding(mesh, P(mesh.axis_names[0], None, None))
        )
        jax.block_until_ready(fn(xs))
        out[nd] = best_of(lambda: jax.block_until_ready(fn(xs)))
    print(f"compute-only: mesh1 {out[1]*1e3:.1f} ms  mesh8 {out[8]*1e3:.1f} ms"
          f"  ratio mesh8/mesh1 = {out[1]/out[8]:.3f}x speed")
    return out


def put_only(q=128, n=256, f=32):
    """device_put cost: one buffer vs 8 split buffers."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bikg_graph_explainability_public_tpu.parallel.mesh import make_mesh

    x = np.random.default_rng(0).normal(size=(q, n, f)).astype(np.float32)
    for nd in (1, 8):
        mesh = make_mesh(nd)
        s = NamedSharding(mesh, P(mesh.axis_names[0], None, None))
        jax.block_until_ready(jax.device_put(x, s))
        dt = best_of(lambda: jax.block_until_ready(jax.device_put(x, s)))
        print(f"device_put {x.nbytes/1e6:.1f} MB -> {nd} dev: {dt*1e3:.2f} ms")


def end_to_end():
    import bikg_graph_explainability_public_tpu as px
    from bikg_graph_explainability_public_tpu.parallel.mesh import make_mesh

    n, e = 2000, 12000
    rng = np.random.default_rng(11)
    feat = rng.normal(size=(n, 16)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int64)
    g = px.from_arrays(feat, ei, pad_mode="exact")
    mdef = px.GCNNodeModel(16, conv_channels=(32,), fc_channels=(32, 16))
    model = px.Model(mdef, mdef.init(jax.random.PRNGKey(0)))
    cfg = {"seed": 1, "interpret_samples": 10, "epochs": 10, "lr": 0.01,
           "l1_lambda": 1e-4}
    fixed_q = list(rng.integers(0, n, 128))

    def eps(mesh):
        px.explain_many(model, g, fixed_q, cfg, mesh=mesh)
        return len(fixed_q) / best_of(
            lambda: px.explain_many(model, g, fixed_q, cfg, mesh=mesh), reps=3
        )

    e_none, e1, e8 = eps(None), eps(make_mesh(1)), eps(make_mesh(8))
    print(f"end-to-end eps: none {e_none:.1f}  mesh1 {e1:.1f}  mesh8 {e8:.1f}"
          f"  mesh8/mesh1 = {e8/e1:.3f}")


if __name__ == "__main__":
    import multiprocessing
    print("host cpus:", multiprocessing.cpu_count(),
          " devices:", len(jax.devices()))
    compute_only()
    put_only()
    end_to_end()
