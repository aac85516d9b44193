import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax
import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.explain.batch import _stack_subgraphs

n, e, q = 20_000, 160_000, 16
rng = np.random.default_rng(5)
feat = rng.normal(size=(n, 84)).astype(np.float32)
ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int64)
g = px.from_arrays(feat, ei, pad_mode="exact")
mdef = px.GCNNodeModel(84, conv_channels=(128,), fc_channels=(128, 64))
params = mdef.init(jax.random.PRNGKey(0))
model = px.Model(mdef, params)
cfg = {"seed": 1, "interpret_samples": 20, "epochs": 50, "lr": 0.01, "l1_lambda": 1e-4}
queries = list(rng.integers(0, n, q))

t0 = time.perf_counter(); out = _stack_subgraphs(g, queries, 2); t_stack = time.perf_counter()-t0
print(f"_stack_subgraphs: {t_stack*1e3:.1f} ms  (bucket N={out[0].shape[1]})")

px.explain_many(model, g, queries, cfg)
t0 = time.perf_counter(); px.explain_many(model, g, queries, cfg); dt = time.perf_counter()-t0
print(f"explain_many total: {dt*1e3:.1f} ms -> {q/dt:.1f} expl/s")

import cProfile, pstats, io
pr = cProfile.Profile()
pr.enable()
px.explain_many(model, g, queries, cfg)
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(22)
print(s.getvalue()[:3500])
