"""Toy example — the TPU-native equivalent of the reference's
``examples/toy_example-caseA.ipynb``: a 5-node star graph, two communities,
a small GCN trained in JAX, and a community-aware explanation of node "1".

Run:  python examples/toy_example.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bikg_graph_explainability_public_tpu as px  # noqa: E402

# ---------------------------------------------------------------------------
# 1. A tiny star graph: node 1 is the hub, nodes 0,2,3,4 point at it.
# ---------------------------------------------------------------------------
rng = np.random.default_rng(0)
n, f = 5, 8
feat = rng.normal(size=(n, f)).astype(np.float32)
edge_index = np.array(
    [[0, 2, 3, 4, 1, 1, 1, 1],
     [1, 1, 1, 1, 0, 2, 3, 4]]
)
names = [str(i) for i in range(n)]
# two communities: {0} and {2,3,4} (reference caseA layout)
pathways = [["0"], ["2", "3", "4"]]
pathway_names = ["solo", "trio"]

# ---------------------------------------------------------------------------
# 2. Train a small GCN node classifier in JAX (binary labels).
# ---------------------------------------------------------------------------
model_def = px.GCNNodeModel(f, conv_channels=(8,), fc_channels=(8, 8))
params = model_def.init(jax.random.PRNGKey(0))
labels = jnp.asarray([1.0, 0.0, 1.0, 0.0, 1.0])

g = px.from_arrays(feat, edge_index)
ew = g.edge_mask.astype(jnp.float32)


def loss_fn(p):
    out = model_def.apply(p, g.x, g.senders, g.receivers, ew)[: n, 0]
    return -jnp.mean(
        labels * jnp.log(out + 1e-7) + (1 - labels) * jnp.log(1 - out + 1e-7)
    )


@jax.jit
def step(p):
    l, grads = jax.value_and_grad(loss_fn)(p)
    return l, jax.tree_util.tree_map(lambda a, ga: a - 0.1 * ga, p, grads)


for i in range(500):
    l, params = step(params)
print(f"final training loss: {float(l):.4f}")

# ---------------------------------------------------------------------------
# 3. Explain the hub node's prediction.
# ---------------------------------------------------------------------------
config = {"seed": 1, "interpret_samples": 20, "epochs": 50,
          "lr": 0.01, "l1_lambda": 1e-4}
explainer = px.Explainer(
    feat, edge_index, px.Model(model_def, params), config, names,
    pathways=pathways, pathway_names=pathway_names,
)
node_df, pathway_df = explainer.run("1", times=10)

print("\nPer-node configuration values (mean over 10 repeats):")
print(node_df)
print("\nCommunity scores:")
print(pathway_df)
