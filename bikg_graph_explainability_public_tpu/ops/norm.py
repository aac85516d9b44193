"""GCN symmetric normalisation with mask-aware self-loop handling.

Reproduces PyG ``gcn_norm`` semantics exactly (required for checkpoint parity
with ``/root/reference/test_data/gcn_homo_1hop_lungCancer.pth.tar``):

* data self-loop edges are *replaced* by one unit-weight self-loop per node
  (PyG ``add_remaining_self_loops`` with ``fill_value=1``),
* degree is the weighted in-degree over A+I,
* ``norm_e = deg(src)^-1/2 * w_e * deg(dst)^-1/2``.

Instead of materialising the self-loop edges (dynamic edge count), the
self-loop contribution is computed in closed form: each node receives its own
transformed features scaled by ``1/deg``.  A perturbed edge simply has
``w_e = 0`` and drops out of both the degree and the message sum — the
TPU-native equivalent of the reference's edge-list filtering
(``/root/reference/src/pathway_explanations/data.py:453-498``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gcn_norm_weights(
    senders: jax.Array,
    receivers: jax.Array,
    edge_weight: jax.Array,
    num_nodes: int,
    *,
    improved: bool = False,
    add_self_loops: bool = True,
    self_loop_mask: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Return ``(norm_e, self_w)``.

    norm_e:  [E] per-edge coefficient (0 for masked or data-self-loop edges)
    self_w:  [N] per-node self-loop coefficient (deg^-1), or zeros when
             ``add_self_loops=False``.
    self_loop_mask: optional [N] bool restricting which nodes receive a
             self-loop (HeteroConv dispatch: only the relation's target type).
    """
    fill = 2.0 if improved else 1.0
    not_loop = (senders != receivers).astype(edge_weight.dtype)
    w = edge_weight * (not_loop if add_self_loops else 1.0)

    deg = jax.ops.segment_sum(w, receivers, num_segments=num_nodes)
    if add_self_loops:
        if self_loop_mask is not None:
            loop_fill = fill * self_loop_mask.astype(w.dtype)
        else:
            loop_fill = jnp.full((num_nodes,), fill, w.dtype)
        deg = deg + loop_fill
    deg_inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-30)), 0.0)

    norm_e = deg_inv_sqrt[senders] * w * deg_inv_sqrt[receivers]
    if add_self_loops:
        self_w = loop_fill * deg_inv_sqrt * deg_inv_sqrt
    else:
        self_w = jnp.zeros((num_nodes,), edge_weight.dtype)
    return norm_e, self_w
