"""Weighted linear regression surrogate (the explanation engine).

Reference: ``src/pathway_explanations/wlm.py`` (L5).  The torch version runs a
Python loop of {perturb graph → black-box forward → kernel → Adam step} per
mask batch (``wlm.py:210-259``).  Here the phases are decoupled and compiled:

1. **all** perturbed black-box outputs are computed up front by the vmapped
   masked forward (:meth:`..models.adapter.Model.perturbed_query_outputs`) —
   the same total forward work, but batched onto the MXU instead of a
   block-diagonal mega-graph;
2. the KernelSHAP weights for every row come from one log-space kernel call;
3. surrogate training is a single ``lax.scan`` over [epochs, batch, S]
   tensors — zero host↔device traffic inside the loop.

Numerics match the reference: loss = ``mean(k*(pred-y)^2)/k.sum() +
l1*mean(|w|)`` (``wlm.py:491-520``, ``101-129``), Adam(lr,
weight_decay=1e-2) with torch update order (``wlm.py:477-478``), and the
surrogate is a single bias-free linear map (``wlm.py:17-61``).

Reference bug fixed by design (SURVEY §7.3): ``wlm.py:94`` snapshots a lazy
``parameters()`` generator as "best parameters", so best-loss selection
silently returns final-epoch weights.  Here the best-loss weights are
genuinely materialised in the scan carry.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .kernels import shap_kernel


class TrainResult(NamedTuple):
    """Surrogate training output: weights, per-epoch losses, best epoch."""
    weights: jax.Array  # [S] best-loss surrogate coefficients
    losses: jax.Array  # [epochs]
    best_epoch: jax.Array  # scalar int32


def init_surrogate_weights(key: jax.Array, width: int, num_valid: int) -> jax.Array:
    """torch ``nn.Linear(num_elements, 1, bias=False)`` init: U(-1/sqrt(n),
    1/sqrt(n)) (``wlm.py:45``); padding columns start (and stay) at zero."""
    limit = math.sqrt(1.0 / max(num_valid, 1))
    w = jax.random.uniform(key, (width,), jnp.float32, -limit, limit)
    col_valid = (jnp.arange(width) < num_valid).astype(jnp.float32)
    return w * col_valid


@partial(jax.jit, static_argnames=("num_valid", "lr", "l1_lambda", "weight_decay"))
def train_surrogate(
    w0: jax.Array,
    masks: jax.Array,  # [epochs, batch, S] float32
    outputs: jax.Array,  # [epochs, batch]
    kernels: jax.Array,  # [epochs, batch]
    num_valid: int,
    lr: float = 0.01,
    l1_lambda: float = 1e-4,
    weight_decay: float = 1e-2,
) -> TrainResult:
    """Train the weighted linear surrogate with scan-compiled Adam;
    returns TrainResult (reference wlm.py:132)."""
    width = w0.shape[0]
    col_valid = (jnp.arange(width) < num_valid).astype(jnp.float32)

    def loss_fn(w, mask_b, y_b, k_b):
        pred = mask_b @ w  # [batch]
        diff = (pred - y_b) ** 2
        wmse = jnp.mean(k_b * diff) / jnp.maximum(k_b.sum(), 1e-30)
        l1 = l1_lambda * jnp.sum(jnp.abs(w) * col_valid) / num_valid
        return wmse + l1

    def step(carry, batch):
        w, m, v, t, best_w, best_loss = carry
        mask_b, y_b, k_b = batch
        loss, g = jax.value_and_grad(loss_fn)(w, mask_b, y_b, k_b)
        g = (g + weight_decay * w) * col_valid  # torch Adam weight_decay
        t = t + 1
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mhat = m / (1.0 - 0.9**t)
        vhat = v / (1.0 - 0.999**t)
        w = w - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
        improved = loss < best_loss
        best_w = jnp.where(improved, w, best_w)
        best_loss = jnp.where(improved, loss, best_loss)
        return (w, m, v, t, best_w, best_loss), (loss, improved)

    carry0 = (
        w0,
        jnp.zeros_like(w0),
        jnp.zeros_like(w0),
        jnp.float32(0.0),
        w0,
        jnp.float32(jnp.inf),
    )
    (w, _, _, _, best_w, _), (losses, improved) = jax.lax.scan(
        step, carry0, (masks, outputs, kernels)
    )
    epochs = masks.shape[0]
    idx = jnp.arange(epochs)
    best_epoch = jnp.max(jnp.where(improved, idx, -1))
    return TrainResult(weights=best_w, losses=losses, best_epoch=best_epoch)


def _default_chunk(epochs: int, batch_size: int) -> int:
    """Largest whole-epoch multiple of ``batch_size`` that stays <= 512
    rows per compiled forward chunk."""
    c = 1
    for cand in range(epochs, 0, -1):
        if epochs % cand == 0 and cand * batch_size <= 512:
            c = cand
            break
    return c * batch_size


def train_model_repeats(
    masks: jax.Array,
    model,
    graph,
    params: dict,
    problem: str,
    query: Optional[int],
    num_elements: int,
    batch_size: int,
    keys: jax.Array,
    chunk_size: Optional[int] = None,
) -> TrainResult:
    """All ``times`` repeats of the surrogate fit in O(1) device dispatches.

    masks: [T, M, S] bool — repeat i's sampled mask rows; keys: [T, 2, 2]
    uint32 key data (mask key unused here — masks are pre-sampled — init key
    at [:, 1]).  The black-box forwards run as ONE chunked call over the
    [T*M, S] row stack (rows are independent, so outputs match the
    per-repeat calls), the KernelSHAP normalisation stays per-repeat via
    vmap (its log-space max is taken within each repeat's rows, as the
    sequential loop did), and Adam training vmaps over the repeat axis.
    Returns a TrainResult with leading repeat dims: weights [T, S], losses
    [T, epochs], best_epoch [T].

    Replaces the reference's per-repeat Python loop
    (``explainer.py:490-516``) which pays one dispatch chain per repeat —
    ~10 tunnel round trips for ``times=10`` on a remote TPU.
    """
    t, m_used, width = masks.shape
    epochs = m_used // batch_size
    auto_chunk = chunk_size is None
    if chunk_size is None:
        chunk_size = _default_chunk(epochs, batch_size)

    flat = masks.reshape(t * m_used, width)
    outputs = model.perturbed_query_outputs(
        graph, flat, problem, query, chunk_size=chunk_size,
        auto_chunk=auto_chunk,
    ).reshape(t, m_used)
    kernels = jax.vmap(
        lambda mk: shap_kernel(mk, num_valid_columns=num_elements)
    )(jnp.asarray(masks))
    w0 = jax.vmap(
        lambda kd: init_surrogate_weights(
            jax.random.wrap_key_data(kd), width, num_elements
        )
    )(jnp.asarray(keys)[:, 1])

    maskf = jnp.asarray(masks, jnp.float32).reshape(
        t, epochs, batch_size, width
    )
    outputs = outputs.reshape(t, epochs, batch_size)
    kernels = kernels.reshape(t, epochs, batch_size)
    train = partial(
        train_surrogate,
        num_valid=num_elements,
        lr=float(abs(params.get("lr", 0.01))),
        l1_lambda=float(params.get("l1_lambda", 1e-4)),
        weight_decay=float(params.get("weight_decay", 1e-2)),
    )
    return jax.vmap(train)(w0, maskf, outputs, kernels)


def train_model(
    mask: jax.Array,
    model,
    graph,
    params: dict,
    problem: str,
    query: Optional[int],
    num_elements: int,
    batch_size: int,
    key: jax.Array,
    chunk_size: Optional[int] = None,
) -> TrainResult:
    """End-to-end surrogate fit for one repeat (reference ``train_model``,
    ``wlm.py:132-278``).

    mask: [M, S] bool with M divisible by ``batch_size``; ``model`` is a
    :class:`..models.adapter.Model`; ``graph`` the padded computational
    subgraph.
    """
    m_used, width = mask.shape
    epochs = m_used // batch_size

    auto_chunk = chunk_size is None
    if chunk_size is None:
        c = 1
        for cand in range(epochs, 0, -1):
            if epochs % cand == 0 and cand * batch_size <= 512:
                c = cand
                break
        chunk_size = c * batch_size

    outputs = model.perturbed_query_outputs(
        graph, mask, problem, query, chunk_size=chunk_size,
        auto_chunk=auto_chunk,
    )  # [M]
    kernels = shap_kernel(mask, num_valid_columns=num_elements)  # [M]

    maskf = mask.astype(jnp.float32).reshape(epochs, batch_size, width)
    outputs = outputs.reshape(epochs, batch_size)
    kernels = kernels.reshape(epochs, batch_size)

    w0 = init_surrogate_weights(key, width, num_elements)
    return train_surrogate(
        w0,
        maskf,
        outputs,
        kernels,
        num_valid=num_elements,
        lr=float(abs(params.get("lr", 0.01))),
        l1_lambda=float(params.get("l1_lambda", 1e-4)),
        weight_decay=float(params.get("weight_decay", 1e-2)),
    )
