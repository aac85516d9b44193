"""Perturbation-mask sampling (Configuration Values / KernelSHAP).

Reference: ``src/pathway_explanations/masks.py`` (L4).  Sampling semantics are
reproduced — per-community internal random bits, antithetic external
community coalitions, dead-mask reactivation, the >4000-element budget cap,
and the Shapley fallback — but as counter-based ``jax.random`` draws with
fully static shapes (every per-pathway row count is a Python int derived from
community lengths), so the whole sampler jits and can be folded into the
repeat axis.

Reference bug fixed by design (SURVEY §7.3): ``masks.py:294`` reads
``self.edge_size`` which never exists, so every edge-problem mask generation
raises ``AttributeError``; here edge problems use the edge count.

Deviation (documented): the reference feeds all sampled rows to a DataLoader
whose last batch may be ragged (``masks.py:196-229``); here rows are trimmed
to ``epochs`` equal batches after shuffling so training is a single
``lax.scan`` over a [epochs, batch, S] tensor.  The dropped remainder is
< ``epochs`` i.i.d. rows out of >=1000.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pathways import segment_table


class MaskPlan(NamedTuple):
    """Static (host-side) sampling plan for one pathway."""

    pathway_index: int  # index into the original (unsorted) pathway list
    columns: np.ndarray  # sorted element indices of this pathway
    size: int  # rows sampled for this pathway
    size_internal: int  # leading rows that carry only internal bits


def build_plans(
    pathway_inds: Sequence[Sequence[int]], total: int
) -> List[MaskPlan]:
    """Row-budget plan per pathway (reference ``masks.py:313-348``):
    pathways sorted by length descending; ``size = ceil(frac * total)``;
    ``size_internal = ceil(frac * size)`` with the <3 → (1, 2) clamp."""
    lens = np.array([len(p) for p in pathway_inds], np.int64)
    total_len = int(lens.sum())
    order = np.argsort(-lens, kind="stable")
    plans: List[MaskPlan] = []
    for orig_idx in order:
        pathway = sorted(int(v) for v in pathway_inds[orig_idx])
        fraction = len(pathway) / total_len
        size = math.ceil(fraction * total)
        size_internal = math.ceil(fraction * size)
        if size_internal < 3:
            size_internal, size = 1, 2
        plans.append(
            MaskPlan(
                pathway_index=int(orig_idx),
                columns=np.asarray(pathway, np.int32),
                size=size,
                size_internal=size_internal,
            )
        )
    return plans


def _antithetic_pathway_mask(
    key: jax.Array, rows_ext: int, num_pathways: int, ind_pathway: int
) -> jax.Array:
    """Antithetic community coalition mask (reference ``pathways.py:234-283``):
    half random, half inverted, +1 extra random row when odd; the internal
    pathway's column forced False."""
    half = rows_ext // 2
    k1, k2 = jax.random.split(key)
    pm_half = jax.random.bernoulli(k1, 0.5, (half, num_pathways))
    pm = jnp.concatenate([pm_half, ~pm_half], axis=0)
    if rows_ext % 2 != 0:
        extra = jax.random.bernoulli(k2, 0.5, (1, num_pathways))
        pm = jnp.concatenate([pm, extra], axis=0)
    return pm.at[:, ind_pathway].set(False)


def _activate_dead_mask(
    key: jax.Array, pm: jax.Array, ind_pathway: int
) -> jax.Array:
    """If the whole external mask is False, flip one random community per row
    (reference ``pathways.py:285-334``)."""
    rows, num_pathways = pm.shape
    if num_pathways <= 1:
        return pm
    perm = jax.random.permutation(key, num_pathways)
    perm = perm[perm != ind_pathway]  # static size: num_pathways - 1
    reps = rows // (num_pathways - 1) + 1
    choice = jnp.tile(perm, reps)[:rows]
    fixed = pm.at[jnp.arange(rows), choice].set(True)
    # jnp.where, NOT lax.cond: this runs eagerly on the host CPU and an
    # eager cond re-traces both branches every call (measured 59 ms/call —
    # 72% of community-mode sampling time)
    return jnp.where(pm.sum() == 0, fixed, pm)


def sample_community_mask(
    key: jax.Array,
    pathway_inds: Sequence[Sequence[int]],
    num_elements: int,
    width: int,
    total: int,
) -> Tuple[jax.Array, jax.Array]:
    """Full Configuration-Value mask.

    Returns (mask [M, width] bool, pathway_rows [M] int32) where M = sum of
    per-pathway row budgets and ``pathway_rows[r]`` is the original index of
    the pathway whose internal bits occupy row r (reference
    ``masks.py:340-360``).  The >4000-element early break is honoured.
    """
    plans = build_plans(pathway_inds, total)
    elements, seg_ids, _ = segment_table(
        [p.tolist() if isinstance(p, np.ndarray) else p for p in pathway_inds]
    )
    elements_j = jnp.asarray(elements)
    seg_ids_j = jnp.asarray(seg_ids)
    num_pathways = len(pathway_inds)

    blocks, row_tags, row_sizes = [], [], []
    cumulative = 0
    for enum, plan in enumerate(plans):
        key, k_int, k_ext, k_dead = jax.random.split(key, 4)
        internal = jax.random.bernoulli(k_int, 0.5, (plan.size, plan.columns.shape[0]))

        rows_ext = plan.size - plan.size_internal
        mask = jnp.zeros((plan.size, width), bool)
        if rows_ext > 0 and num_pathways > 1:
            pm = _antithetic_pathway_mask(k_ext, rows_ext, num_pathways, enum)
            pm = _activate_dead_mask(k_dead, pm, enum)
            element_mask = pm[:, seg_ids_j]  # [rows_ext, L_total]
            ext = jnp.zeros((rows_ext, width), jnp.int32)
            ext = ext.at[:, elements_j].max(element_mask.astype(jnp.int32))
            mask = mask.at[plan.size_internal :, :].set(ext.astype(bool))
        mask = mask.at[:, jnp.asarray(plan.columns)].set(internal)
        blocks.append(mask)
        row_tags.append(np.full((plan.size,), plan.pathway_index, np.int32))
        row_sizes.append(np.full((plan.size,), plan.columns.shape[0], np.int32))

        # memory cap: biggest pathways only.  The check deliberately runs
        # BEFORE the just-appended block is counted — exactly the reference's
        # order (masks.py:343-348: `if cumulative_size > ...: break` precedes
        # `cumulative_size += mask.shape[0]`), so the break fires on the same
        # pathway as the oracle (asserted in tests/test_masks.py).
        if cumulative > total and num_elements > 4000:
            break
        cumulative += plan.size

    full = jnp.concatenate(blocks, axis=0)
    tags = jnp.asarray(np.concatenate(row_tags))
    sizes = np.concatenate(row_sizes)

    if num_elements > 4000 and full.shape[0] > total:
        # biggest-communities-first subsample (masks.py:367-380)
        order = np.argsort(-sizes, kind="stable")[:total]
        full = full[jnp.asarray(order)]
        tags = tags[jnp.asarray(order)]
    return full, tags


def sample_shapley_mask(
    key: jax.Array, num_elements: int, width: int, total: int
) -> jax.Array:
    """Fully random mask for Shapley-value mode (reference
    ``masks.py:231-260``); padding columns beyond ``num_elements`` stay
    False."""
    bits = jax.random.bernoulli(key, 0.5, (total, width))
    col_valid = jnp.arange(width) < num_elements
    return bits & col_valid[None, :]


class MaskSampler:
    """Mask generation front-end (reference ``Mask`` class, ``masks.py:10``).

    Params
    ------
    num_elements : actual number of elements to explain (sub-graph nodes or
        edges)
    width : static padded mask width (>= num_elements)
    params : hyperparameter dict with ``interpret_samples`` and ``epochs``
        (reference ``config/configs.json``)
    pathway_inds : communities as element-index lists, or None for Shapley
        mode
    """

    def __init__(
        self,
        num_elements: int,
        width: int,
        params: dict,
        pathway_inds: Optional[Sequence[Sequence[int]]] = None,
    ):
        n_perturbs = params["interpret_samples"]
        epochs = params["epochs"]
        if not isinstance(n_perturbs, (int, float)) or isinstance(n_perturbs, bool):
            raise TypeError("interpret_samples is not numeric")
        if not isinstance(epochs, (int, float)) or isinstance(epochs, bool):
            raise TypeError("epochs is not numeric")
        n_perturbs = abs(n_perturbs)
        epochs = abs(epochs)
        self.num_elements = int(num_elements)
        self.width = int(width)
        self.n_perturbs = int(n_perturbs)
        self.epochs = int(epochs)
        self.total = self.n_perturbs * self.epochs
        self.pathway_inds = pathway_inds

    def sample(self, key: jax.Array) -> Tuple[jax.Array, Optional[jax.Array], int]:
        """Returns (mask [M_used, width], pathway_rows or None, batch_size)
        with rows shuffled and trimmed to ``epochs`` equal batches.

        Runs pinned to the host CPU device: community sampling is a Python
        loop of small per-pathway draws, and on a remote-TPU backend each
        tiny dispatch costs ~26 ms of tunnel latency (measured: 16-query
        community-mode explain_many spent minutes in sampling alone).  The
        draws are identical on any backend (counter-based threefry), and the
        result ships to the compute device with the mask batch.
        """
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            return self._sample(jax.device_put(key, cpu))

    def _sample(self, key: jax.Array):
        k_mask, k_perm = jax.random.split(key)
        if self.pathway_inds is not None:
            mask, tags = sample_community_mask(
                k_mask, self.pathway_inds, self.num_elements, self.width, self.total
            )
        else:
            mask = sample_shapley_mask(k_mask, self.num_elements, self.width, self.total)
            tags = None

        m_total = mask.shape[0]
        perm = jax.random.permutation(k_perm, m_total)
        mask = mask[perm]
        if tags is not None:
            tags = tags[perm]

        batch_size = max(m_total // self.epochs, 1)
        m_used = batch_size * min(self.epochs, m_total)
        mask = mask[:m_used]
        if tags is not None:
            tags = tags[:m_used]
        return mask, tags, batch_size
