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


def _np_rng(key: jax.Array) -> np.random.Generator:
    """Counter-based numpy generator (Philox) seeded from a jax PRNG key.

    Host-side sampling is a Python loop of small draws; as eager jax ops
    those cost one dispatch each (26 ms over the remote-TPU tunnel, ~0.1 ms
    on CPU — profiled at 72% of community-mode time).  numpy Philox keeps
    the counter-based determinism story at zero dispatch cost; the key is
    pulled to the host once per sample() call.
    """
    words = np.asarray(jax.random.key_data(key)).astype(np.uint64).ravel()
    seed = (int(words[0]) << 32) ^ int(words[-1])
    return np.random.Generator(np.random.Philox(seed))


def _antithetic_pathway_mask(
    rng: np.random.Generator, rows_ext: int, num_pathways: int,
    ind_pathway: int,
) -> np.ndarray:
    """Antithetic community coalition mask (reference ``pathways.py:234-283``):
    half random, half inverted, +1 extra random row when odd; the internal
    pathway's column forced False."""
    half = rows_ext // 2
    pm_half = rng.random((half, num_pathways)) < 0.5
    pm = np.concatenate([pm_half, ~pm_half], axis=0)
    if rows_ext % 2 != 0:
        extra = rng.random((1, num_pathways)) < 0.5
        pm = np.concatenate([pm, extra], axis=0)
    pm[:, ind_pathway] = False
    return pm


def _activate_dead_mask(
    rng: np.random.Generator, pm: np.ndarray, ind_pathway: int
) -> np.ndarray:
    """If the whole external mask is False, flip one random community per row
    (reference ``pathways.py:285-334``)."""
    rows, num_pathways = pm.shape
    if num_pathways <= 1 or pm.sum() != 0:
        return pm
    perm = rng.permutation(num_pathways)
    perm = perm[perm != ind_pathway]
    reps = rows // (num_pathways - 1) + 1
    choice = np.tile(perm, reps)[:rows]
    fixed = pm.copy()
    fixed[np.arange(rows), choice] = True
    return fixed


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
    num_pathways = len(pathway_inds)
    rng = _np_rng(key)

    blocks, row_tags, row_sizes = [], [], []
    cumulative = 0
    for enum, plan in enumerate(plans):
        internal = rng.random((plan.size, plan.columns.shape[0])) < 0.5

        rows_ext = plan.size - plan.size_internal
        mask = np.zeros((plan.size, width), bool)
        if rows_ext > 0 and num_pathways > 1:
            pm = _antithetic_pathway_mask(rng, rows_ext, num_pathways, enum)
            pm = _activate_dead_mask(rng, pm, enum)
            element_mask = pm[:, seg_ids]  # [rows_ext, L_total]
            ext = np.zeros((rows_ext, width), bool)
            # scatter-or: elements may repeat across pathways
            np.logical_or.at(ext, (slice(None), elements), element_mask)
            mask[plan.size_internal :, :] = ext
        mask[:, plan.columns] = internal
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

    full = np.concatenate(blocks, axis=0)
    tags = np.concatenate(row_tags)
    sizes = np.concatenate(row_sizes)

    if num_elements > 4000 and full.shape[0] > total:
        # biggest-communities-first subsample (masks.py:367-380)
        order = np.argsort(-sizes, kind="stable")[:total]
        full = full[order]
        tags = tags[order]
    return full, tags


def sample_shapley_mask(
    key: jax.Array, num_elements: int, width: int, total: int
) -> np.ndarray:
    """Fully random mask for Shapley-value mode (reference
    ``masks.py:231-260``); padding columns beyond ``num_elements`` stay
    False.  Host-side numpy (see :func:`_np_rng`); the jit-internal Shapley
    draw in ``explain/batch.py`` stays ``jax.random``."""
    bits = _np_rng(key).random((total, width)) < 0.5
    bits[:, num_elements:] = False
    return bits


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

    def sample(self, key: jax.Array) -> Tuple[np.ndarray, Optional[np.ndarray], int]:
        """Returns (mask [M_used, width], pathway_rows or None, batch_size)
        with rows shuffled and trimmed to ``epochs`` equal batches.

        Entirely host-side numpy, deterministically derived from ``key``
        (see :func:`_np_rng`): as eager jax ops each tiny per-pathway draw
        cost one dispatch — ~26 ms over the remote-TPU tunnel, ~0.1 ms even
        on local CPU — which dominated community-mode throughput.
        """
        k_mask, k_perm = jax.random.split(
            jax.device_put(key, jax.devices("cpu")[0])
        )
        if self.pathway_inds is not None:
            mask, tags = sample_community_mask(
                k_mask, self.pathway_inds, self.num_elements, self.width, self.total
            )
        else:
            mask = sample_shapley_mask(k_mask, self.num_elements, self.width, self.total)
            tags = None

        m_total = mask.shape[0]
        perm = _np_rng(k_perm).permutation(m_total)
        mask = mask[perm]
        if tags is not None:
            tags = tags[perm]

        batch_size = max(m_total // self.epochs, 1)
        m_used = batch_size * min(self.epochs, m_total)
        mask = mask[:m_used]
        if tags is not None:
            tags = tags[:m_used]
        return mask, tags, batch_size
