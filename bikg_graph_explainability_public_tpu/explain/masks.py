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
    if isinstance(key, np.random.Generator):
        return key
    words = _key_words(key)
    seed = (int(words[0]) << 32) ^ int(words[-1])
    return np.random.Generator(np.random.Philox(seed))


def _key_words(key) -> np.ndarray:
    """uint64 words of a jax PRNG key — or of pre-pulled key data (a numpy
    array), so batch callers can fold many keys in ONE device dispatch and
    hand the host-side rows out (each eager ``fold_in`` costs ~26 ms over a
    remote-TPU tunnel)."""
    if isinstance(key, np.ndarray):
        return key.astype(np.uint64).ravel()
    return np.asarray(jax.random.key_data(key)).astype(np.uint64).ravel()


def _philox_streams(key: jax.Array, n: int) -> List[np.random.Generator]:
    """``n`` independent host-side Philox streams from one jax PRNG key.

    Derivation touches no jax op beyond ``key_data`` (a host pull), so it
    works under any ``JAX_PLATFORMS`` restriction — ``jax.devices("cpu")``
    raises when platforms are limited to TPU-only (ADVICE r2) — and costs
    zero device dispatches.  ``key`` may also be pre-pulled key data (numpy).
    """
    words = _key_words(key)
    k0, k1 = int(words[0]), int(words[-1])
    golden = 0x9E3779B97F4A7C15
    return [
        np.random.Generator(
            np.random.Philox(
                key=np.array(
                    [k0, (k1 ^ (golden * (i + 1))) & 0xFFFFFFFFFFFFFFFF],
                    dtype=np.uint64,
                )
            )
        )
        for i in range(n)
    ]


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
) -> Tuple[np.ndarray, np.ndarray]:
    """Full Configuration-Value mask — vectorized across pathways.

    Returns (mask [M, width] bool, pathway_rows [M] int32) where M = sum of
    per-pathway row budgets and ``pathway_rows[r]`` is the original index of
    the pathway whose internal bits occupy row r (reference
    ``masks.py:340-360``).  The >4000-element early break is honoured.

    The reference builds this block-by-block in a Python loop with per-block
    draws (``masks.py:322-348``); profiled at ~70% of community-mode time
    here.  This implementation draws two uniform tensors covering ALL rows at
    once — external coalition bits at full ``[M, P]`` width and internal bits
    only at the *maximum community width* (communities are typically
    width/P columns wide, so a full-width internal draw wastes most of the
    randoms) — and assembles every block with numpy vector ops: per-row
    antithetic partners are index arithmetic, the community->element
    expansion is one matmul against the [P, width] membership matrix, and
    internal bits land in own-community columns via per-block contiguous-row
    slice assignment (each block's rows share one column set).  Semantics
    (internal bits / antithetic external coalitions / dead-mask reactivation
    / budget cap / biggest-first subsample) are unchanged — asserted by the
    coalition-validity tests.  ``key`` may be a jax PRNG key or a numpy
    Generator.
    """
    plans = build_plans(pathway_inds, total)
    num_pathways = len(pathway_inds)
    rng = _np_rng(key)

    # memory cap: biggest pathways only.  The check deliberately runs BEFORE
    # the just-appended block is counted — exactly the reference's order
    # (masks.py:343-348: `if cumulative_size > ...: break` precedes
    # `cumulative_size += mask.shape[0]`), so the break fires on the same
    # pathway as the oracle (asserted in tests/test_masks.py).
    used: List[MaskPlan] = []
    cumulative = 0
    for plan in plans:
        used.append(plan)
        if cumulative > total and num_elements > 4000:
            break
        cumulative += plan.size

    # enum index of each used plan = its position in the sorted plan list
    # (the reference's `ind_pathway` for the forced-False own column)
    sizes_b = np.array([p.size for p in used], np.int64)
    si_b = np.array([p.size_internal for p in used], np.int64)
    tags_b = np.array([p.pathway_index for p in used], np.int32)
    lens_b = np.array([p.columns.shape[0] for p in used], np.int32)
    m_total = int(sizes_b.sum())
    starts = np.zeros(len(used), np.int64)
    np.cumsum(sizes_b[:-1], out=starts[1:])

    mem = np.zeros((num_pathways, width), bool)  # [P, width] membership
    for i, p in enumerate(pathway_inds):
        mem[i, np.fromiter((int(v) for v in p), np.int64)] = True

    rows = np.arange(m_total)
    row_block = np.repeat(np.arange(len(used)), sizes_b)  # [M] used-plan idx
    row_tag = tags_b[row_block]  # [M] original pathway index
    local = rows - starts[row_block]
    is_ext = local >= si_b[row_block]
    j = local - si_b[row_block]  # ext-local row index (where is_ext)
    half = ((sizes_b - si_b) // 2)[row_block]

    # internal bits: draw only the max community width, not the full mask
    # width (a full [M, width] draw + per-row membership gather + where
    # measured 30 ms of the 16-query community bench; communities are
    # typically width/P columns wide)
    l_max = int(lens_b.max()) if len(used) else 0
    u_elem = rng.random((m_total, max(l_max, 1)), dtype=np.float32)
    u_path = rng.random((m_total, num_pathways), dtype=np.float32)

    # antithetic external coalitions: second half inverts the first half
    # (reference pathways.py:234-283); odd tail row is a fresh draw
    invert = is_ext & (j >= half) & (j < 2 * half)
    base = np.where(invert, rows - half, rows)
    pm = (u_path[base] < 0.5) ^ invert[:, None]
    pm[~is_ext] = False
    if num_pathways > 1:
        pm[rows, row_tag] = False  # own community never in the coalition
    else:
        pm[:] = False  # no external coalitions with a single community

    if num_pathways > 1:
        # dead-mask reactivation (reference pathways.py:285-334): when a
        # block's whole external mask is all-False, flip one random other
        # community per row.  All-False needs every bit of a
        # [rows_ext, P-1] draw to land False — vanishingly rare except for
        # tiny blocks, so the fix stays a per-affected-block loop.
        row_any = pm.any(axis=1)
        for bi in range(len(used)):
            s = int(starts[bi] + si_b[bi])
            e = int(starts[bi] + sizes_b[bi])
            if e > s and not row_any[s:e].any():
                pm[s:e] = _activate_dead_mask(rng, pm[s:e], int(tags_b[bi]))

    # community coalition -> element bits: one boolean matmul (elements in
    # several coalition communities OR together, like the reference's
    # scatter-or over the segment table)
    # uint16 accumulator: a uint8 matmul would wrap to 0 for an element
    # shared by a multiple of 256 coalition communities (P >= 256 pathways)
    full = pm.astype(np.uint16) @ mem.astype(np.uint16) > 0
    # own-community columns carry the internal bits (reference
    # masks.py:322-340): per-block slice assignment — every row of a block
    # shares the same column set, so this is contiguous-row fancy indexing
    # instead of a full-width where against a gathered membership matrix
    for bi, p in enumerate(used):
        s = int(starts[bi])
        e = s + int(sizes_b[bi])
        cols = p.columns
        full[s:e, cols] = u_elem[s:e, : cols.shape[0]] < 0.5

    tags = row_tag
    if num_elements > 4000 and m_total > total:
        # biggest-communities-first subsample (masks.py:367-380)
        order = np.argsort(-lens_b[row_block], kind="stable")[:total]
        full = full[order]
        tags = tags[order]
    return full, tags


def sample_shapley_mask(
    key: jax.Array, num_elements: int, width: int, total: int
) -> np.ndarray:
    """Fully random mask for Shapley-value mode (reference
    ``masks.py:231-260``); padding columns beyond ``num_elements`` stay
    False.  Host-side numpy (see :func:`_np_rng`); the jit-internal Shapley
    draw in ``explain/batch.py`` stays ``jax.random``.  ``key`` may be a jax
    PRNG key or a numpy Generator."""
    bits = _np_rng(key).random((total, width), dtype=np.float32) < 0.5
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
        (see :func:`_philox_streams`): as eager jax ops each tiny per-pathway
        draw cost one dispatch — ~26 ms over the remote-TPU tunnel, ~0.1 ms
        even on local CPU — which dominated community-mode throughput.  No
        jax op runs at all (an eager split + ``jax.devices("cpu")`` lookup
        broke TPU-only platform configs and paid one dispatch per call).
        """
        rng_mask, rng_perm = _philox_streams(key, 2)
        if self.pathway_inds is not None:
            mask, tags = sample_community_mask(
                rng_mask, self.pathway_inds, self.num_elements, self.width, self.total
            )
        else:
            mask = sample_shapley_mask(rng_mask, self.num_elements, self.width, self.total)
            tags = None

        m_total = mask.shape[0]
        perm = rng_perm.permutation(m_total)
        mask = mask[perm]
        if tags is not None:
            tags = tags[perm]

        batch_size = max(m_total // self.epochs, 1)
        m_used = batch_size * min(self.epochs, m_total)
        mask = mask[:m_used]
        if tags is not None:
            tags = tags[:m_used]
        return mask, tags, batch_size
