"""Static-shape padding utilities.

Everything under ``jit`` on TPU must have static shapes.  Instead of the
reference's dynamic tensor slicing (e.g. ``/root/reference/src/pathway_explanations/
data.py:281-361`` which produces data-dependent subgraph sizes), this framework
pads every ragged quantity to a *budget* chosen from a small set of buckets so
that recompilation only happens when a budget changes.
"""

from __future__ import annotations


def round_up(n: int, multiple: int) -> int:
    """Round ``n`` up to the nearest positive multiple of ``multiple``."""
    if n <= 0:
        return multiple
    return ((n + multiple - 1) // multiple) * multiple


def round_up_pow2(n: int, minimum: int = 8) -> int:
    """Round ``n`` up to the nearest power of two (at least ``minimum``).

    Used to bucket padded-subgraph sizes: a 2x geometric ladder bounds the
    number of distinct compiled shapes at ``log2(N)`` while wasting at most 2x
    memory.
    """
    if n <= minimum:
        return minimum
    p = 1 << (n - 1).bit_length()
    return max(p, minimum)


def pad_budget(n: int, mode: str = "pow2", multiple: int = 8) -> int:
    """Select a padded capacity for an actual size ``n``."""
    if mode == "pow2":
        return round_up_pow2(n, minimum=multiple)
    if mode == "multiple":
        return round_up(n, multiple)
    if mode == "exact":
        return max(n, 1)
    raise ValueError(f"unknown padding mode: {mode!r}")
