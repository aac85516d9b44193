"""Counter-based PRNG helpers.

The reference seeds four global RNGs and only when ``times == 1``
(``/root/reference/src/pathway_explanations/explainer.py:14-22,341-343``), so
multi-repeat runs are irreproducible.  Here every random draw derives from a
single ``jax.random`` key; the repeat index is folded into the key so runs are
reproducible *and* repeats differ — fixing the reference quirk by design.
"""

from __future__ import annotations

import jax


def root_key(seed: int) -> jax.Array:
    """Deterministic root PRNG key from the config seed."""
    return jax.random.PRNGKey(int(seed))


def repeat_key(seed: int, repeat: int) -> jax.Array:
    """Key for repeat ``repeat`` of an explanation run."""
    return jax.random.fold_in(root_key(seed), int(repeat))
