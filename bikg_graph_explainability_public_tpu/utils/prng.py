"""Counter-based PRNG helpers.

The reference seeds four global RNGs and only when ``times == 1``
(``/root/reference/src/pathway_explanations/explainer.py:14-22,341-343``), so
multi-repeat runs are irreproducible.  Here every random draw derives from a
single ``jax.random`` key; the repeat index is folded into the key so runs are
reproducible *and* repeats differ — fixing the reference quirk by design.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def root_key(seed: int) -> jax.Array:
    """Deterministic root PRNG key from the config seed."""
    return jax.random.PRNGKey(int(seed))


def repeat_key(seed: int, repeat: int) -> jax.Array:
    """Key for repeat ``repeat`` of an explanation run."""
    return jax.random.fold_in(root_key(seed), int(repeat))


@partial(jax.jit, static_argnames=("seed", "times"))
def _repeat_split_keys(seed: int, times: int) -> jax.Array:
    return jnp.stack(
        [
            jax.random.key_data(
                jax.random.split(jax.random.fold_in(root_key(seed), t))
            )
            for t in range(times)
        ]
    )


def repeat_split_key_data(seed: int, times: int) -> np.ndarray:
    """``key_data(split(repeat_key(seed, t)))`` for every repeat, as one
    [T, 2, 2] uint32 numpy array from ONE compiled dispatch.

    Eager per-repeat ``PRNGKey`` + ``fold_in`` + ``split`` cost ~3 device
    dispatches each (~26 ms/dispatch over a remote-TPU tunnel); batching them
    keeps ``Explainer.run`` host-loop overhead flat in ``times``.  Row
    ``[t, 0]`` is the mask key, ``[t, 1]`` the surrogate-init key — the same
    split order as the per-repeat version, so draws are bit-identical.
    """
    return np.asarray(_repeat_split_keys(int(seed), int(times)))
