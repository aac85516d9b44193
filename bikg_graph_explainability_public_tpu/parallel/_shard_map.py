"""Version-tolerant ``shard_map`` import.

jax >= 0.8 exposes ``jax.shard_map`` as a top-level function; older releases
have ``jax.experimental.shard_map.shard_map``.
"""

from __future__ import annotations

import jax

if callable(getattr(jax, "shard_map", None)):
    shard_map = jax.shard_map
else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore # noqa: F401
