"""shard_map compatibility shim.

`jax.shard_map` (jax >= 0.8) spells the replication-check flag `check_vma`;
the legacy `jax.experimental.shard_map.shard_map` spells it `check_rep`.
Import-time feature detection picks the right keyword once so every caller
can say `shard_map(..., check=False)` and work on both APIs.
"""

from __future__ import annotations

import functools

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    _CHECK_KW = "check_vma"
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

    _CHECK_KW = "check_rep"


@functools.wraps(_shard_map)
def shard_map(*args, check: bool | None = None, **kwargs):
    if check is not None:
        kwargs[_CHECK_KW] = check
    return _shard_map(*args, **kwargs)
