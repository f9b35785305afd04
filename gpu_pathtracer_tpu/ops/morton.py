"""Morton codes and longest-common-prefix for LBVH construction.

Vectorized re-derivation of the reference's `src/util/bvh_util.h`:
10-bits-per-axis interleave and a CLZ-based LCP with index tiebreak for
duplicate codes.  All int32 (TPU has no int64 by default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Insert two zero bits between each of the low 10 bits (bvh_util.h:4-12)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_3d(p: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton code from normalized coordinates in [0, 1]
    (bvh_util.h:14-20).  p: (..., 3) -> (...) int32."""
    q = jnp.clip(p * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    xx = expand_bits(q[..., 0])
    yy = expand_bits(q[..., 1])
    zz = expand_bits(q[..., 2])
    return (xx * 4 + yy * 2 + zz).astype(jnp.int32)


def normalized_centroids(centers: jnp.ndarray) -> jnp.ndarray:
    """Normalize points into the world AABB (bounding_box.h:126-150)."""
    lo = jnp.min(centers, axis=0)
    hi = jnp.max(centers, axis=0)
    span = jnp.maximum(hi - lo, 1e-12)
    return (centers - lo) / span


def _clz32(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.clz(x.astype(jnp.int32))


def lcp(
    codes: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray, n: int
) -> jnp.ndarray:
    """Longest common prefix delta(i, j) (bvh_util.h:22-31).

    Out-of-range j yields -1; equal codes fall back to 32 + clz(i ^ j)
    so duplicate Morton codes still split deterministically.
    """
    in_range = (j >= 0) & (j <= n - 1)
    j_safe = jnp.clip(j, 0, n - 1)
    ci = codes[i]
    cj = codes[j_safe]
    same = ci == cj
    base = _clz32(ci ^ cj)
    tie = 32 + _clz32(i ^ j_safe)
    out = jnp.where(same, tie, base)
    return jnp.where(in_range, out, -1)
