"""Texture atlas lookups.

TPU-native re-derivation of the reference's texture machinery
(`Material::_get_texture`, material.h:653-727): all images live in ONE packed
(P, 3) float32 RGB atlas with per-image (offset, height, width) records, so a
batched lookup is a single gather — no per-material pointers.

Sampling is nearest-texel with wrap, exactly like the reference:
``idx_u = floor(frac(u) * (W - 1))``, row-major ``idx = W * idx_v + idx_u``.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_pathtracer_tpu.pytree import pytree_dataclass


@pytree_dataclass
class Atlas:
    rgb: jnp.ndarray  # (P, 3) packed pixels; slot 0 = 1x1 white
    offsets: jnp.ndarray  # (K,) int32 pixel offset of each image
    heights: jnp.ndarray  # (K,) int32
    widths: jnp.ndarray  # (K,) int32


def lookup(atlas: Atlas, slot: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-texel fetch.  slot (...,) int32, uv (..., 2) -> (..., 3).

    Matches Material::_get_texture (material.h:653-671) including the
    (W-1)/(H-1) scaling quirk.

    Static fast path: an atlas holding only the 1x1 white default (no MTL
    map_* entries anywhere in the scene) makes every fetch white, so the
    gathers vanish at trace time — shapes are static under jit.
    """
    if atlas.rgb.shape[0] <= 1:
        return jnp.ones(slot.shape + (3,), atlas.rgb.dtype)
    w = atlas.widths[slot]
    h = atlas.heights[slot]
    off = atlas.offsets[slot]
    u = uv[..., 0]
    v = uv[..., 1]
    iu = jnp.floor((u - jnp.floor(u)) * (w - 1).astype(u.dtype)).astype(jnp.int32)
    iv = jnp.floor((v - jnp.floor(v)) * (h - 1).astype(v.dtype)).astype(jnp.int32)
    idx = off + w * iv + iu
    return atlas.rgb[idx]


def lookup_sky(
    atlas_rgb: jnp.ndarray,  # (P, 3) standalone sky image (not the atlas)
    height: int,
    width: int,
    look_dir: jnp.ndarray,  # (..., 3) unit
    sky_emission: jnp.ndarray,  # (3,)
) -> jnp.ndarray:
    """Equirectangular environment lookup (pathtracing.h:69-82)."""
    u = 0.5 + jnp.arctan2(look_dir[..., 2], look_dir[..., 0]) / (2.0 * jnp.pi)
    v = 0.5 - jnp.arcsin(jnp.clip(look_dir[..., 1], -1.0, 1.0)) / jnp.pi
    iu = jnp.floor((u - jnp.floor(u)) * (width - 1)).astype(jnp.int32)
    iv = jnp.floor((v - jnp.floor(v)) * (height - 1)).astype(jnp.int32)
    return sky_emission * atlas_rgb[width * iv + iu]
