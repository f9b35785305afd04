"""Point-cloud splat debug images.

TPU-native re-derivation of the reference's ``create_point_image`` kernels
(`src/model/point/point_operations.h:19-75`): project every point of a cloud
through the camera's inverse projection (`camera.h:50-66`) and write its
color into the frame buffer.  The reference's per-thread scatter (arbitrary
winner on collisions) becomes one batched scatter — XLA's last-writer-wins
matches the race-benign semantics.

Used for the reference's debug outputs: SSS point clouds (`main.cu:1240-1260`
``*_pts.ppm``) and SPPM hit points / photon maps (`main.cu:1256-1382`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.ops import linalg


@functools.partial(jax.jit, static_argnames=("width", "height"))
def splat_points(
    camera,
    locations: jnp.ndarray,  # (N, 3)
    colors: jnp.ndarray,  # (N, 3)
    width: int,
    height: int,
    valid: jnp.ndarray | None = None,  # (N,) bool
) -> jnp.ndarray:
    """Project points to pixels and write their colors; returns (H, W, 3).

    Non-finite locations and out-of-frame projections are dropped, like the
    reference's ``vector_is_inf`` / bounds guards (point_operations.h:26,40).
    """
    finite = jnp.all(jnp.isfinite(locations), axis=-1)
    if valid is not None:
        finite = finite & valid
    direction = linalg.normalize(locations - camera.eye, 1e-12)
    i, j = camera.project(direction)
    # in front of the camera only (behind-eye points project spuriously)
    front = linalg.dot(direction, -camera.w) > 0
    ok = finite & front & (i >= 0) & (j >= 0) & (i < height) & (j < width)
    # route dropped points to a scratch row past the frame
    idx = jnp.where(ok, i * width + j, height * width)
    fb = jnp.zeros((height * width + 1, 3), jnp.float32)
    fb = fb.at[idx].set(jnp.where(ok[..., None], colors, 0.0))
    return fb[: height * width].reshape(height, width, 3)
