"""Thin-lens / pinhole camera.

Re-derivation of the reference camera (`src/model/camera.h`): look-at basis,
per-pixel primary ray with focus-plane target and lens-circle offset for
depth of field, and the inverse projection used for point splatting.
Vectorized over pixel batches.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from gpu_pathtracer_tpu.ops import linalg, sampling
from gpu_pathtracer_tpu.pytree import pytree_dataclass


@pytree_dataclass(meta=("width", "height"))
class Camera:
    eye: jnp.ndarray  # (3,)
    u: jnp.ndarray  # (3,) right
    v: jnp.ndarray  # (3,) up
    w: jnp.ndarray  # (3,) backward (eye - center)
    tan_half_fovx: jnp.ndarray  # scalar
    tan_half_fovy: jnp.ndarray
    lens_radius: jnp.ndarray
    focus_dist: jnp.ndarray
    width: int = 256
    height: int = 256

    @staticmethod
    def create(
        eye,
        center,
        up,
        fovy_deg: float,
        width: int,
        height: int,
        aperture: float = 0.0,
        focus_dist: float = 1.0,
    ) -> "Camera":
        """Look-at construction (camera.h:30-48); fovx derived from fovy by
        the aspect ratio through the tan relation (camera.h:43-44)."""
        eye = jnp.asarray(eye, jnp.float32)
        center = jnp.asarray(center, jnp.float32)
        up = jnp.asarray(up, jnp.float32)
        w = linalg.normalize(eye - center)
        u = linalg.normalize(linalg.cross(up, w))
        v = linalg.cross(w, u)
        tan_half_fovy = math.tan(math.pi * fovy_deg / 180.0 / 2.0)
        tan_half_fovx = (width / height) * tan_half_fovy
        return Camera(
            eye=eye,
            u=u,
            v=v,
            w=w,
            tan_half_fovx=jnp.float32(tan_half_fovx),
            tan_half_fovy=jnp.float32(tan_half_fovy),
            lens_radius=jnp.float32(aperture / 2.0),
            focus_dist=jnp.float32(focus_dist),
            width=width,
            height=height,
        )

    def generate_rays(
        self, i: jnp.ndarray, j: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Primary rays for pixel centers (i=row, j=col, floats; pass
        i+0.5/j+0.5 for centers).  u1/u2 drive the thin-lens circle sample
        (camera.h:68-83).  Returns (origins, directions), each (..., 3)."""
        alpha = self.tan_half_fovx * (j - self.width / 2.0) / (self.width / 2.0)
        beta = self.tan_half_fovy * (self.height / 2.0 - i) / (self.height / 2.0)
        d = (
            alpha[..., None] * self.u
            + beta[..., None] * self.v
            - self.w
        )
        d = linalg.normalize(d)
        point = self.eye + self.focus_dist * d
        rd = self.lens_radius * sampling.sample_unit_circle(u1, u2)
        offset = rd[..., 0:1] * self.u + rd[..., 1:2] * self.v
        origin = self.eye + offset
        direction = linalg.normalize(point - origin)
        return jnp.broadcast_to(origin, d.shape), direction

    def project(self, direction: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Inverse projection of a view direction to integer (i, j)
        (camera.h:50-66) — used by the point-cloud splat debug images."""
        j = jnp.floor(
            self.width / 2.0
            + self.width / 2.0 / self.tan_half_fovx
            * linalg.dot(direction + self.w, self.u)
        ).astype(jnp.int32)
        i = jnp.floor(
            self.height / 2.0
            - self.height / 2.0 / self.tan_half_fovy
            * linalg.dot(direction + self.w, self.v)
        ).astype(jnp.int32)
        return i, j
