"""Watertight ray/triangle intersection (Woop-style), vectorized.

Re-derivation of the reference's `Triangle::hit` (triangle.h:343-408):
translate to ray origin, permute axes so the ray direction's dominant axis
is z, shear, signed 2-D edge functions, barycentric interpolation.  The
reference falls back to double precision when an edge function is exactly
zero; f64 is unavailable on TPU, so the fallback here recomputes the edge
functions with Dekker two-product compensated arithmetic in f32, which
recovers the sign information watertightness needs.

All functions broadcast: rays (..., 3) against triangle packs (..., K, 3, 3),
returning (..., K) results — the building block for both the brute-force
path (small scenes) and BVH leaf tests.
"""

from __future__ import annotations

import jax.numpy as jnp

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for float32


def _two_product(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact product a*b = p + err in f32 via Dekker splitting (no FMA)."""
    p = a * b
    a1 = a * _SPLIT
    a_hi = a1 - (a1 - a)
    a_lo = a - a_hi
    b1 = b * _SPLIT
    b_hi = b1 - (b1 - b)
    b_lo = b - b_hi
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


def _diff_of_products_exact(
    a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray
) -> jnp.ndarray:
    """a*b - c*d with compensated rounding (the TPU stand-in for the
    reference's double-precision edge-function fallback, triangle.h:369-379)."""
    p1, e1 = _two_product(a, b)
    p2, e2 = _two_product(c, d)
    return (p1 - p2) + (e1 - e2)


def triangle_tolerance(tri_p: jnp.ndarray) -> jnp.ndarray:
    """Per-triangle adaptive epsilon min(1e-5, shortest_edge/100)
    (triangle.h:307-321).  tri_p: (..., 3, 3) -> (...)."""
    d12 = jnp.linalg.norm(tri_p[..., 0, :] - tri_p[..., 1, :], axis=-1)
    d13 = jnp.linalg.norm(tri_p[..., 0, :] - tri_p[..., 2, :], axis=-1)
    d23 = jnp.linalg.norm(tri_p[..., 1, :] - tri_p[..., 2, :], axis=-1)
    return jnp.minimum(1e-5, jnp.minimum(d12, jnp.minimum(d13, d23)) / 100.0)


def triangle_area(tri_p: jnp.ndarray) -> jnp.ndarray:
    """Heron's formula, like _compute_triangle_area (triangle.h:443-452)."""
    s1 = jnp.linalg.norm(tri_p[..., 0, :] - tri_p[..., 1, :], axis=-1)
    s2 = jnp.linalg.norm(tri_p[..., 0, :] - tri_p[..., 2, :], axis=-1)
    s3 = jnp.linalg.norm(tri_p[..., 1, :] - tri_p[..., 2, :], axis=-1)
    s = (s1 + s2 + s3) / 2.0
    return jnp.abs(jnp.sqrt(jnp.maximum(s * (s - s1) * (s - s2) * (s - s3), 0.0)))


def intersect_tris(
    origin: jnp.ndarray,  # (..., 3)
    direction: jnp.ndarray,  # (..., 3)
    tri_p: jnp.ndarray,  # (..., K, 3, 3)
    tol: jnp.ndarray,  # (..., K)
    t_max: jnp.ndarray,  # (...) or scalar
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Watertight hit test of each ray against its K candidate triangles.

    Returns (t, bary, hit): t (..., K) with +inf misses, bary (..., K, 3),
    hit (..., K) bool.  Branch-free; the exact-arithmetic fallback is
    blended in only where an edge function vanishes.
    """
    pt = tri_p - origin[..., None, None, :]  # (..., K, 3, 3)

    # dominant-axis permutation (per ray), branch-free: a dynamic gather on
    # the minormost axis is catastrophically slow on TPU (it defeats the
    # vector layout), so the three rotations are computed by static slicing
    # and blended with selects on kz.
    kz = jnp.argmax(jnp.abs(direction), axis=-1)  # (...)

    def permute3(v, kz_b):
        """(..., 3) components under kx=(kz+1)%3, ky=(kz+2)%3 -> (x, y, z)."""
        v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
        is0 = kz_b == 0
        is1 = kz_b == 1
        x = jnp.where(is0, v1, jnp.where(is1, v2, v0))
        y = jnp.where(is0, v2, jnp.where(is1, v0, v1))
        z = jnp.where(is0, v0, jnp.where(is1, v1, v2))
        return x, y, z

    dx, dy, dz = permute3(direction, kz)  # (...,)
    px, py, pz = permute3(pt, kz[..., None, None])  # (..., K, 3)

    sx = (-dx / dz)[..., None, None]
    sy = (-dy / dz)[..., None, None]
    sz = (1.0 / dz)[..., None, None]

    x = px + sx * pz  # (..., K, 3) per-corner sheared x
    y = py + sy * pz

    x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2]
    y1, y2, y3 = y[..., 0], y[..., 1], y[..., 2]

    e1 = x2 * y3 - y2 * x3
    e2 = x3 * y1 - y3 * x1
    e3 = x1 * y2 - y1 * x2

    need_exact = (e1 == 0.0) | (e2 == 0.0) | (e3 == 0.0)
    e1 = jnp.where(need_exact, _diff_of_products_exact(x2, y3, y2, x3), e1)
    e2 = jnp.where(need_exact, _diff_of_products_exact(x3, y1, y3, x1), e2)
    e3 = jnp.where(need_exact, _diff_of_products_exact(x1, y2, y1, x2), e3)

    mixed = ((e1 < 0) | (e2 < 0) | (e3 < 0)) & ((e1 > 0) | (e2 > 0) | (e3 > 0))
    det = e1 + e2 + e3

    z_scaled = pz * sz[..., 0:1]  # broadcast (..., K, 3)
    t_scaled = (
        e1 * z_scaled[..., 0] + e2 * z_scaled[..., 1] + e3 * z_scaled[..., 2]
    )

    safe_det = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / safe_det
    t = t_scaled * inv_det
    bary = jnp.stack([e1 * inv_det, e2 * inv_det, e3 * inv_det], axis=-1)

    t_max_b = jnp.asarray(t_max)[..., None] if jnp.ndim(t_max) else t_max
    hit = (~mixed) & (det != 0.0) & (t <= t_max_b) & (t >= tol)
    t_out = jnp.where(hit, t, jnp.inf)
    return t_out, bary, hit


def closest_hit_brute(
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3)
    tri_p: jnp.ndarray,  # (N, 3, 3)
    tol: jnp.ndarray,  # (N,)
    t_max: jnp.ndarray | float = jnp.inf,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All-pairs closest hit — the MXU/VPU-friendly path for small scenes
    where a (R, N) test beats divergent traversal.  Returns
    (t, tri_idx, bary, hit) with tri_idx = -1 on miss."""
    t, bary, hit = intersect_tris(
        origin, direction, tri_p[None, ...], tol[None, :], t_max
    )
    best = jnp.argmin(t, axis=-1)
    best_t = jnp.take_along_axis(t, best[..., None], axis=-1)[..., 0]
    best_bary = jnp.take_along_axis(bary, best[..., None, None], axis=-2)[..., 0, :]
    any_hit = jnp.isfinite(best_t)
    return (
        jnp.where(any_hit, best_t, jnp.inf),
        jnp.where(any_hit, best, -1),
        best_bary,
        any_hit,
    )
