"""Bounding-sphere primitives (reference: src/model/grid/bounding_sphere.h).

The reference builds per-node BoundingSphere objects over its photon / SSS
point BVHs (bvh_building.h:292, bvh_building_photon.h:16) and queries them
during gathers (bvh_traversal_pts.h:41-67, bvh_traversal_photon.h:135-168).
This repo's gathers run on a spatial hash grid instead (ops/hashgrid.py),
so no sphere TREE exists — but the sphere-level predicates are still the
semantic core of every gather test, and they live here as batched
array-level kernels (no pointer objects, broadcastable over any leading
shape):

* `is_inside`            — bounding_sphere.h:49-56 (distance <= r)
* `is_inside_disc`       — bounding_sphere.h:58-69 (the normal-gated
                           variant: also |dot(p - c, n)| <= 0.1 r)
* `sphere_union`         — compute_bs_union, bounding_sphere.h:72-95
                           (exact axis-projection construction, including
                           its center-through-c1 parameterization)
* `sphere_box_intersect` — BoundingBox::is_intersection(BoundingSphere),
                           bounding_box.h:278-312 (per-axis center distance
                           vs half-extent + r; deliberately the reference's
                           conservative box-expansion test, NOT the exact
                           closest-point test)

`render/sss.py` and `render/sppm.py` consume `is_inside` inside their
gathers; `sphere_union` exists for parity/completeness (the grid redesign
obsoletes the union tree itself).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_pathtracer_tpu.ops import linalg


def is_inside(
    center: jnp.ndarray,  # (..., 3)
    r: jnp.ndarray,  # (...)
    pts: jnp.ndarray,  # (..., 3)
    d: jnp.ndarray | None = None,  # optional precomputed |pts - center|
) -> jnp.ndarray:
    """BoundingSphere::is_inside(coordinate) (bounding_sphere.h:49-56):
    distance(center, p) <= r.  Pass `d` when the caller already computed
    the distance (every gather also needs it for its 1/d weight)."""
    if d is None:
        d = linalg.length(pts - center)
    return d <= r


def is_inside_sq(
    center: jnp.ndarray,  # (..., 3)
    r: jnp.ndarray,  # (...)
    pts: jnp.ndarray,  # (..., 3)
    d2: jnp.ndarray | None = None,  # optional precomputed |pts - center|^2
) -> jnp.ndarray:
    """`is_inside` in squared-distance form (d^2 <= r^2) — the SPPM photon
    gathers keep d^2 for their top-k key, and the squared comparison is
    what their selection already uses (sqrt would perturb ulp-edge
    verdicts)."""
    if d2 is None:
        d2 = jnp.sum((pts - center) ** 2, axis=-1)
    return d2 <= r * r


def is_inside_disc(
    center: jnp.ndarray,
    r: jnp.ndarray,
    pts: jnp.ndarray,
    normal: jnp.ndarray,  # (..., 3)
    d: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """BoundingSphere::is_inside(coordinate, normal)
    (bounding_sphere.h:58-69): inside the sphere AND within the thin disc
    |dot(p - center, normal)| <= 0.1 * r about the tangent plane."""
    rel = pts - center
    if d is None:
        d = linalg.length(rel)
    parallel = jnp.sum(rel * normal, axis=-1)
    return (d <= r) & (jnp.abs(parallel) <= 0.1 * r)


def sphere_union(
    c1: jnp.ndarray,  # (..., 3)
    r1: jnp.ndarray,  # (...)
    c2: jnp.ndarray,
    r2: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """compute_bs_union (bounding_sphere.h:72-95): the reference's union of
    two spheres, built by projecting both spheres' extreme points onto the
    c1->c2 axis (t measured from c1) and spanning [t_min, t_max].

    Returns (center, r).  Faithful to the reference's arithmetic — the
    projections are |point - c1| DISTANCES, so t_min is clamped at
    -min(r1, dist(p3, c1)) exactly as written there; coincident centers
    (the reference's make_unit_vector would 0/0 here) fall back to the
    larger-radius sphere."""
    axis = c2 - c1
    alen = linalg.length(axis)
    degenerate = alen < 1e-20
    u = axis / jnp.where(degenerate, 1.0, alen)[..., None]

    # extreme points of each sphere along the axis, as distances from c1
    # (bounding_sphere.h:78-90): p1/p2 = c1 -+ r1*u, p3/p4 = c2 -+ r2*u
    d_p1 = r1  # dist(c1 - r1 u, c1)
    d_p2 = r1
    d_p3 = jnp.abs(alen - r2)  # dist(c2 - r2 u, c1)
    d_p4 = alen + r2
    t_min = -jnp.minimum(d_p1, d_p3)
    t_max = jnp.maximum(d_p2, d_p4)
    r = (t_max - t_min) / 2.0
    center = c1 + ((t_min + t_max) / 2.0)[..., None] * u

    big = r1 >= r2
    fallback_c = jnp.where(big[..., None], c1, c2)
    fallback_r = jnp.maximum(r1, r2)
    return (
        jnp.where(degenerate[..., None], fallback_c, center),
        jnp.where(degenerate, fallback_r, r),
    )


def sphere_box_intersect(
    box_lo: jnp.ndarray,  # (..., 3)
    box_hi: jnp.ndarray,  # (..., 3)
    center: jnp.ndarray,  # (..., 3)
    r: jnp.ndarray,  # (...)
) -> jnp.ndarray:
    """BoundingBox::is_intersection(BoundingSphere)
    (bounding_box.h:278-312): per-axis |box_center - c| <= half_extent + r.
    This is the reference's conservative test (box expanded by r per axis —
    a superset of true sphere/box overlap near corners); kept bit-faithful
    rather than "fixed" so traversal-level decisions match."""
    box_c = (box_lo + box_hi) * 0.5
    half = box_hi - box_c
    return jnp.all(
        jnp.abs(box_c - center) <= half + r[..., None], axis=-1
    )
