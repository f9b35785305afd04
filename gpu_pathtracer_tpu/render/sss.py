"""Sub-surface scattering via surface point clouds.

TPU-native re-derivation of the reference's SSS pipeline:

* build time: sample `sss_pts_per_object` points per SSS object by
  area-weighted triangle pick + uniform barycentric point, storing the kd
  texture as the point filter (`create_sss_pts`, object_operations.h:123-141);
* first pass: per point, cosine-hemisphere path traces estimate irradiance;
  point color = mean * filter (`do_sss_first_pass`, pathtracing.h:202-249);
* render time: a diffuse bounce on an SSS material returns the
  1/d-weighted average of cached point colors within `path_length` of the
  hit, times the local kd (`compute_color_sss`, pathtracing_sss.h:17-42,
  `traverse_bvh_pts`, bvh_traversal_pts.h:14-104).

The reference packs one sub-BVH per object into a forest
(bvh_building_pts.h); here the gather is a masked all-pairs reduction over
the flat point array (object-id equality replaces the forest indexing) —
static shapes, one pass of vector ops.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.constants import SMALL_EPS
from gpu_pathtracer_tpu.ops import bounding_sphere, intersect, linalg, sampling
from gpu_pathtracer_tpu.models.scene import Scene, SSSPoints


def sample_sss_points(
    scene: Scene, key: jax.Array, pts_per_object: int
) -> SSSPoints | None:
    """Sample the per-object point clouds (create_sss_pts).

    Uses the sorted geometry SoA; SSS objects are those whose triangles carry
    a material with path_length > 0 (object flagged at construction,
    world.h:225-231).
    """
    g = scene.geom
    table = scene.materials
    pl = table.path_length[g.mat_id] * g.valid  # (T,)
    is_sss_tri = pl > 0
    if not bool(jnp.any(is_sss_tri)):
        return None

    obj_ids = jnp.unique(jnp.where(is_sss_tri, g.obj_id, -1))
    obj_ids = obj_ids[obj_ids >= 0]  # (O,) SSS objects
    areas = intersect.triangle_area(g.p) * g.valid  # (T,)

    all_pos, all_nrm, all_filt, all_obj = [], [], [], []
    for k, oid in enumerate(list(jnp.asarray(obj_ids))):
        oid = int(oid)
        okey = jax.random.fold_in(key, oid)
        w = jnp.where((g.obj_id == oid) & is_sss_tri, areas, 0.0)
        cdf = jnp.cumsum(w)
        total = cdf[-1]
        u = jax.random.uniform(jax.random.fold_in(okey, 0), (pts_per_object,))
        tri = jnp.clip(
            jnp.searchsorted(cdf, u * total), 0, w.shape[0] - 1
        ).astype(jnp.int32)
        # uniform point: u = 1 - sqrt(r1), v = r2 sqrt(r1) (triangle.h:199)
        r1 = jax.random.uniform(jax.random.fold_in(okey, 1), (pts_per_object,))
        r2 = jax.random.uniform(jax.random.fold_in(okey, 2), (pts_per_object,))
        s = jnp.sqrt(r1)
        bu = 1.0 - s
        bv = r2 * s
        bary = jnp.stack([bu, bv, 1.0 - bu - bv], axis=-1)[..., None]
        pos = jnp.sum(bary * g.p[tri], axis=-2)
        nrm = linalg.normalize(jnp.sum(bary * g.n[tri], axis=-2), SMALL_EPS)
        uv = jnp.sum(bary * g.uv[tri], axis=-2)
        filt = table.diffuse_color(g.mat_id[tri], uv)
        all_pos.append(pos)
        all_nrm.append(nrm)
        all_filt.append(filt)
        all_obj.append(jnp.full((pts_per_object,), oid, jnp.int32))

    pos = jnp.concatenate(all_pos)
    return SSSPoints(
        pos=pos,
        normal=jnp.concatenate(all_nrm),
        filter=jnp.concatenate(all_filt),
        color=jnp.zeros_like(pos),
        obj_id=jnp.concatenate(all_obj),
        valid=jnp.ones((pos.shape[0],), bool),
    )


def run_first_pass(
    scene: Scene,
    points: SSSPoints,
    key: jax.Array,
    sample_size: int = 16,
    level: int = 4,
    hittable_pdf_weight: float = 0.0,
) -> SSSPoints:
    """do_sss_first_pass (pathtracing.h:202-249): cosine-hemisphere
    irradiance estimates per point, color = mean * filter."""
    from gpu_pathtracer_tpu.render.integrator import trace_paths

    s = points.pos.shape[0]

    def one_sample(carry, i):
        skey = jax.random.fold_in(key, i)
        u1 = jax.random.uniform(jax.random.fold_in(skey, 0), (s,))
        u2 = jax.random.uniform(jax.random.fold_in(skey, 1), (s,))
        d = sampling.generate_direction(
            jnp.zeros_like(points.normal), points.normal,
            jnp.zeros((s,), jnp.int32), jnp.ones((s,)), u1, u2,
        )
        c = trace_paths(
            scene, points.pos, d, jax.random.fold_in(skey, 2),
            level=level, hittable_pdf_weight=hittable_pdf_weight,
            sss_first_pass=True,
        )
        return carry + linalg.de_nan(c), None

    total, _ = jax.lax.scan(
        one_sample, jnp.zeros((s, 3)), jnp.arange(sample_size)
    )
    color = (total / sample_size) * points.filter
    return dataclasses.replace(points, color=color)


def gather_sss(
    points: SSSPoints,
    hit_pt: jnp.ndarray,  # (R, 3)
    hit_obj: jnp.ndarray,  # (R,) int32
    radius: jnp.ndarray,  # (R,) material path_length
    kd: jnp.ndarray,  # (R, 3) diffuse texture at the hit
    enable: jnp.ndarray,  # (R,)
) -> jnp.ndarray:
    """compute_color_sss: inverse-distance-weighted average of cached point
    colors within `path_length`, same object only, weight capped at 9999.99
    (bvh_traversal_pts.h:41-67); zero if no point in range."""
    d = linalg.length(points.pos[None, :, :] - hit_pt[:, None, :])  # (R, S)
    inside = (
        enable[:, None]
        & points.valid[None, :]
        & (points.obj_id[None, :] == hit_obj[:, None])
        & bounding_sphere.is_inside(
            hit_pt[:, None, :], radius[:, None], points.pos[None, :, :], d=d
        )
    )
    w = jnp.where(inside, jnp.minimum(1.0 / jnp.maximum(d, 1e-20), 9999.99), 0.0)
    sum_w = jnp.sum(w, axis=-1)
    color = jnp.einsum("rs,sc->rc", w, points.color)
    found = sum_w > 0
    avg = jnp.where(
        found[..., None], color / jnp.maximum(sum_w, 1e-20)[..., None], 0.0
    )
    return avg * kd * found[..., None]


def gather_sss_grid(
    points: SSSPoints,
    hit_pt: jnp.ndarray,  # (R, 3)
    hit_obj: jnp.ndarray,  # (R,) int32
    radius: jnp.ndarray,  # (R,) material path_length
    kd: jnp.ndarray,  # (R, 3)
    enable: jnp.ndarray,  # (R,)
    k_per_cell: int = 32,
    chunk: int = 8192,
) -> jnp.ndarray:
    """`gather_sss` via the spatial hash grid (the scalable replacement for
    the reference's per-object point-BVH forest, bvh_building_pts.h:31-167):
    cell size = the max gather radius, so each ray inspects only the 27
    neighbor cells — O(R * 27 * k_per_cell) instead of the dense (R, S)
    matrix that OOMs past toy point counts.

    Up to `k_per_cell` points are taken per cell (the dense path is
    unbounded; extremely dense clouds drop the excess — callers pick
    k_per_cell >= expected points/cell)."""
    from gpu_pathtracer_tpu.ops import hashgrid

    cell = jnp.maximum(jnp.max(jnp.where(enable, radius, 0.0)), 1e-6)
    grid = hashgrid.build_grid(points.pos, points.valid, cell)

    r_total = hit_pt.shape[0]
    pad = (-r_total) % chunk

    def padded(x, fill=0.0):
        if not pad:
            return x
        filler = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, filler])

    pt_c = padded(hit_pt).reshape(-1, chunk, 3)
    obj_c = padded(hit_obj, -1).reshape(-1, chunk)
    rad_c = padded(radius).reshape(-1, chunk)
    en_c = padded(enable, False).reshape(-1, chunk)

    def one_chunk(args):
        pt, obj, rad, en = args
        cand, ok = hashgrid.query_candidates(grid, pt, k_per_cell)  # (C, 27K)
        d = linalg.length(points.pos[cand] - pt[:, None, :])
        inside = (
            ok
            & en[:, None]
            & (points.obj_id[cand] == obj[:, None])
            & bounding_sphere.is_inside(
                pt[:, None, :], rad[:, None], points.pos[cand], d=d
            )
        )
        w = jnp.where(
            inside, jnp.minimum(1.0 / jnp.maximum(d, 1e-20), 9999.99), 0.0
        )
        sum_w = jnp.sum(w, axis=-1)
        color = jnp.sum(w[..., None] * points.color[cand], axis=-2)
        found = sum_w > 0
        avg = jnp.where(
            found[..., None], color / jnp.maximum(sum_w, 1e-20)[..., None], 0.0
        )
        return avg, found

    avg, found = jax.lax.map(one_chunk, (pt_c, obj_c, rad_c, en_c))
    avg = avg.reshape(-1, 3)[:r_total]
    found = found.reshape(-1)[:r_total]
    return avg * kd * found[..., None]


# dense all-pairs below this point count; hash grid above (the (R, S) matrix
# at wavefront widths is the memory cliff VERDICT r2 flagged)
SSS_DENSE_MAX = 2048


def gather_sss_auto(points, hit_pt, hit_obj, radius, kd, enable):
    """Size-dispatched SSS gather (static: point count is a shape)."""
    if points.pos.shape[0] <= SSS_DENSE_MAX:
        return gather_sss(points, hit_pt, hit_obj, radius, kd, enable)
    return gather_sss_grid(points, hit_pt, hit_obj, radius, kd, enable)


def attach_sss(
    scene: Scene,
    key: jax.Array,
    pts_per_object: int,
    sample_size: int = 16,
    level: int = 4,
    hittable_pdf_weight: float = 0.0,
) -> Scene:
    """Sample + first-pass + attach the point cloud to the scene."""
    points = sample_sss_points(scene, key, pts_per_object)
    if points is None:
        return scene
    points = run_first_pass(
        scene, points, jax.random.fold_in(key, 1),
        sample_size=sample_size, level=level,
        hittable_pdf_weight=hittable_pdf_weight,
    )
    return dataclasses.replace(scene, sss=points)
