"""Device-side scene: sorted SoA geometry + BVHs + materials + lights.

TPU-native re-design of the reference's scene-construction pipeline
(`src/main.cu:169-1197`, `src/lib/world.h`): where the reference builds a
device-heap object graph (`new Triangle` per thread) and four pointer-based
BVHs, we ship flat arrays:

* triangles live in ONE SoA, re-ordered by the geometry BVH's Morton order
  so that BVH leaf tests are contiguous vector loads;
* the transparent-geometry subset (for dielectric-stack initialization,
  main.cu:932-1063) is a second, smaller sorted SoA + BVH;
* the emissive subset becomes the light tree (main.cu:1065-1197);
* materials/textures are a `MaterialTable` (one gather per channel).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gpu_pathtracer_tpu.ops import bvh as bvh_mod
from gpu_pathtracer_tpu.ops import intersect, lights, materials
from gpu_pathtracer_tpu.pytree import pytree_dataclass
from gpu_pathtracer_tpu.utils.obj_io import HostScene


@pytree_dataclass(meta=("num_tris",))
class GeometrySet:
    """One BVH + its leaf-ordered triangle SoA (padded to leaves * leaf_size;
    padding rows have valid=False and are never reported as hits)."""

    bvh: bvh_mod.BVH
    p: jnp.ndarray  # (T, 3, 3)
    n: jnp.ndarray  # (T, 3, 3)
    uv: jnp.ndarray  # (T, 3, 2)
    tangent: jnp.ndarray  # (T, 3, 3) NaN where degenerate (triangle.h:427)
    tol: jnp.ndarray  # (T,)
    mat_id: jnp.ndarray  # (T,) int32
    obj_id: jnp.ndarray  # (T,) int32 usemtl-group index (object.h:13)
    valid: jnp.ndarray  # (T,) bool
    tri_cols: jnp.ndarray | None = None  # (NT, 16, TK) Pallas tile SoA
    tile_aabb: jnp.ndarray | None = None  # (NT, 8) Pallas tile AABBs
    # (NT, 16, 3*TK) bf16 Plücker edge weights for the MXU prefilter
    # (pack_edge_cols); populated on big scenes when GPT_TPU_MXU=1
    edge_cols: jnp.ndarray | None = None
    # packed per-triangle shading attributes [p(9) n(9) uv(6) tol(1) mat(1)]
    # so one winner-row gather feeds bary + interpolation (gathers, not the
    # traversal kernel, dominate the forward wavefront on TPU)
    attr: jnp.ndarray | None = None  # (T, 26) f32
    num_tris: int = 0


@pytree_dataclass
class SSSPoints:
    """Surface point cloud for sub-surface scattering (Point, point.h:10-87):
    one flat array across all SSS objects, gathered by object id."""

    pos: jnp.ndarray  # (S, 3)
    normal: jnp.ndarray  # (S, 3)
    filter: jnp.ndarray  # (S, 3) kd texture at the sample (object_operations.h:136)
    color: jnp.ndarray  # (S, 3) cached irradiance*albedo (first pass)
    obj_id: jnp.ndarray  # (S,) int32
    valid: jnp.ndarray  # (S,) bool


@pytree_dataclass(meta=("num_lights", "has_sky_tex", "sky_h", "sky_w"))
class Scene:
    geom: GeometrySet
    transparent: GeometrySet | None
    light_tree: lights.LightTree | None
    materials: materials.MaterialTable
    sky_emission: jnp.ndarray  # (3,)
    sky_rgb: jnp.ndarray  # (P, 3) equirect env image (1 px white default)
    sss: SSSPoints | None = None
    num_lights: int = 0
    has_sky_tex: bool = False
    sky_h: int = 1
    sky_w: int = 1


import functools

import jax


@functools.partial(jax.jit, static_argnames=("leaf_size",))
def _device_build(p, n, uv, tangent, mat_id, obj_id, leaf_size):
    """The whole device-side geometry build as ONE jitted program: BVH +
    leaf-order gathers + tolerances + Pallas tile packing.  Eager per-op
    dispatch here is minutes of compile round-trips at 300k+ triangles on a
    remote-compile TPU backend; one program is one compile."""
    from gpu_pathtracer_tpu.ops import pallas_trace

    pmin = jnp.min(p, axis=1)
    pmax = jnp.max(p, axis=1)
    bvh = bvh_mod.build_bvh(pmin, pmax, leaf_size=leaf_size)
    safe = jnp.maximum(bvh.order, 0)
    valid = bvh.order >= 0
    p_sorted = p[safe]
    tol_sorted = intersect.triangle_tolerance(p_sorted)
    tri_cols, tile_aabb = pallas_trace.pack_tri_cols(p_sorted, tol_sorted, valid)
    edge_cols = None
    if pallas_trace.MXU_PREFILTER and p.shape[0] > pallas_trace.PALLAS_MAX:
        edge_cols = pallas_trace.pack_edge_cols(p_sorted, valid)
    mat_sorted = jnp.where(valid, mat_id[safe], 0).astype(jnp.int32)
    uv_sorted = uv[safe]
    n_sorted = n[safe]
    attr = jnp.concatenate(
        [
            p_sorted.reshape(-1, 9),
            n_sorted.reshape(-1, 9),
            uv_sorted.reshape(-1, 6),
            tol_sorted[:, None],
            mat_sorted.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )
    return GeometrySet(
        bvh=bvh,
        p=p_sorted,
        n=n_sorted,
        uv=uv_sorted,
        tangent=tangent[safe],
        tol=tol_sorted,
        mat_id=mat_sorted,
        obj_id=jnp.where(valid, obj_id[safe], -1).astype(jnp.int32),
        valid=valid,
        tri_cols=tri_cols,
        tile_aabb=tile_aabb,
        edge_cols=edge_cols,
        attr=attr,
        num_tris=p.shape[0],
    )


def _build_geometry_set(
    tri_p: np.ndarray,
    tri_n: np.ndarray,
    tri_uv: np.ndarray,
    tri_tangent: np.ndarray,
    mat_id: np.ndarray,
    obj_id: np.ndarray,
    leaf_size: int,
) -> GeometrySet:
    return _device_build(
        jnp.asarray(tri_p, jnp.float32),
        jnp.asarray(tri_n, jnp.float32),
        jnp.asarray(tri_uv, jnp.float32),
        jnp.asarray(tri_tangent, jnp.float32),
        jnp.asarray(mat_id, jnp.int32),
        jnp.asarray(obj_id, jnp.int32),
        leaf_size=leaf_size,
    )


def build_scene(
    host: HostScene,
    sky_emission=(0.0, 0.0, 0.0),
    sky_image: np.ndarray | None = None,  # (H, W, 3) equirect env map
    leaf_size: int = 4,
) -> Scene:
    """Assemble the device scene from host-parsed arrays.

    Mirrors main.cu's build order: geometry BVH (main.cu:826-928),
    transparent-subset BVH (:932-1063), light tree (:1065-1197).
    """
    table = materials.MaterialTable.from_host(host.materials, host.atlas)

    geom = _build_geometry_set(
        host.tri_p, host.tri_n, host.tri_uv, host.tri_tangent,
        host.mat_idx, host.object_idx, leaf_size,
    )

    # transparent subset (is_transparent <=> t_r > 0, material.h:532-534)
    t_r = host.materials.t_r[host.mat_idx]
    trans_mask = t_r > 0
    transparent = None
    if trans_mask.any():
        idx = np.nonzero(trans_mask)[0]
        transparent = _build_geometry_set(
            host.tri_p[idx], host.tri_n[idx], host.tri_uv[idx],
            host.tri_tangent[idx], host.mat_idx[idx], host.object_idx[idx],
            leaf_size,
        )

    # emissive subset -> light tree (emitter test: any vertex Ke-texture
    # nonzero, triangle.h:124-138; energy 2*pi*avgKe*area, triangle.h:112)
    @jax.jit
    def _emission_probe(table, tri_p, tri_uv, mat_idx):
        mat_v = mat_idx[:, None]
        ke = table.emission_color(
            jnp.broadcast_to(mat_v, tri_uv.shape[:2]), tri_uv
        )
        return ke, intersect.triangle_tolerance(tri_p)

    ke_j, tol_j = _emission_probe(
        table,
        jnp.asarray(host.tri_p, jnp.float32),
        jnp.asarray(host.tri_uv, jnp.float32),
        jnp.asarray(host.mat_idx, jnp.int32),
    )
    ke_verts = np.asarray(ke_j)  # (N, 3, 3)
    tol_np = np.asarray(tol_j)
    emissive = (
        np.linalg.norm(ke_verts, axis=-1) > tol_np[:, None]
    ).any(axis=1)
    light_tree = None
    num_lights = 0
    if emissive.any():
        idx = np.nonzero(emissive)[0]
        area = np.asarray(intersect.triangle_area(jnp.asarray(host.tri_p[idx])))
        energy = 2.0 * np.pi * ke_verts[idx].mean(axis=1) * area[:, None]
        # map each emitter to its row in the SORTED main-geometry SoA
        order = np.asarray(geom.bvh.order)
        inv_order = np.full(order.shape, -1, np.int64)
        pos = np.nonzero(order >= 0)[0]
        inv_order[order[pos]] = pos
        light_tree = lights.build_light_tree(
            jnp.asarray(host.tri_p[idx]),
            jnp.asarray(host.tri_n[idx]),
            jnp.asarray(host.tri_uv[idx]),
            jnp.asarray(energy, jnp.float32),
            jnp.asarray(inv_order[idx], jnp.int32),
        )
        num_lights = int(idx.shape[0])

    if sky_image is not None:
        sky_rgb = jnp.asarray(sky_image.reshape(-1, 3), jnp.float32)
        sky_h, sky_w = int(sky_image.shape[0]), int(sky_image.shape[1])
        has_sky_tex = True
    else:
        sky_rgb = jnp.ones((1, 3), jnp.float32)
        sky_h = sky_w = 1
        has_sky_tex = False

    return Scene(
        geom=geom,
        transparent=transparent,
        light_tree=light_tree,
        materials=table,
        sky_emission=jnp.asarray(sky_emission, jnp.float32),
        sky_rgb=sky_rgb,
        num_lights=num_lights,
        has_sky_tex=has_sky_tex,
        sky_h=sky_h,
        sky_w=sky_w,
    )
