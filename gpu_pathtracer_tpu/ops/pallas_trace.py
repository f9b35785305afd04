"""Pallas TPU kernels for ray/triangle queries (closest hit + any hit).

The hot queries of the whole renderer (the reference spends its time in
`traverse_bvh` + `Triangle::hit`, bvh_traversal.h:12-84 / triangle.h:343-408,
and in the photon-gather visibility re-check, bvh_traversal_photon.h:140-156).
The kernels evaluate the watertight Woop test for (ray-block x tri-tile)
pairs entirely in VMEM:

* grid over ray blocks; each program loops over Morton-ordered triangle
  tiles front-to-back with an early-exit bound — one kernel, no HBM
  round-trips between tiles;
* two-level hierarchical culling: (1) per-tile AABB slab test — a block
  skips the whole pair-tile when none of its rays' slabs intersect it; and
  (2) per-SUB-tile (128-lane) AABB culling INSIDE a visited tile — the
  sub-tile boxes ride the spare rows 10-15 of the tile SoA, so they are
  DMA'd with the tile for free and cut the wasted pair compute when only a
  corner of a tile is relevant (the TPU answer to a BVH's log-depth
  descent, bvh_traversal.h:12-84);
* triangles live in VMEM as a (16, T) column SoA so per-triangle values are
  natural (1, TK) lane vectors; rays as (RB, 8) rows so per-ray values are
  (RB, 1) sublane vectors — the pair math is pure (RB, TK) VPU broadcasting;
* the argmin is two lane reductions (min, then first-lane-equal) — Mosaic
  has no native argmin.

Zero-padding invalid triangle rows makes them det==0 misses, so no validity
mask enters the kernel.  Outputs are piecewise-constant in upstream
parameters (hit topology), so the wrapper stops gradients — barycentrics of
the winner are recomputed differentiably outside (ops/trace.py).

The any-hit kernel (`occluded_window_pallas`) answers the photon-gather
visibility query (reference: `geom_hit && rec.t > len`,
bvh_traversal_photon.h:151) as two bits per ray — "any hit with t <= near"
and "any hit at all (t <= root-box exit)" — resolving each ray at its FIRST
accepted hit instead of refining a best-t carry; a block exits as soon as
every ray is resolved.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = int(os.environ.get("GPT_TPU_RAY_BLOCK", "256"))
TRI_TILE = int(os.environ.get("GPT_TPU_TRI_TILE", "512"))
# HBM-resident (big-scene) kernels use their own block/tile geometry: the
# r05 sweep on the 327k-tri bench (scripts/profile_meshcfg.py) found
# (TRI_TILE=2048, RAY_BLOCK=128) 46% faster than the VMEM-path's (512, 256)
# — bigger tiles amortize the per-tile loop/DMA overhead, smaller ray
# blocks tighten the block frustum so the front-to-back early exit fires
# sooner.  Sub-tile culling (GPT_TPU_SUBCULL=1) measured NET NEGATIVE at
# every (tile, block) tried: within a visited tile the Morton-adjacent
# sub-tiles almost always pass their own slab test, so the per-sub-tile
# branch + box reductions cost more than the pruned Woop work.
RAY_BLOCK_BIG = int(os.environ.get("GPT_TPU_RAY_BLOCK_BIG", "128"))
TRI_TILE_BIG = int(os.environ.get("GPT_TPU_TRI_TILE_BIG", "2048"))
# Double-buffered DMA in the HBM-resident kernel: tile j+1's fetch overlaps
# tile j's pair compute.  ON by default since r04 (+5% on the 327k-tri
# bench, bit-exact vs the threaded-BVH render in check_tpu_parity.py).
# Read at IMPORT time (the call wrappers are jitted, so a later in-process
# toggle would silently hit the jit cache) — like PALLAS_MAX and the other
# knobs, set it before import.
DMA_PIPE = os.environ.get("GPT_TPU_DMA_PIPE", "1") != "0"
# Sub-tile (128-lane) AABB culling inside visited tiles; rows 10-15 of the
# tile SoA carry the sub-tile boxes.  Default OFF — measured net negative
# on the mesh bench at every config (see the RAY_BLOCK_BIG note above);
# kept selectable for future scenes where in-tile occupancy is sparse.
SUBCULL = os.environ.get("GPT_TPU_SUBCULL", "0") != "0"
# MXU (bf16 matmul) edge-test prefilter for the HBM-resident closest-hit
# kernel: a (RB, 16) x (16, 3T) bf16 dot computes all three Plücker edge
# values per (ray, triangle) pair on the MXU; a sub-tile only runs the exact
# Woop test when some pair's edge values are sign-consistent WITHIN a
# conservative error margin, so the output is bit-identical to the
# unfiltered kernel (the margin provably covers the bf16 rounding — see
# pack_edge_cols).  Unlike the AABB sub-cull (geometric, tile-granular,
# measured net negative) this tests the actual triangles, so it can cull
# below the "frustum-irreducible" tile bound of scripts/tile_visit_stats.py.
# Requires GPT_TPU_DMA_PIPE=1 (the default).  Read at import time.
MXU_PREFILTER = os.environ.get("GPT_TPU_MXU", "0") != "0"
# 2^-6: twice the worst-case relative-error bound of the bf16 pipeline
# (inputs rounded to bf16: rel err <= 2^-8 each, product <= ~2^-7, f32
# accumulation negligible), applied to the outer bound rmax_i * wsum_j >=
# sum_k |r_ik||w_kj| >= |error_ij|.
_MXU_MARGIN = 2.0 ** -6
SUB_LANES = 128
_INF = 3.4e38  # plain float: jnp scalars would be captured consts in the kernel
# Conservative slack on the front-to-back lower bound: fl(bmin - bhi) can
# exceed the true slab entry t by ~1 ulp (and normalized directions carry
# ~1 ulp of their own), so a tile holding a hit marginally closer than
# best_t could otherwise be culled right at the exit boundary.  lb >= 0, so
# scaling it down is strictly conservative, and a positive scale preserves
# the host sort order the early-exit argument relies on.
_LB_SLACK = 1.0 - 1e-6


def _n_sub(tile: int) -> int:
    if SUBCULL and tile > SUB_LANES and tile % SUB_LANES == 0:
        return tile // SUB_LANES
    return 1


# mirror of ops/trace.py's GPT_TPU_PALLAS_MAX (the VMEM-resident cap): the
# packer must pick the big-path tile geometry for exactly the scenes the
# dispatcher will route to the HBM-resident kernels
PALLAS_MAX = int(os.environ.get("GPT_TPU_PALLAS_MAX", "131072"))


def pack_tri_cols(p, tol, valid, tile: int | None = None):
    """(T, 3, 3) triangles -> (NT, 16, TK) f32 tile SoA + (NT, 8) tile AABBs.

    Per tile, rows 0-8 are v1xyz v2xyz v3xyz columns, row 9 the per-triangle
    tolerance.  Rows 10-15 carry the AABB (min xyz, max xyz) of the column's
    128-lane SUB-tile, broadcast across its lanes — the kernels reduce them
    back to scalars for the in-tile sub-cull (empty sub-tiles get inverted
    boxes, so their slab test always fails).  Invalid triangle rows are
    zeroed (degenerate -> det == 0 -> miss).  Tile-major layout so the
    kernel indexes tiles on the array's major dim (the Mosaic-native
    dynamic index).

    `tile=None` picks the dispatch-matched geometry: TRI_TILE_BIG for
    scenes the HBM-resident kernels will serve (> PALLAS_MAX triangles),
    TRI_TILE for VMEM-resident ones.
    """
    t = p.shape[0]
    if tile is None:
        tile = TRI_TILE_BIG if t > PALLAS_MAX else TRI_TILE
    pad = (-t) % tile
    pz = jnp.where(valid[:, None, None], p, 0.0)
    tolz = jnp.where(valid, tol, jnp.inf)
    if pad:
        pz = jnp.concatenate([pz, jnp.zeros((pad, 3, 3), p.dtype)])
        tolz = jnp.concatenate([tolz, jnp.full((pad,), jnp.inf)])
    tp = t + pad
    nt = tp // tile
    big = jnp.float32(3.4e38)
    vflat = jnp.concatenate([valid, jnp.zeros((pad,), bool)])

    # per-sub-tile AABBs -> rows 10-15 (min xyz then max xyz per column)
    if tile % SUB_LANES == 0:
        nsub = tp // SUB_LANES
        sub = pz.reshape(nsub, SUB_LANES, 3, 3)
        sv = vflat.reshape(nsub, SUB_LANES, 1, 1)
        smin = jnp.min(jnp.where(sv, sub, big), axis=(1, 2))  # (nsub, 3)
        smax = jnp.max(jnp.where(sv, sub, -big), axis=(1, 2))
        sub_rows = jnp.repeat(
            jnp.concatenate([smin, smax], axis=1), SUB_LANES, axis=0
        ).T  # (6, Tpad)
    else:
        sub_rows = jnp.zeros((6, tp), jnp.float32)

    cols = jnp.concatenate(
        [pz.reshape(tp, 9).T, tolz[None, :], sub_rows], axis=0
    )  # (16, Tpad)
    cols = cols.reshape(16, nt, tile).transpose(1, 0, 2)  # (NT, 16, TK)

    # per-tile AABBs (all-invalid tiles get inverted boxes -> never hit)
    tiles = pz.reshape(nt, tile, 3, 3)
    vmask = vflat.reshape(nt, tile, 1, 1)
    tmin = jnp.min(jnp.where(vmask, tiles, big), axis=(1, 2))  # (NT, 3)
    tmax = jnp.max(jnp.where(vmask, tiles, -big), axis=(1, 2))
    aabb = jnp.concatenate(
        [tmin, tmax, jnp.zeros((nt, 2), jnp.float32)], axis=1
    )  # (NT, 8)
    return cols, aabb


def pack_edge_cols(p, valid, tile: int | None = None):
    """(T, 3, 3) triangles -> (NT, 16, 3*TK) bf16 Plücker edge weights for
    the MXU prefilter (GPT_TPU_MXU).

    Per tile, column m*TK + t (edge m of triangle t) holds, down rows 0-5,
    the edge's Plücker test weights [cross(a, b), b - a] for edge corners
    (a, b) in (v1,v2), (v2,v3), (v3,v1); the ray side reduces the test to
    e = d . cross(a, b) + (o x d) . (b - a) — one K=16 bf16 contraction per
    pair on the MXU (vs ~18 VPU flops in the Woop shear).  A triangle hit
    implies all three edge values share a sign (the same orientation facts
    as the watertight test, triangle.h:369-379, up to a per-ray positive
    scale and a consistent sign flip when the dominant axis is negative).

    Row 6 carries the per-column margin scale wsum_j = sum_k |w_kj|,
    inflated by (1 + 2^-7) so its own bf16 rounding stays conservative:
    the kernel's margin MARGIN * rmax_i * wsum_j bounds the bf16 error
    |E_ij - e*_ij| <= 2^-7 * sum_k |r_ik||w_kj| <= 2^-7 * rmax_i * wsum_j
    with a 2x slack (MARGIN = 2^-6), so the prefilter NEVER culls a pair
    the exact test would accept — the kernel output is bit-identical to the
    unfiltered one.  Invalid/padded triangles get wsum = -1: their zero
    edge values then fail `e >= -margin` (margin < 0), so all-zero columns
    are culled instead of vacuously sign-consistent.  The ray contraction
    slots 6-15 are zero, so row 6 never enters the dot.

    Culling power (not correctness) degrades for scenes far from the world
    origin: |o x d| inflates rmax and every margin with it.  Re-center such
    scenes; the bench/test scenes live near the origin.
    """
    t = p.shape[0]
    if tile is None:
        tile = TRI_TILE_BIG if t > PALLAS_MAX else TRI_TILE
    pad = (-t) % tile
    pz = jnp.where(valid[:, None, None], p, 0.0)
    a = pz  # (T, 3corner, 3)
    b = pz[:, (1, 2, 0), :]
    w6 = jnp.concatenate([jnp.cross(a, b), b - a], axis=-1)  # (T, 3edge, 6)
    wsum = jnp.sum(jnp.abs(w6), axis=-1) * (1.0 + 2.0 ** -7)  # (T, 3)
    wsum = jnp.where(valid[:, None], wsum, -1.0)
    if pad:
        w6 = jnp.concatenate([w6, jnp.zeros((pad, 3, 6), w6.dtype)])
        wsum = jnp.concatenate([wsum, jnp.full((pad, 3), -1.0)])
    tp = t + pad
    nt = tp // tile
    rows = jnp.concatenate([w6, wsum[..., None]], axis=-1)  # (Tp, 3, 7)
    rows = jnp.moveaxis(rows, -1, 0)  # (7, Tp, 3)
    rows = jnp.concatenate([rows, jnp.zeros((9, tp, 3), rows.dtype)], axis=0)
    out = rows.reshape(16, nt, tile, 3).transpose(1, 0, 3, 2)
    return out.reshape(nt, 16, 3 * tile).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# shared in-kernel helpers
# ---------------------------------------------------------------------------

class _Ctx:
    """Per-ray-block precomputed values shared by every tile visit."""

    __slots__ = (
        "rb", "ox", "oy", "oz", "t_cap", "t_near", "dmax", "perm",
        "sx", "sy", "sz", "inv_dx", "inv_dy", "inv_dz",
        "blo_x", "bhi_x", "blo_y", "bhi_y", "blo_z", "bhi_z",
        "mxu_rv", "mxu_rmax",
    )


def _ray_ctx(rays) -> _Ctx:
    c = _Ctx()
    c.rb = rays.shape[0]
    c.ox, c.oy, c.oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx_, dy_, dz_ = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    c.t_cap = rays[:, 6:7]
    c.t_near = rays[:, 7:8]  # any-hit near cap; zeros for closest-hit rays

    # dominant-axis permutation (branch-free selects, cf. ops/intersect.py)
    ax, ay, az = jnp.abs(dx_), jnp.abs(dy_), jnp.abs(dz_)
    # Block max |d|_inf: entry t >= cheb_dist / |d|_inf, so the front-to-back
    # bound must be compared as lb < best_t * dmax to stay valid for ray
    # directions of ANY scale (unit directions give dmax ~= 1, a no-op).
    c.dmax = jnp.max(jnp.maximum(jnp.maximum(ax, ay), az))
    is2 = (az >= ax) & (az >= ay)
    is1 = (~is2) & (ay >= ax)
    is0 = ~(is1 | is2)

    def perm(vx, vy, vz):
        x = jnp.where(is0, vy, jnp.where(is1, vz, vx))
        y = jnp.where(is0, vz, jnp.where(is1, vx, vy))
        z = jnp.where(is0, vx, jnp.where(is1, vy, vz))
        return x, y, z

    c.perm = perm
    dx, dy, dz = perm(dx_, dy_, dz_)
    c.sx = -dx / dz
    c.sy = -dy / dz
    c.sz = 1.0 / dz

    # slab-test constants
    c.inv_dx = 1.0 / jnp.where(jnp.abs(dx_) < 1e-20, 1e-20, dx_)
    c.inv_dy = 1.0 / jnp.where(jnp.abs(dy_) < 1e-20, 1e-20, dy_)
    c.inv_dz = 1.0 / jnp.where(jnp.abs(dz_) < 1e-20, 1e-20, dz_)

    # block origin box: the front-to-back lower bound is computed in-kernel
    # (dist(block-origin-box, tile-AABB) <= any contained unit ray's entry t)
    c.blo_x, c.bhi_x = jnp.min(c.ox), jnp.max(c.ox)
    c.blo_y, c.bhi_y = jnp.min(c.oy), jnp.max(c.oy)
    c.blo_z, c.bhi_z = jnp.min(c.oz), jnp.max(c.oz)

    # MXU-prefilter ray side: Plücker [d, o x d] in contraction slots 0-5
    # (slots 6-15 zero so pack_edge_cols' row-6 margin row never enters the
    # dot), plus the per-ray margin scale rmax = max_k |r_k| (f32).
    cx = c.oy * dz_ - c.oz * dy_
    cy = c.oz * dx_ - c.ox * dz_
    cz = c.ox * dy_ - c.oy * dx_
    rv = jnp.concatenate(
        [dx_, dy_, dz_, cx, cy, cz, jnp.zeros((c.rb, 10), jnp.float32)],
        axis=1,
    )
    c.mxu_rv = rv.astype(jnp.bfloat16)
    c.mxu_rmax = jnp.max(jnp.abs(rv[:, 0:6]), axis=1, keepdims=True)
    return c


def _read_box(aabb_ref, ti):
    box = aabb_ref[pl.ds(ti, 1), :]  # (1, 8)
    return (box[0:1, 0:1], box[0:1, 1:2], box[0:1, 2:3],
            box[0:1, 3:4], box[0:1, 4:5], box[0:1, 5:6])


def _tile_lb(ctx: _Ctx, b):
    """Chebyshev lower bound on any ray's entry t into this box; the host
    sorted tiles by the SAME formula (exact IEEE max/sub, so the values
    agree bit-for-bit) — once it stops improving, no later tile can either,
    and the loop exits."""
    bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z = b
    return jnp.max(
        jnp.maximum(
            jnp.maximum(
                jnp.maximum(bmin_x - ctx.bhi_x, ctx.blo_x - bmax_x),
                jnp.maximum(bmin_y - ctx.bhi_y, ctx.blo_y - bmax_y),
            ),
            jnp.maximum(
                jnp.maximum(bmin_z - ctx.bhi_z, ctx.blo_z - bmax_z), 0.0
            ),
        )
    )


def _slab_any(ctx: _Ctx, b, budget):
    """Does ANY ray's slab hit this box within its (per-ray) budget?
    max(tlo, 0) is the tightest entry bound (hits need t >= tol > 0); it
    also makes a dead ray's budget of -1 cull every box even when its
    origin sits inside the box (negative tlo)."""
    bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z = b
    t0x = (bmin_x - ctx.ox) * ctx.inv_dx
    t1x = (bmax_x - ctx.ox) * ctx.inv_dx
    t0y = (bmin_y - ctx.oy) * ctx.inv_dy
    t1y = (bmax_y - ctx.oy) * ctx.inv_dy
    t0z = (bmin_z - ctx.oz) * ctx.inv_dz
    t1z = (bmax_z - ctx.oz) * ctx.inv_dz
    tlo = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    thi = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    return jnp.any(
        (thi >= tlo) & (thi > 0.0) & (jnp.maximum(tlo, 0.0) < budget)
    )


def _sub_box(tvk):
    """Sub-tile AABB scalars from the (equal-valued) rows 10-15 of a
    128-lane column slice.  One lane reduction per component."""
    return tuple(jnp.max(tvk[10 + i: 11 + i, :]) for i in range(6))


def _woop_tri_t(ctx: _Ctx, tvk):
    """Watertight Woop test of the block's rays against one column slice.
    Returns (t, base_ok): (RB, F) candidate ts and the validity mask before
    any per-query windowing (det != 0, not mixed-sign, t >= tol)."""
    tri_tol = tvk[9:10, :]

    def corner(cidx):
        vx = tvk[3 * cidx + 0: 3 * cidx + 1, :] - ctx.ox  # (RB, F)
        vy = tvk[3 * cidx + 1: 3 * cidx + 2, :] - ctx.oy
        vz = tvk[3 * cidx + 2: 3 * cidx + 3, :] - ctx.oz
        px, py, pz_ = ctx.perm(vx, vy, vz)
        return px + ctx.sx * pz_, py + ctx.sy * pz_, pz_ * ctx.sz

    x1, y1, z1 = corner(0)
    x2, y2, z2 = corner(1)
    x3, y3, z3 = corner(2)
    e1 = x2 * y3 - y2 * x3
    e2 = x3 * y1 - y3 * x1
    e3 = x1 * y2 - y1 * x2
    mixed = ((e1 < 0) | (e2 < 0) | (e3 < 0)) & (
        (e1 > 0) | (e2 > 0) | (e3 > 0)
    )
    det = e1 + e2 + e3
    ts = e1 * z1 + e2 * z2 + e3 * z3
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    t = ts * inv_det
    base_ok = (~mixed) & (det != 0.0) & (t >= tri_tol)
    return t, base_ok


def _pair_compute(ctx: _Ctx, tv, slot_base, best_t, best_slot, *, tile: int):
    """Closest-hit pair compute over one (16, tile) tile, sub-tile-culled:
    each 128-lane sub-tile is slab-tested against its own AABB (rows 10-15)
    before the Woop test, and best_t tightens between sub-tiles."""
    nsub = _n_sub(tile)
    f = tile // nsub
    lane = jax.lax.broadcasted_iota(jnp.int32, (ctx.rb, f), 1)

    def woop(tvk, base, carry):
        best_t, best_slot = carry
        t, base_ok = _woop_tri_t(ctx, tvk)
        hit = base_ok & (t < best_t) & (t <= ctx.t_cap)
        t = jnp.where(hit, t, _INF)
        t_min = jnp.min(t, axis=1, keepdims=True)  # (RB, 1)
        k = jnp.min(
            jnp.where(t == t_min, lane, jnp.int32(2**30)),
            axis=1,
            keepdims=True,
        )
        better = t_min < best_t
        best_t = jnp.where(better, t_min, best_t)
        best_slot = jnp.where(better, base + k, best_slot)
        return best_t, best_slot

    if nsub == 1:
        return woop(tv, slot_base, (best_t, best_slot))
    for ks in range(nsub):
        tvk = tv[:, ks * f:(ks + 1) * f]
        ok = _slab_any(ctx, _sub_box(tvk), best_t)
        best_t, best_slot = jax.lax.cond(
            ok,
            functools.partial(woop, tvk, slot_base + ks * f),
            lambda c: c,
            (best_t, best_slot),
        )
    return best_t, best_slot


def _pair_compute_mxu(ctx: _Ctx, tv, ev, slot_base, bt_ref, bs_ref,
                      *, tile: int):
    """Closest-hit pair compute with the MXU edge-test prefilter: one
    (RB, 16) x (16, 3*tile) bf16 dot evaluates every pair's three Plücker
    edge values; a 128-lane sub-tile runs the exact Woop test only when some
    live pair is sign-consistent within the conservative margin (see
    pack_edge_cols — the margin guarantees no true hit is ever skipped, so
    results are bit-identical to _pair_compute's).

    best-t / best-slot live in VMEM refs (`bt_ref`/`bs_ref`), NOT loop
    carries: the per-sub-tile skips are `pl.when` blocks that mutate them in
    place.  The lax.cond-with-vector-carries form measured ~1.8x SLOWER
    than no prefilter at all — Mosaic materializes the carry merge on both
    paths of every cond, which is exactly the overhead that sank the
    geometric sub-tile cull (see the RAY_BLOCK_BIG note)."""
    diag = os.environ.get("GPT_TPU_MXU_DIAG", "")
    if diag == "nomatmul":
        cand = jnp.ones((ctx.rb, tile), bool)
    else:
        e_all = jax.lax.dot_general(
            ctx.mxu_rv, ev, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (RB, 3*tile) f32
        dhat = ev[6:7, :].astype(jnp.float32)  # (1, 3*tile) wsum (-1 invalid)
        margin = (_MXU_MARGIN * ctx.mxu_rmax) * dhat  # (RB, 3*tile)
        e0, e1, e2 = (e_all[:, :tile], e_all[:, tile:2 * tile],
                      e_all[:, 2 * tile:])
        m0, m1, m2 = (margin[:, :tile], margin[:, tile:2 * tile],
                      margin[:, 2 * tile:])
        pos = (e0 >= -m0) & (e1 >= -m1) & (e2 >= -m2)
        neg = (e0 <= m0) & (e1 <= m1) & (e2 <= m2)
        cand = (pos | neg) & (bt_ref[:] > 0.0)  # dead rays (budget -1) cull

    f = SUB_LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, (ctx.rb, f), 1)

    for ks in range(tile // f):
        ok = jnp.any(cand[:, ks * f:(ks + 1) * f])

        @pl.when(ok)
        def _(ks=ks):
            tvk = tv[:, ks * f:(ks + 1) * f]
            best_t = bt_ref[:]
            t, base_ok = _woop_tri_t(ctx, tvk)
            hit = base_ok & (t < best_t) & (t <= ctx.t_cap)
            t = jnp.where(hit, t, _INF)
            t_min = jnp.min(t, axis=1, keepdims=True)
            k = jnp.min(
                jnp.where(t == t_min, lane, jnp.int32(2**30)),
                axis=1,
                keepdims=True,
            )
            better = t_min < best_t
            bt_ref[:] = jnp.where(better, t_min, best_t)
            bs_ref[:] = jnp.where(
                better, slot_base + ks * f + k, bs_ref[:]
            )


def _pair_anyhit(ctx: _Ctx, tv, occ_near, occ_far, budget, *, tile: int):
    """Any-hit pair compute: sets per-ray bits for "hit with t <= near cap"
    and "hit with t <= far cap" (rows 7 / 6 of the ray block).  `budget` is
    the per-ray remaining window top (-1 for resolved rays), used for the
    sub-tile culls only.  The bits are int32 0/1 vectors, NOT bool: Mosaic
    fails to legalize `scf.if` whose results include i1 vectors (the
    closest-hit kernels' f32/i32 carries never hit this)."""
    nsub = _n_sub(tile)
    f = tile // nsub

    def woop(tvk, carry):
        occ_near, occ_far = carry
        t, base_ok = _woop_tri_t(ctx, tvk)
        hit_far = base_ok & (t <= ctx.t_cap)
        # STRICT < so `occ_far & ~occ_near` with t_near = len*(1-tol) equals
        # the closest-hit verdict `hit & (t >= len*(1-tol))` bit-for-bit
        hit_near = hit_far & (t < ctx.t_near)
        occ_far = jnp.maximum(
            occ_far, jnp.any(hit_far, axis=1, keepdims=True).astype(jnp.int32)
        )
        occ_near = jnp.maximum(
            occ_near,
            jnp.any(hit_near, axis=1, keepdims=True).astype(jnp.int32),
        )
        return occ_near, occ_far

    if nsub == 1:
        return woop(tv, (occ_near, occ_far))
    for ks in range(nsub):
        tvk = tv[:, ks * f:(ks + 1) * f]
        ok = _slab_any(ctx, _sub_box(tvk), budget)
        occ_near, occ_far = jax.lax.cond(
            ok,
            functools.partial(woop, tvk),
            lambda c: c,
            (occ_near, occ_far),
        )
    return occ_near, occ_far


# ---------------------------------------------------------------------------
# closest-hit kernels
# ---------------------------------------------------------------------------

def _closest_kernel(order_ref, rays_ref, tris_ref, aabb_ref,
                    out_t_ref, out_slot_ref, *, n_tiles: int, tile: int):
    """VMEM-resident kernel: whole triangle SoA lives in VMEM; tiles are
    visited front-to-back (`order_ref` is scalar-prefetched SMEM, flat
    (local_blocks * NT,)) with the early-exit bound recomputed in-kernel."""
    i = pl.program_id(0)
    ctx = _ray_ctx(rays_ref[:])

    def loop_cond(carry):
        j, best_t, best_slot = carry
        return j < n_tiles

    def tile_body(carry):
        j, best_t, best_slot = carry  # (RB, 1) f32 / int32
        ti = order_ref[i * n_tiles + j]
        b = _read_box(aabb_ref, ti)
        improve = _tile_lb(ctx, b) * _LB_SLACK < jnp.max(best_t) * ctx.dmax
        any_hit = improve & _slab_any(ctx, b, best_t)

        def compute(carry):
            return _pair_compute(
                ctx, tris_ref[ti], ti * tile, *carry, tile=tile
            )

        best_t, best_slot = jax.lax.cond(
            any_hit, compute, lambda c: c, (best_t, best_slot)
        )
        j_next = jnp.where(improve, j + 1, jnp.int32(n_tiles))
        return j_next, best_t, best_slot

    best_t0 = jnp.minimum(jnp.full((ctx.rb, 1), _INF), ctx.t_cap)
    best_slot0 = jnp.full((ctx.rb, 1), -1, jnp.int32)
    _, best_t, best_slot = jax.lax.while_loop(
        loop_cond, tile_body, (jnp.int32(0), best_t0, best_slot0)
    )
    out_t_ref[:] = best_t
    out_slot_ref[:] = best_slot


def _closest_kernel_big(order_ref, rays_ref, aabb_ref, tris_hbm,
                        out_t_ref, out_slot_ref, scratch_ref, sem_ref,
                        *, n_tiles: int, tile: int):
    """HBM-resident variant: triangle tiles stay in HBM and are DMA'd into a
    VMEM scratch tile ONLY when the block-level AABB cull passes — VMEM holds
    just the per-tile AABBs (32 B/tile) + one scratch tile, so the triangle
    count is bounded by HBM, not VMEM (the resident kernel caps at
    PALLAS_MAX = 8 MB of VMEM).  The wrapper chunks the grid so the SMEM
    order table stays bounded."""
    i = pl.program_id(0)
    ctx = _ray_ctx(rays_ref[:])

    def loop_cond(carry):
        j, best_t, best_slot = carry
        return j < n_tiles

    def tile_body(carry):
        j, best_t, best_slot = carry
        ti = order_ref[i * n_tiles + j]
        b = _read_box(aabb_ref, ti)
        improve = _tile_lb(ctx, b) * _LB_SLACK < jnp.max(best_t) * ctx.dmax
        any_hit = improve & _slab_any(ctx, b, best_t)

        @pl.when(any_hit)
        def _():
            dma = pltpu.make_async_copy(
                tris_hbm.at[ti], scratch_ref, sem_ref
            )
            dma.start()
            dma.wait()

        def compute(carry):
            return _pair_compute(
                ctx, scratch_ref[:], ti * tile, *carry, tile=tile
            )

        best_t, best_slot = jax.lax.cond(
            any_hit, compute, lambda c: c, (best_t, best_slot)
        )
        j_next = jnp.where(improve, j + 1, jnp.int32(n_tiles))
        return j_next, best_t, best_slot

    best_t0 = jnp.minimum(jnp.full((ctx.rb, 1), _INF), ctx.t_cap)
    best_slot0 = jnp.full((ctx.rb, 1), -1, jnp.int32)
    _, best_t, best_slot = jax.lax.while_loop(
        loop_cond, tile_body, (jnp.int32(0), best_t0, best_slot0)
    )
    out_t_ref[:] = best_t
    out_slot_ref[:] = best_slot


def _closest_kernel_big_pipe(order_ref, rays_ref, aabb_ref, tris_hbm,
                             out_t_ref, out_slot_ref, scratch_ref, sem_ref,
                             *, n_tiles: int, tile: int):
    """Double-buffered variant of _closest_kernel_big: tile j+1's DMA is
    started (into the other scratch slot) before tile j's pair compute, so
    HBM latency overlaps the VPU work.  The prefetch decision for j+1 uses
    the best_t from before tile j's update — conservative (best_t only
    shrinks), so at worst one extra tile is fetched, never one missed.
    Every started DMA is waited exactly once: the start decision (`ah`)
    rides the loop carry to the consuming iteration."""
    i = pl.program_id(0)
    ctx = _ray_ctx(rays_ref[:])

    def probe(jn, best_t):
        """Would tile order[jn] need pair work (with the CURRENT best_t)?"""
        ti = order_ref[i * n_tiles + jnp.minimum(jn, n_tiles - 1)]
        b = _read_box(aabb_ref, ti)
        ok = (
            (jn < n_tiles)
            & (_tile_lb(ctx, b) * _LB_SLACK < jnp.max(best_t) * ctx.dmax)
            & _slab_any(ctx, b, best_t)
        )
        return ok, ti

    def start_dma(ti, slot):
        pltpu.make_async_copy(
            tris_hbm.at[ti], scratch_ref.at[slot], sem_ref.at[slot]
        ).start()

    best_t0 = jnp.minimum(jnp.full((ctx.rb, 1), _INF), ctx.t_cap)
    best_slot0 = jnp.full((ctx.rb, 1), -1, jnp.int32)

    ah0, ti0 = probe(jnp.int32(0), best_t0)

    @pl.when(ah0)
    def _():
        start_dma(ti0, 0)

    def loop_cond(carry):
        j, ah, ti_cur, best_t, best_slot = carry
        return j < n_tiles

    def tile_body(carry):
        j, ah, ti_cur, best_t, best_slot = carry
        b = _read_box(aabb_ref, ti_cur)
        improve = _tile_lb(ctx, b) * _LB_SLACK < jnp.max(best_t) * ctx.dmax

        # prefetch tile j+1 into the other slot while j computes below;
        # suppressed when exiting so no DMA is left in flight
        ah_next, ti_next = probe(j + 1, best_t)
        ah_next = ah_next & improve

        @pl.when(ah_next)
        def _():
            start_dma(ti_next, (j + 1) % 2)

        # consume tile j (wait pairs exactly with the start that set `ah`)
        @pl.when(ah)
        def _():
            pltpu.make_async_copy(
                tris_hbm.at[ti_cur], scratch_ref.at[j % 2], sem_ref.at[j % 2]
            ).wait()

        def compute(carry):
            return _pair_compute(
                ctx, scratch_ref[j % 2], ti_cur * tile, *carry, tile=tile
            )

        best_t, best_slot = jax.lax.cond(
            ah & improve, compute, lambda c: c, (best_t, best_slot)
        )
        j_next = jnp.where(improve, j + 1, jnp.int32(n_tiles))
        return j_next, ah_next, ti_next, best_t, best_slot

    _, _, _, best_t, best_slot = jax.lax.while_loop(
        loop_cond,
        tile_body,
        (jnp.int32(0), ah0, ti0, best_t0, best_slot0),
    )
    out_t_ref[:] = best_t
    out_slot_ref[:] = best_slot


def _closest_kernel_big_pipe_mxu(order_ref, rays_ref, aabb_ref, tris_hbm,
                                 edges_hbm, out_t_ref, out_slot_ref,
                                 scratch_ref, sem_ref, escratch_ref, esem_ref,
                                 *, n_tiles: int, tile: int):
    """_closest_kernel_big_pipe with the MXU edge-test prefilter: each
    visited tile additionally DMAs its (16, 3*tile) bf16 Plücker weight
    block (pack_edge_cols) alongside the Woop SoA, and pair compute goes
    through _pair_compute_mxu.  Same double-buffered start/wait discipline,
    applied to both copies.  best-t / best-slot accumulate IN the output
    refs (pl.when mutation), so the while loop carries only scalars — see
    _pair_compute_mxu for why lax.cond vector carries are fatal here."""
    i = pl.program_id(0)
    ctx = _ray_ctx(rays_ref[:])
    out_t_ref[:] = jnp.minimum(jnp.full((ctx.rb, 1), _INF), ctx.t_cap)
    out_slot_ref[:] = jnp.full((ctx.rb, 1), -1, jnp.int32)

    def probe(jn, best_t):
        ti = order_ref[i * n_tiles + jnp.minimum(jn, n_tiles - 1)]
        b = _read_box(aabb_ref, ti)
        ok = (
            (jn < n_tiles)
            & (_tile_lb(ctx, b) * _LB_SLACK < jnp.max(best_t) * ctx.dmax)
            & _slab_any(ctx, b, best_t)
        )
        return ok, ti

    def start_dma(ti, slot):
        pltpu.make_async_copy(
            tris_hbm.at[ti], scratch_ref.at[slot], sem_ref.at[slot]
        ).start()
        pltpu.make_async_copy(
            edges_hbm.at[ti], escratch_ref.at[slot], esem_ref.at[slot]
        ).start()

    def wait_dma(ti, slot):
        pltpu.make_async_copy(
            tris_hbm.at[ti], scratch_ref.at[slot], sem_ref.at[slot]
        ).wait()
        pltpu.make_async_copy(
            edges_hbm.at[ti], escratch_ref.at[slot], esem_ref.at[slot]
        ).wait()

    ah0, ti0 = probe(jnp.int32(0), out_t_ref[:])

    @pl.when(ah0)
    def _():
        start_dma(ti0, 0)

    def loop_cond(carry):
        j, ah, ti_cur = carry
        return j < n_tiles

    def tile_body(carry):
        j, ah, ti_cur = carry
        best_t = out_t_ref[:]
        b = _read_box(aabb_ref, ti_cur)
        improve = _tile_lb(ctx, b) * _LB_SLACK < jnp.max(best_t) * ctx.dmax

        ah_next, ti_next = probe(j + 1, best_t)
        ah_next = ah_next & improve

        @pl.when(ah_next)
        def _():
            start_dma(ti_next, (j + 1) % 2)

        @pl.when(ah)
        def _():
            wait_dma(ti_cur, j % 2)

        @pl.when(ah & improve)
        def _():
            _pair_compute_mxu(
                ctx, scratch_ref[j % 2], escratch_ref[j % 2],
                ti_cur * tile, out_t_ref, out_slot_ref, tile=tile
            )

        j_next = jnp.where(improve, j + 1, jnp.int32(n_tiles))
        return j_next, ah_next, ti_next

    jax.lax.while_loop(loop_cond, tile_body, (jnp.int32(0), ah0, ti0))


# ---------------------------------------------------------------------------
# any-hit kernels (first accepted hit; no best-t refinement)
# ---------------------------------------------------------------------------

def _anyhit_budget(ctx: _Ctx, occ_near, occ_far):
    """Per-ray remaining window top.  occ_near implies fully resolved
    (near <= far, so a near hit sets both bits): budget -1 culls all its
    work.  A far-resolved ray still needs near hits: budget = near cap.
    The bits are int32 0/1 (see _pair_anyhit)."""
    return jnp.where(
        occ_near != 0, -1.0, jnp.where(occ_far != 0, ctx.t_near, ctx.t_cap)
    )


def _anyhit_kernel(order_ref, rays_ref, tris_ref, aabb_ref,
                   out_near_ref, out_far_ref, *, n_tiles: int, tile: int):
    """VMEM-resident any-hit: per ray, bit0 = any hit with t <= near cap
    (ray row 7), bit1 = any hit with t <= far cap (row 6).  The loop exits
    as soon as every ray is resolved (all budgets -1 -> improve is false)."""
    i = pl.program_id(0)
    ctx = _ray_ctx(rays_ref[:])

    def loop_cond(carry):
        j, occ_near, occ_far = carry
        return j < n_tiles

    def tile_body(carry):
        j, occ_near, occ_far = carry
        ti = order_ref[i * n_tiles + j]
        b = _read_box(aabb_ref, ti)
        budget = _anyhit_budget(ctx, occ_near, occ_far)
        improve = _tile_lb(ctx, b) * _LB_SLACK < jnp.max(budget) * ctx.dmax
        any_hit = improve & _slab_any(ctx, b, budget)

        def compute(carry):
            return _pair_anyhit(
                ctx, tris_ref[ti], *carry, budget, tile=tile
            )

        occ_near, occ_far = jax.lax.cond(
            any_hit, compute, lambda c: c, (occ_near, occ_far)
        )
        j_next = jnp.where(improve, j + 1, jnp.int32(n_tiles))
        return j_next, occ_near, occ_far

    occ0 = jnp.zeros((ctx.rb, 1), jnp.int32)
    _, occ_near, occ_far = jax.lax.while_loop(
        loop_cond, tile_body, (jnp.int32(0), occ0, occ0)
    )
    out_near_ref[:] = occ_near
    out_far_ref[:] = occ_far


def _anyhit_kernel_big(order_ref, rays_ref, aabb_ref, tris_hbm,
                       out_near_ref, out_far_ref, scratch_ref, sem_ref,
                       *, n_tiles: int, tile: int):
    """HBM-resident any-hit with the double-buffered DMA pipeline of
    _closest_kernel_big_pipe."""
    i = pl.program_id(0)
    ctx = _ray_ctx(rays_ref[:])

    def probe(jn, budget):
        ti = order_ref[i * n_tiles + jnp.minimum(jn, n_tiles - 1)]
        b = _read_box(aabb_ref, ti)
        ok = (
            (jn < n_tiles)
            & (_tile_lb(ctx, b) * _LB_SLACK < jnp.max(budget) * ctx.dmax)
            & _slab_any(ctx, b, budget)
        )
        return ok, ti

    def start_dma(ti, slot):
        pltpu.make_async_copy(
            tris_hbm.at[ti], scratch_ref.at[slot], sem_ref.at[slot]
        ).start()

    occ0 = jnp.zeros((ctx.rb, 1), jnp.int32)
    budget0 = _anyhit_budget(ctx, occ0, occ0)
    ah0, ti0 = probe(jnp.int32(0), budget0)

    @pl.when(ah0)
    def _():
        start_dma(ti0, 0)

    def loop_cond(carry):
        j, ah, ti_cur, occ_near, occ_far = carry
        return j < n_tiles

    def tile_body(carry):
        j, ah, ti_cur, occ_near, occ_far = carry
        b = _read_box(aabb_ref, ti_cur)
        budget = _anyhit_budget(ctx, occ_near, occ_far)
        improve = _tile_lb(ctx, b) * _LB_SLACK < jnp.max(budget) * ctx.dmax

        ah_next, ti_next = probe(j + 1, budget)
        ah_next = ah_next & improve

        @pl.when(ah_next)
        def _():
            start_dma(ti_next, (j + 1) % 2)

        @pl.when(ah)
        def _():
            pltpu.make_async_copy(
                tris_hbm.at[ti_cur], scratch_ref.at[j % 2], sem_ref.at[j % 2]
            ).wait()

        def compute(carry):
            return _pair_anyhit(
                ctx, scratch_ref[j % 2], *carry, budget, tile=tile
            )

        occ_near, occ_far = jax.lax.cond(
            ah & improve, compute, lambda c: c, (occ_near, occ_far)
        )
        j_next = jnp.where(improve, j + 1, jnp.int32(n_tiles))
        return j_next, ah_next, ti_next, occ_near, occ_far

    _, _, _, occ_near, occ_far = jax.lax.while_loop(
        loop_cond, tile_body, (jnp.int32(0), ah0, ti0, occ0, occ0)
    )
    out_near_ref[:] = occ_near
    out_far_ref[:] = occ_far


# ---------------------------------------------------------------------------
# call wrappers
# ---------------------------------------------------------------------------

def _smem_blocks(n_tiles: int) -> int:
    """Grid-chunk size keeping the scalar-prefetched order table within
    ~800 KB of the 1 MB SMEM budget.  Even at one block per chunk the table
    is 4 * n_tiles bytes, so past ~200k tiles (~100M tris at TRI_TILE=512)
    it cannot fit — fail with a clear error instead of a Mosaic compile
    failure."""
    if n_tiles > 200_000:
        raise ValueError(
            f"scene has {n_tiles} triangle tiles; the per-block front-to-back "
            f"order table needs {4 * n_tiles} B of SMEM (budget ~800 KB). "
            "Raise GPT_TPU_TRI_TILE or split the scene."
        )
    return max(1, 200_000 // n_tiles)


def _block_tile_order(rays, tile_aabb, n_blocks: int):
    """Per ray-block front-to-back tile order.

    A ray's slab entry t into a tile AABB is >= the Chebyshev (L-inf)
    distance from its origin to the box divided by |d|_inf, which is >= the
    distance from the block's origin bounding box to the tile box divided by
    the block's max |d|_inf — an exact, conservative early-exit bound (the
    kernels recompute the same quantity per visited tile, compare
    lb * _LB_SLACK < best_t * dmax, and stop once no later tile can improve
    any ray's best_t; the argsort order is invariant to both positive
    scalings).  Returns the (n_blocks, NT) int32 tile order.
    """
    o_blocks = rays[:, 0:3].reshape(n_blocks, -1, 3)
    b_lo = jnp.min(o_blocks, axis=1)  # (B, 3)
    b_hi = jnp.max(o_blocks, axis=1)
    t_lo = tile_aabb[:, 0:3]  # (NT, 3)
    t_hi = tile_aabb[:, 3:6]
    gap = jnp.maximum(
        t_lo[None, :, :] - b_hi[:, None, :],
        b_lo[:, None, :] - t_hi[None, :, :],
    )
    lb = jnp.max(jnp.maximum(gap, 0.0), axis=-1)  # (B, NT) L-inf, no overflow
    return jnp.argsort(lb, axis=1).astype(jnp.int32)  # (B, NT)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_call_big(tri_cols, tile_aabb, rays, edge_cols=None,
                      *, interpret: bool):
    r = rays.shape[0]
    n_tiles = tri_cols.shape[0]
    tile = tri_cols.shape[2]
    RAY_BLOCK = RAY_BLOCK_BIG  # big-path block geometry (see knob note)
    n_blocks = r // RAY_BLOCK
    order = _block_tile_order(rays, tile_aabb, n_blocks)
    pipe = DMA_PIPE
    mxu = edge_cols is not None and pipe  # prefilter needs the DMA pipeline
    if mxu:
        kernel = functools.partial(
            _closest_kernel_big_pipe_mxu, n_tiles=n_tiles, tile=tile
        )
        scratch_shapes = [
            pltpu.VMEM((2, 16, tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 16, 3 * tile), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    elif pipe:
        kernel = functools.partial(
            _closest_kernel_big_pipe, n_tiles=n_tiles, tile=tile
        )
        scratch_shapes = [
            pltpu.VMEM((2, 16, tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(
            _closest_kernel_big, n_tiles=n_tiles, tile=tile
        )
        scratch_shapes = [
            pltpu.VMEM((16, tile), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    outs_t, outs_slot = [], []
    for c0 in range(0, n_blocks, _smem_blocks(n_tiles)):
        nb = min(_smem_blocks(n_tiles), n_blocks - c0)
        in_specs = [
            pl.BlockSpec(
                (RAY_BLOCK, 8), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tile AABBs (small)
            pl.BlockSpec(memory_space=pl.ANY),  # tri SoA stays in HBM
        ]
        if mxu:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # edge weights
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(
                    (RAY_BLOCK, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (RAY_BLOCK, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            scratch_shapes=scratch_shapes,
        )
        args = (
            order[c0 : c0 + nb].reshape(-1),
            rays[c0 * RAY_BLOCK : (c0 + nb) * RAY_BLOCK],
            tile_aabb,
            tri_cols,
        )
        if mxu:
            args += (edge_cols,)
        o_t, o_s = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((nb * RAY_BLOCK, 1), jnp.float32),
                jax.ShapeDtypeStruct((nb * RAY_BLOCK, 1), jnp.int32),
            ),
            interpret=interpret,
        )(*args)
        outs_t.append(o_t)
        outs_slot.append(o_s)
    out_t = outs_t[0] if len(outs_t) == 1 else jnp.concatenate(outs_t)
    out_slot = (
        outs_slot[0] if len(outs_slot) == 1 else jnp.concatenate(outs_slot)
    )
    return out_t[:, 0], out_slot[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_call(tri_cols, tile_aabb, rays, *, interpret: bool):
    r = rays.shape[0]
    n_tiles = tri_cols.shape[0]
    n_blocks = r // RAY_BLOCK
    order = _block_tile_order(rays, tile_aabb, n_blocks)
    kernel = functools.partial(
        _closest_kernel, n_tiles=n_tiles, tile=tri_cols.shape[2]
    )
    outs_t, outs_slot = [], []
    for c0 in range(0, n_blocks, _smem_blocks(n_tiles)):
        nb = min(_smem_blocks(n_tiles), n_blocks - c0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (RAY_BLOCK, 8), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # full tri SoA
                pl.BlockSpec(memory_space=pltpu.VMEM),  # tile AABBs
            ],
            out_specs=(
                pl.BlockSpec(
                    (RAY_BLOCK, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (RAY_BLOCK, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
        )
        o_t, o_s = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((nb * RAY_BLOCK, 1), jnp.float32),
                jax.ShapeDtypeStruct((nb * RAY_BLOCK, 1), jnp.int32),
            ),
            interpret=interpret,
        )(
            order[c0 : c0 + nb].reshape(-1),
            rays[c0 * RAY_BLOCK : (c0 + nb) * RAY_BLOCK],
            tri_cols,
            tile_aabb,
        )
        outs_t.append(o_t)
        outs_slot.append(o_s)
    out_t = outs_t[0] if len(outs_t) == 1 else jnp.concatenate(outs_t)
    out_slot = (
        outs_slot[0] if len(outs_slot) == 1 else jnp.concatenate(outs_slot)
    )
    return out_t[:, 0], out_slot[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "big"))
def _anyhit_call(tri_cols, tile_aabb, rays, *, interpret: bool, big: bool):
    r = rays.shape[0]
    n_tiles = tri_cols.shape[0]
    tile = tri_cols.shape[2]
    block = RAY_BLOCK_BIG if big else RAY_BLOCK
    n_blocks = r // block
    order = _block_tile_order(rays, tile_aabb, n_blocks)
    if big:
        kernel = functools.partial(
            _anyhit_kernel_big, n_tiles=n_tiles, tile=tile
        )
        scratch_shapes = [
            pltpu.VMEM((2, 16, tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        kernel = functools.partial(_anyhit_kernel, n_tiles=n_tiles, tile=tile)
        scratch_shapes = []
        tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs_near, outs_far = [], []
    for c0 in range(0, n_blocks, _smem_blocks(n_tiles)):
        nb = min(_smem_blocks(n_tiles), n_blocks - c0)
        if big:
            in_specs = [
                pl.BlockSpec(
                    (block, 8), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # tile AABBs
                tri_spec,
            ]
        else:
            in_specs = [
                pl.BlockSpec(
                    (block, 8), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
                tri_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),  # tile AABBs
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(
                    (block, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (block, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            scratch_shapes=scratch_shapes,
        )
        args = (
            order[c0 : c0 + nb].reshape(-1),
            rays[c0 * block : (c0 + nb) * block],
        )
        args += (tile_aabb, tri_cols) if big else (tri_cols, tile_aabb)
        o_n, o_f = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((nb * block, 1), jnp.int32),
                jax.ShapeDtypeStruct((nb * block, 1), jnp.int32),
            ),
            interpret=interpret,
        )(*args)
        outs_near.append(o_n)
        outs_far.append(o_f)
    out_n = outs_near[0] if len(outs_near) == 1 else jnp.concatenate(outs_near)
    out_f = outs_far[0] if len(outs_far) == 1 else jnp.concatenate(outs_far)
    return out_n[:, 0], out_f[:, 0]


def _root_exit_cap(tile_aabb, origin, direction, t_max_b):
    """Cap every ray's t-budget at its scene-root-box exit: a triangle hit
    can only happen inside the root box, so t <= slab exit there.  Miss
    rays get a finite best_t instead of INF, which lets the kernels'
    front-to-back early exit fire for them too; rays that miss the root
    box outright get a -1 budget (all tile work culled)."""
    root_lo = jnp.min(tile_aabb[:, 0:3], axis=0)
    root_hi = jnp.max(
        jnp.where(
            tile_aabb[:, 3:6] >= tile_aabb[:, 0:3],  # skip inverted pad tiles
            tile_aabb[:, 3:6],
            -jnp.inf,
        ),
        axis=0,
    )
    inv_d = 1.0 / jnp.where(jnp.abs(direction) < 1e-20, 1e-20, direction)
    ta = (root_lo[None, :] - origin) * inv_d
    tb = (root_hi[None, :] - origin) * inv_d
    root_exit = jnp.min(jnp.maximum(ta, tb), axis=-1)
    root_entry = jnp.max(jnp.minimum(ta, tb), axis=-1)
    hits_root = (root_exit >= root_entry) & (root_exit > 0.0)
    return jnp.where(
        hits_root,
        jnp.minimum(t_max_b, root_exit * 1.0001 + 1e-4),
        -1.0,
    )


def closest_hit_pallas(
    tri_cols: jnp.ndarray,  # (NT, 16, TK) from pack_tri_cols
    tile_aabb: jnp.ndarray,  # (NT, 8)
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3)
    t_max: jnp.ndarray | float = jnp.inf,
    interpret: bool | None = None,
    big: bool = False,
    edge_cols: jnp.ndarray | None = None,
):
    """Closest hit for a ray batch.  Returns (t, slot, hit); slot indexes the
    sorted triangle SoA, -1 on miss.  Non-differentiable by construction
    (stop_gradient); recompute winner attributes outside.

    `edge_cols` (optional, from pack_edge_cols) enables the MXU edge-test
    prefilter on the big path — bit-identical results, sub-tiles with no
    margin-consistent candidate skip the exact test.

    Directions may have any scale (t and t_max are in the caller's ray
    parameterization): the front-to-back early-exit bound is rescaled by the
    ray block's max |d|_inf in-kernel, and the per-ray slab cull is exact
    for any scale.  The per-triangle tolerance test (t >= tol) matches the
    dense path's convention, which assumes ~unit directions — as in the
    reference (triangle.h:307 works in distance units).

    `big=True` selects the HBM-resident kernel (triangles DMA'd per tile
    under the cull) for scenes past the VMEM-resident cap."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = origin.shape[0]
    pad = (-r) % (RAY_BLOCK_BIG if big else RAY_BLOCK)
    t_max_b = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), (r,)
    ).astype(jnp.float32)
    t_max_b = _root_exit_cap(tile_aabb, origin, direction, t_max_b)
    rays = jnp.concatenate(
        [
            origin,
            direction,
            jnp.minimum(t_max_b, _INF)[:, None],
            jnp.zeros((r, 1), jnp.float32),
        ],
        axis=-1,
    )
    if pad:
        filler = jnp.zeros((pad, 8), jnp.float32).at[:, 5].set(1.0)
        rays = jnp.concatenate([rays, filler])
    rays = jax.lax.stop_gradient(rays)
    if big:
        t, slot = _closest_call_big(
            jax.lax.stop_gradient(tri_cols),
            jax.lax.stop_gradient(tile_aabb),
            rays,
            None if edge_cols is None else jax.lax.stop_gradient(edge_cols),
            interpret=interpret,
        )
    else:
        t, slot = _closest_call(
            jax.lax.stop_gradient(tri_cols),
            jax.lax.stop_gradient(tile_aabb),
            rays,
            interpret=interpret,
        )
    t, slot = t[:r], slot[:r]
    hit = slot >= 0
    return jnp.where(hit, t, jnp.inf), slot, hit


def occluded_window_pallas(
    tri_cols: jnp.ndarray,  # (NT, 16, TK) from pack_tri_cols
    tile_aabb: jnp.ndarray,  # (NT, 8)
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3)
    t_near: jnp.ndarray,  # (R,) near cap (occlusion bound)
    t_far: jnp.ndarray | float = jnp.inf,  # (R,) far cap (existence bound)
    interpret: bool | None = None,
    big: bool = False,
):
    """Any-hit window query: returns (occ_near, occ_far) bool (R,) —
    "some accepted hit with t <= t_near" / "... with t <= t_far".  t_far is
    additionally capped at the scene-root-box exit, so with t_far=inf,
    occ_far is exactly the reference's `geom_hit` (no geometry lies outside
    the root box) and the photon-gather visibility verdict
    (bvh_traversal_photon.h:151, `geom_hit && rec.t > len`) is
    `occ_far & ~occ_near` with t_near = len * (1 - tol).

    Unlike the closest-hit kernel there is no best-t carry: a ray is
    resolved at its FIRST accepted hit, resolved rays stop contributing to
    the block's tile budget, and the block exits once every ray is resolved
    (first-accepted-hit-with-early-exit, the reference's any-hit class of
    queries).  Rays with t_near <= 0 are treated as dead for the near bit.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = origin.shape[0]
    pad = (-r) % (RAY_BLOCK_BIG if big else RAY_BLOCK)
    t_far_b = jnp.broadcast_to(
        jnp.asarray(t_far, jnp.float32), (r,)
    ).astype(jnp.float32)
    t_near_b = jnp.broadcast_to(
        jnp.asarray(t_near, jnp.float32), (r,)
    ).astype(jnp.float32)
    t_far_b = _root_exit_cap(tile_aabb, origin, direction, t_far_b)
    t_near_b = jnp.minimum(t_near_b, t_far_b)
    rays = jnp.concatenate(
        [
            origin,
            direction,
            jnp.minimum(t_far_b, _INF)[:, None],
            jnp.minimum(t_near_b, _INF)[:, None],
        ],
        axis=-1,
    )
    if pad:
        filler = jnp.zeros((pad, 8), jnp.float32).at[:, 5].set(1.0)
        filler = filler.at[:, 6].set(-1.0).at[:, 7].set(-1.0)
        rays = jnp.concatenate([rays, filler])
    rays = jax.lax.stop_gradient(rays)
    occ_near, occ_far = _anyhit_call(
        jax.lax.stop_gradient(tri_cols),
        jax.lax.stop_gradient(tile_aabb),
        rays,
        interpret=interpret,
        big=big,
    )
    return occ_near[:r] != 0, occ_far[:r] != 0
