"""Ray-scene intersection dispatch: dense tiles (small scenes) or BVH.

The reference answers every ray query with a divergent per-thread BVH walk
(`src/model/bvh/bvh_traversal.h:12-84`).  On TPU the right structure depends
on scene size:

* small scenes — test every (ray, triangle) pair in dense tiles.  One fused
  VPU pass with zero sequential steps beats any traversal loop by orders of
  magnitude (a `while_loop` iteration costs ~0.5 ms of gather/launch latency
  at wavefront widths, and a traversal needs ~100 of them);
* large scenes — the threaded stackless BVH walk (`ops/bvh.py`), whose
  sequential depth is bounded by tree height instead of triangle count.

`closest_hit` / `occluded` pick a strategy from the static (padded) triangle
count.  Both return hits in *sorted-SoA slots* (rows of `GeometrySet.p`),
exactly like `bvh.traverse_closest`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.ops import bvh as bvh_mod
from gpu_pathtracer_tpu.ops import intersect as isect

# scenes with at most this many (padded) triangles use dense tiles
DENSE_MAX = int(os.environ.get("GPT_TPU_DENSE_MAX", "4096"))
# triangle tile width for the scanned dense path
DENSE_TILE = int(os.environ.get("GPT_TPU_DENSE_TILE", "1024"))


def gather_rows(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """`arr[idx]` with the trailing dims flattened first.

    XLA's TPU gather is fast when each gathered slice is one contiguous
    minor-dim row but falls off a cliff for multi-dim slice shapes like
    (1, L, 3, 3); flattening keeps every table lookup on the fast path.
    """
    flat = arr.reshape(arr.shape[0], -1)
    out = flat[idx]
    return out.reshape(idx.shape + arr.shape[1:])


def _pad_tris(p, tol, valid, tile):
    t = p.shape[0]
    pad = (-t) % tile
    if pad:
        p = jnp.concatenate([p, jnp.zeros((pad, 3, 3), p.dtype)])
        tol = jnp.concatenate([tol, jnp.full((pad,), jnp.inf, tol.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return p, tol, valid, t + pad


def closest_hit_dense(
    p: jnp.ndarray,  # (T, 3, 3)
    tol: jnp.ndarray,  # (T,)
    valid: jnp.ndarray,  # (T,) bool
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3)
    t_max: jnp.ndarray | float = jnp.inf,
    tile: int = DENSE_TILE,
):
    """Closest hit by dense (ray, tri) tiles scanned over the triangle axis.

    Returns (t, slot, bary, hit) with slot = row of `p`, -1 on miss.
    """
    r = origin.shape[0]
    p, tol, valid, tp = _pad_tris(p, tol, valid, tile)
    n_tiles = tp // tile

    best_t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    init = (best_t0, jnp.full((r,), -1, jnp.int32))

    p_tiles = p.reshape(n_tiles, tile, 3, 3)
    tol_tiles = tol.reshape(n_tiles, tile)
    valid_tiles = valid.reshape(n_tiles, tile)

    # t-only scan: the per-pair barycentrics are never used here, so XLA
    # DCEs them and fuses the whole tile into one reduction (the (R, tile, 3)
    # bary array would otherwise dominate HBM).
    def step(carry, inputs):
        best_t, best_slot = carry
        tile_idx, tri_p, tri_tol, tri_valid = inputs
        t, _, hit = isect.intersect_tris(
            origin, direction, tri_p[None], tri_tol[None], best_t
        )  # (R, tile)
        t = jnp.where(hit & tri_valid[None, :], t, jnp.inf)
        k = jnp.argmin(t, axis=-1)
        t_k = jnp.take_along_axis(t, k[:, None], axis=-1)[:, 0]
        better = t_k < best_t
        best_t = jnp.where(better, t_k, best_t)
        best_slot = jnp.where(
            better, tile_idx * tile + k.astype(jnp.int32), best_slot
        )
        return (best_t, best_slot), None

    if n_tiles == 1:
        (best_t, best_slot), _ = step(
            init, (jnp.int32(0), p_tiles[0], tol_tiles[0], valid_tiles[0])
        )
    else:
        (best_t, best_slot), _ = jax.lax.scan(
            step,
            init,
            (jnp.arange(n_tiles, dtype=jnp.int32), p_tiles, tol_tiles, valid_tiles),
        )
    hit = best_slot >= 0
    best_bary = winner_bary(p, tol, origin, direction, best_slot, hit)
    return jnp.where(hit, best_t, jnp.inf), best_slot, best_bary, hit


def winner_bary(p, tol, origin, direction, slot, hit, attr=None):
    """Barycentrics of the winning triangle, recomputed differentiably for
    just that one (K=1) candidate.  With `attr` (the packed per-triangle
    table, models/scene.py), vertices + tolerance come from ONE row gather
    that CSEs with interpolate_hit's — gathers dominate the wavefront."""
    safe = jnp.maximum(slot, 0)
    if attr is not None:
        rows = attr[safe]  # (R, 26)
        tri_w = rows[:, 0:9].reshape(-1, 3, 3)
        tol_w = rows[:, 24]
    else:
        tri_w = gather_rows(p, safe)  # (R, 3, 3)
        tol_w = tol[safe]
    _, bary_w, _ = isect.intersect_tris(
        origin, direction, tri_w[:, None], tol_w[:, None], jnp.inf
    )
    return jnp.where(hit[:, None], bary_w[:, 0], 0.0)


def occluded_dense(
    p: jnp.ndarray,
    tol: jnp.ndarray,
    valid: jnp.ndarray,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    t_max: jnp.ndarray,
    exclude_slot: jnp.ndarray | None = None,
    tile: int = DENSE_TILE,
):
    """Any-hit test by dense tiles; `exclude_slot` masks one row per ray."""
    r = origin.shape[0]
    p, tol, valid, tp = _pad_tris(p, tol, valid, tile)
    n_tiles = tp // tile
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    p_tiles = p.reshape(n_tiles, tile, 3, 3)
    tol_tiles = tol.reshape(n_tiles, tile)
    valid_tiles = valid.reshape(n_tiles, tile)

    def step(occ, inputs):
        tile_idx, tri_p, tri_tol, tri_valid = inputs
        _, _, hit = isect.intersect_tris(
            origin, direction, tri_p[None], tri_tol[None], t_max_b
        )
        hit = hit & tri_valid[None, :]
        if exclude_slot is not None:
            slots = tile_idx * tile + jnp.arange(tile, dtype=jnp.int32)
            hit &= slots[None, :] != exclude_slot[:, None]
        return occ | jnp.any(hit, axis=-1), None

    init = jnp.zeros((r,), bool)
    if n_tiles == 1:
        occ, _ = step(init, (jnp.int32(0), p_tiles[0], tol_tiles[0], valid_tiles[0]))
    else:
        occ, _ = jax.lax.scan(
            step,
            init,
            (jnp.arange(n_tiles, dtype=jnp.int32), p_tiles, tol_tiles, valid_tiles),
        )
    return occ


# triangle cap for the VMEM-resident Pallas kernel (64 B/tri of VMEM)
PALLAS_MAX = int(os.environ.get("GPT_TPU_PALLAS_MAX", "131072"))
# sort rays for traversal coherence above this batch size (0 disables)
RAY_SORT_MIN = int(os.environ.get("GPT_TPU_RAY_SORT_MIN", "8192"))
# ... and only when the scene has at least this many triangle tiles.  NOTE:
# the sort pays for itself even at 2 tiles — coherent blocks converge best_t
# fast enough for the (tlo < best_t) cull to skip tiles that a shuffled
# block never could (measured on the 972-tri Cornell render: sorted 7.9M
# rays/s vs unsorted 5.3M, despite the sort's own ~1.9ms/64k-ray cost)
RAY_SORT_MIN_TILES = int(os.environ.get("GPT_TPU_RAY_SORT_MIN_TILES", "2"))


def _coherence_perm(g, origin, direction, live=None):
    """Permutation putting rays in (live, direction-octant, origin-Morton)
    order; dead rays sort last so they fill dead-only blocks whose t-budget
    of -1 makes the kernel's tile cull skip ALL pair work.

    After the first bounce, wavefront rays are spatially incoherent, so the
    Pallas kernel's per-block tile cull almost never fires (a 256-ray block
    collectively touches every tile).  Sorting by a 3-bit direction octant +
     18-bit origin Morton key groups rays that walk the same part of the
    scene into the same block — the TPU analog of the GPU ray-sorting /
    compaction stage in wavefront path tracers.  Cost: one 32-bit sort of R
    keys vs. the O(R x T_tile) pair tests it lets the kernel skip.
    """
    from gpu_pathtracer_tpu.ops import morton

    lo = jnp.min(g.tile_aabb[:, 0:3], axis=0)
    hi = jnp.max(g.tile_aabb[:, 3:6], axis=0)
    span = jnp.maximum(hi - lo, 1e-12)
    octant = (
        (direction[:, 0] > 0).astype(jnp.uint32) * 4
        + (direction[:, 1] > 0).astype(jnp.uint32) * 2
        + (direction[:, 2] > 0).astype(jnp.uint32)
    )
    q = jnp.clip((origin - lo) / span * 64.0, 0.0, 63.0).astype(jnp.uint32)
    m = (
        morton.expand_bits(q[:, 0]) * 4
        + morton.expand_bits(q[:, 1]) * 2
        + morton.expand_bits(q[:, 2])
    )
    if os.environ.get("GPT_TPU_SORT_ORIGIN_MAJOR", "1") != "0":
        # origin-major: tight per-block origin boxes -> stronger
        # front-to-back lower bounds in the Pallas kernels
        key = (m << 3) | octant
    else:
        key = (octant << 18) | m
    if live is not None:
        key = key | jnp.where(live, jnp.uint32(0), jnp.uint32(1) << 21)
    return jnp.argsort(key.astype(jnp.int32))


def _use_dense(g) -> bool:
    return g.p.shape[0] <= DENSE_MAX


def _use_pallas(g) -> bool:
    if os.environ.get("GPT_TPU_DISABLE_PALLAS"):
        return False
    return (
        getattr(g, "tri_cols", None) is not None
        and jax.default_backend() == "tpu"
    )


def _pallas_big(g) -> bool:
    """Above PALLAS_MAX the triangle SoA no longer fits VMEM; switch to the
    HBM-resident kernel (per-tile DMA under the cull)."""
    return g.p.shape[0] > PALLAS_MAX


def closest_hit_pallas_sorted(g, origin, direction, t_max=jnp.inf, live=None):
    """Pallas closest hit with coherence-sorted rays (see _coherence_perm).

    Batches below RAY_SORT_MIN (or single-tile scenes) skip the sort — the
    cull can't win anything there.  `live` (optional bool mask) marks rays
    whose result is unused this step: they are sorted into dead-only blocks
    and given a t-budget of -1, so the kernel culls all their tile work.
    Returns (t, slot, hit) in the CALLER's ray order (dead rays miss).
    """
    from gpu_pathtracer_tpu.ops import pallas_trace

    r = origin.shape[0]
    big = _pallas_big(g)
    # normalize BEFORE the per-ray check: a numpy array / Python list t_max
    # would otherwise skip the permutation and clip each ray with another
    # ray's budget
    t_max = jnp.asarray(t_max, jnp.float32)
    if live is not None:
        t_max = jnp.where(live, t_max, -1.0)
    sort = (
        RAY_SORT_MIN > 0
        and r >= RAY_SORT_MIN
        and g.tri_cols.shape[0] >= RAY_SORT_MIN_TILES
    )
    edge_cols = getattr(g, "edge_cols", None) if big else None
    if not sort:
        return pallas_trace.closest_hit_pallas(
            g.tri_cols, g.tile_aabb, origin, direction, t_max, big=big,
            edge_cols=edge_cols,
        )
    perm = jax.lax.stop_gradient(_coherence_perm(g, origin, direction, live))
    o_s = jnp.take(origin, perm, axis=0)
    d_s = jnp.take(direction, perm, axis=0)
    tm_s = jnp.take(t_max, perm, axis=0) if t_max.ndim > 0 else t_max
    t, slot, hit = pallas_trace.closest_hit_pallas(
        g.tri_cols, g.tile_aabb, o_s, d_s, tm_s, big=big,
        edge_cols=edge_cols,
    )
    # inverse permutation by scatter: O(R), vs a second O(R log R) argsort
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(r, dtype=perm.dtype), unique_indices=True
    )
    return (
        jnp.take(t, inv, axis=0),
        jnp.take(slot, inv, axis=0),
        jnp.take(hit, inv, axis=0),
    )


def closest_hit(g, origin, direction, t_max=jnp.inf, live=None):
    """Closest hit against a GeometrySet (strategy picked by scene size).

    `live` is a performance hint: rays with live=False may return miss
    without doing work (the Pallas path culls them; other paths ignore the
    mask, so callers must still gate results on their own live mask).
    """
    if _use_pallas(g):
        t, slot, hit = closest_hit_pallas_sorted(
            g, origin, direction, t_max, live
        )
        bary = winner_bary(
            g.p, g.tol, origin, direction, slot, hit,
            attr=getattr(g, "attr", None),
        )
        return t, slot, bary, hit
    if _use_dense(g):
        return closest_hit_dense(g.p, g.tol, g.valid, origin, direction, t_max)
    return bvh_mod.traverse_closest(g.bvh, g.p, g.tol, origin, direction, t_max)


def occluded_window_pallas_sorted(
    g, origin, direction, t_near, t_far=jnp.inf, live=None
):
    """Pallas any-hit window query with coherence-sorted rays (the shadow-
    class fast path: first accepted hit, no best-t refinement, whole-block
    exit once every ray is resolved).  Returns (occ_near, occ_far) in the
    CALLER's ray order; dead rays (live=False) report (False, False)."""
    from gpu_pathtracer_tpu.ops import pallas_trace

    r = origin.shape[0]
    big = _pallas_big(g)
    t_near = jnp.broadcast_to(jnp.asarray(t_near, jnp.float32), (r,))
    t_far = jnp.broadcast_to(jnp.asarray(t_far, jnp.float32), (r,))
    if live is not None:
        t_far = jnp.where(live, t_far, -1.0)
        t_near = jnp.where(live, t_near, -1.0)
    sort = (
        RAY_SORT_MIN > 0
        and r >= RAY_SORT_MIN
        and g.tri_cols.shape[0] >= RAY_SORT_MIN_TILES
    )
    if not sort:
        return pallas_trace.occluded_window_pallas(
            g.tri_cols, g.tile_aabb, origin, direction, t_near, t_far, big=big
        )
    perm = jax.lax.stop_gradient(_coherence_perm(g, origin, direction, live))
    occ_n, occ_f = pallas_trace.occluded_window_pallas(
        g.tri_cols, g.tile_aabb,
        jnp.take(origin, perm, axis=0),
        jnp.take(direction, perm, axis=0),
        jnp.take(t_near, perm, axis=0),
        jnp.take(t_far, perm, axis=0),
        big=big,
    )
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(r, dtype=perm.dtype), unique_indices=True
    )
    return jnp.take(occ_n, inv, axis=0), jnp.take(occ_f, inv, axis=0)


def occluded_window(g, origin, direction, t_near, t_far=jnp.inf, live=None):
    """Windowed any-hit: (occ_near, occ_far) = ("some hit with t < t_near",
    "some hit with t <= t_far").  The photon-gather visibility verdict
    (bvh_traversal_photon.h:151, `geom_hit && rec.t > len`) is
    `occ_far & ~occ_near` with t_near = len*(1-tol), t_far = inf.

    On TPU this runs the Pallas any-hit kernel (first accepted hit + block
    early exit); elsewhere it derives the exact same bits from the closest
    hit (∃ hit with t < bound  ⇔  closest t < bound), so verdicts agree
    across backends."""
    if _use_pallas(g):
        return occluded_window_pallas_sorted(
            g, origin, direction, t_near, t_far, live
        )
    t, _, _, hit = closest_hit(g, origin, direction, live=live)
    if live is not None:
        hit = hit & live  # non-Pallas closest_hit ignores the live hint
    occ_near = hit & (t < t_near)
    occ_far = hit & (t <= t_far)
    return occ_near, occ_far


def occluded(g, origin, direction, t_max, exclude_slot=None):
    """Any-hit (shadow) test against a GeometrySet.  On TPU (and without a
    per-ray exclusion, which the Pallas kernel does not carry) this uses the
    any-hit kernel; otherwise dense tiles or the threaded BVH walk."""
    if exclude_slot is None and _use_pallas(g):
        # the far bit uses t <= t_max, matching the dense path's boundary
        _, occ_far = occluded_window_pallas_sorted(
            g, origin, direction, t_max, t_max
        )
        return occ_far
    if _use_dense(g):
        return occluded_dense(
            g.p, g.tol, g.valid, origin, direction, t_max, exclude_slot
        )
    return bvh_mod.traverse_any(
        g.bvh, g.p, g.tol, origin, direction, t_max, exclude_slot
    )
