"""Measure the cull-rate CEILING of the MXU edge-test prefilter
(GPT_TPU_MXU): of the 128-lane sub-tiles inside pair-computed tiles, what
fraction has NO (ray, triangle) pair whose three Plücker edge values are
sign-consistent within the conservative margin — i.e. would be skipped by
_pair_compute_mxu?

Reuses tile_visit_stats' wavefront recording + kernel replay; for each
pair-computed tile it evaluates the exact candidate formula (f32 edges,
margin 2^-6 * rmax_i * wsum_j) per sub-tile.  The kernel's bf16 evaluation
only widens candidates by ~the same margin again, so this is a tight upper
bound on the skippable fraction.

Run on the TPU.  Env: STATS_SIZE/STATS_LEVEL/STATS_BLOCKS as tile_visit_stats.

RESULT (327k-tri bench, 12 blocks, r05): candidate sub-tile rate 0.954 —
only 4.6% of 128-lane sub-tiles inside pair-computed tiles are skippable,
and just 0.5% of pair-computed tiles are entirely empty.  The tile stream
is already 1.05x frustum-irreducible (tile_visit_stats), and what the tile
AABBs let through, real margin-consistent triangle candidates fill.  This
caps ANY per-triangle prefilter (MXU or otherwise) at ~5% of the pair
compute — the experiment is closed as perf-negative.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from gpu_pathtracer_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gpu_pathtracer_tpu.models.camera import Camera  # noqa: E402
from gpu_pathtracer_tpu.models.scene import build_scene  # noqa: E402
from gpu_pathtracer_tpu.ops import trace  # noqa: E402
from gpu_pathtracer_tpu.ops.pallas_trace import (  # noqa: E402
    _LB_SLACK, _MXU_MARGIN, RAY_BLOCK_BIG, SUB_LANES,
)
from gpu_pathtracer_tpu.utils import testscenes  # noqa: E402

import tile_visit_stats as tvs  # noqa: E402


def main():
    t0 = time.time()
    scene = build_scene(testscenes.make_mesh_scene_host(subdiv=7))
    camera = Camera.create(
        eye=(0.5, 0.8, 2.2), center=(0.5, 0.45, 0.5), up=(0, 1, 0),
        fovy_deg=45.0, width=tvs.SIZE, height=tvs.SIZE,
    )
    g = scene.geom
    nt = g.tri_cols.shape[0]
    tile = g.tri_cols.shape[2]
    aabb = np.asarray(g.tile_aabb)

    recs = np.asarray(tvs.record_wavefront(scene, camera, jax.random.key(7)))
    print(f"wavefront recorded {recs.shape} in {time.time() - t0:.0f}s",
          flush=True)

    tpad = nt * tile - g.p.shape[0]
    p = jnp.concatenate([g.p, jnp.zeros((tpad, 3, 3), g.p.dtype)])
    valid = jnp.concatenate([g.valid, jnp.zeros((tpad,), bool)])
    pz = jnp.where(valid[:, None, None], p, 0.0)
    a = pz
    b = pz[:, (1, 2, 0), :]
    w_cross = jnp.cross(a, b)      # (T, 3edge, 3)
    w_diff = b - a
    wsum = (jnp.sum(jnp.abs(w_cross), -1) + jnp.sum(jnp.abs(w_diff), -1))
    wsum = jnp.where(valid[:, None], wsum, -1.0)  # (T, 3)

    @jax.jit
    def tile_cand_subtiles(o, d, ti, live):
        """(nsub,) bool: some live pair in sub-tile is margin-consistent."""
        oxd = jnp.cross(o, d)
        rmax = jnp.max(
            jnp.maximum(jnp.abs(d), jnp.abs(oxd)), axis=-1, keepdims=True
        )  # (RB, 1)
        sl = ti * tile
        wc = jax.lax.dynamic_slice_in_dim(w_cross, sl, tile)  # (TK, 3, 3)
        wd = jax.lax.dynamic_slice_in_dim(w_diff, sl, tile)
        ws = jax.lax.dynamic_slice_in_dim(wsum, sl, tile)  # (TK, 3)
        e = (jnp.einsum("rk,tek->rte", d, wc)
             + jnp.einsum("rk,tek->rte", oxd, wd))  # (RB, TK, 3)
        m = _MXU_MARGIN * rmax[:, :, None] * ws[None]  # (RB, TK, 3)
        pos = jnp.all(e >= -m, axis=-1)
        neg = jnp.all(e <= m, axis=-1)
        cand = (pos | neg) & live[:, None]
        return jnp.any(cand.reshape(cand.shape[0], -1, SUB_LANES), axis=(0, 2))

    rng = np.random.default_rng(3)
    rb = RAY_BLOCK_BIG
    tot_sub, cand_sub, tot_tiles, empty_tiles = 0, 0, 0, 0
    blocks = 0
    for pick in range(tvs.N_BLOCKS):
        lvl = int(rng.integers(0, tvs.LEVEL))
        batch = recs[lvl]
        live = batch[:, 6] > 0
        if live.sum() < rb:
            continue
        perm = np.asarray(
            trace._coherence_perm(
                g, jnp.asarray(batch[:, 0:3]), jnp.asarray(batch[:, 3:6]),
                jnp.asarray(live),
            )
        )
        bidx = int(rng.integers(0, max(1, live.sum() // rb)))
        rows = perm[bidx * rb:(bidx + 1) * rb]
        o = batch[rows, 0:3]
        d = batch[rows, 3:6]
        l_ = live[rows]
        if not l_.any():
            continue
        per_tile, final_t = map(
            np.asarray,
            tvs_block_min_t(p, g, nt, tile)(jnp.asarray(o), jnp.asarray(d)),
        )
        per_tile = np.where(l_[:, None], per_tile, np.inf)

        # replay the visit loop to find the pair-computed tiles
        blo, bhi = o.min(axis=0), o.max(axis=0)
        dmax = np.abs(d).max()
        gap = np.maximum(aabb[:, 0:3] - bhi[None], blo[None] - aabb[:, 3:6])
        lb = np.maximum(gap, 0.0).max(axis=-1)
        order = np.argsort(lb)
        with np.errstate(divide="ignore"):
            inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
        ta = (aabb[None, :, 0:3] - o[:, None]) * inv[:, None]
        tb = (aabb[None, :, 3:6] - o[:, None]) * inv[:, None]
        tlo = np.minimum(ta, tb).max(axis=-1)
        thi = np.maximum(ta, tb).min(axis=-1)
        root_lo = aabb[:, 0:3].min(axis=0)
        root_hi = np.where(
            aabb[:, 3:6] >= aabb[:, 0:3], aabb[:, 3:6], -np.inf
        ).max(axis=0)
        ra = (root_lo[None] - o) * inv
        rbx = (root_hi[None] - o) * inv
        rexit = np.maximum(ra, rbx).min(axis=-1)
        rentry = np.minimum(ra, rbx).max(axis=-1)
        ok_root = (rexit >= rentry) & (rexit > 0)
        best_t = np.where(
            l_ & ok_root, np.minimum(3.4e38, rexit * 1.0001 + 1e-4), -1.0
        )

        jl = jnp.asarray(l_)
        jo, jd = jnp.asarray(o), jnp.asarray(d)
        for ti in order:
            if lb[ti] * _LB_SLACK >= best_t.max() * dmax:
                break
            any_hit = np.any(
                (thi[:, ti] >= tlo[:, ti]) & (thi[:, ti] > 0)
                & (np.maximum(tlo[:, ti], 0.0) < best_t)
            )
            if any_hit:
                sub = np.asarray(tile_cand_subtiles(jo, jd, int(ti), jl))
                tot_sub += sub.size
                cand_sub += int(sub.sum())
                tot_tiles += 1
                empty_tiles += int(not sub.any())
                upd = per_tile[:, ti] < best_t
                best_t = np.where(upd, per_tile[:, ti], best_t)
        blocks += 1
        print(f"block {pick}: bounce={lvl} tiles={tot_tiles} "
              f"subtile cand rate={cand_sub / max(1, tot_sub):.3f} "
              f"empty tiles={empty_tiles / max(1, tot_tiles):.3f}", flush=True)

    print(f"\nblocks: {blocks}  pair tiles: {tot_tiles}")
    print(f"sub-tiles per pair tile: {tile // SUB_LANES}")
    print(f"CANDIDATE sub-tile rate: {cand_sub / max(1, tot_sub):.3f} "
          f"(skippable: {1 - cand_sub / max(1, tot_sub):.3f})")
    print(f"fully-empty pair tiles:  {empty_tiles / max(1, tot_tiles):.3f}")


def tvs_block_min_t(p, g, nt, tile):
    """Re-create tile_visit_stats' block_min_t closure with our padding."""
    from gpu_pathtracer_tpu.ops import intersect

    tpad = nt * tile - g.p.shape[0]
    tol = jnp.concatenate([g.tol, jnp.full((tpad,), jnp.inf)])
    valid = jnp.concatenate([g.valid, jnp.zeros((tpad,), bool)])

    @jax.jit
    def block_min_t(o, d):
        def one_tile(c, args):
            tp, tl, tv = args
            t, _, hit = intersect.intersect_tris(
                o, d, tp[None], tl[None], jnp.inf
            )
            t = jnp.where(hit & tv[None, :], t, jnp.inf)
            return c, jnp.min(t, axis=-1)

        tp = p.reshape(nt, tile, 3, 3)
        tl = tol.reshape(nt, tile)
        tv = valid.reshape(nt, tile)
        _, per_tile = jax.lax.scan(one_tile, 0, (tp, tl, tv))
        per_tile = per_tile.T
        return per_tile, jnp.min(per_tile, axis=-1)

    return block_min_t


if __name__ == "__main__":
    main()
