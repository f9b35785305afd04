"""Per-block tile-visit statistics for the HBM-resident mesh traversal.

Answers VERDICT r05's question about the 327k-tri path: of the tiles each
ray block pair-computes, how many are FRUSTUM-IRREDUCIBLE — i.e. their AABB
overlaps some ray's final [0, t_hit] segment, so ANY AABB-granularity cull
at this tile size must visit them?  If the kernel's visits sit close to
that lower bound, the residual cost is the tile granularity itself, not
cull quality.

Method:
1. record the REAL wavefront (o, d, live) at every bounce of the bench
   render (a mini integrator with the production BSDF/NEE samplers);
2. apply the production coherence sort per bounce and sample ray blocks;
3. for each sampled block, replay the kernel's EXACT visit logic
   (front-to-back order, lb * SLACK < max(best_t) * dmax early exit,
   any-ray slab test, best_t updates from true per-tile min-t) on host;
4. compare pair-computed tiles vs the irreducible lower bound.

Run on the TPU (pair tables are 128 x 327k dense tests per block).
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from gpu_pathtracer_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gpu_pathtracer_tpu.models.camera import Camera  # noqa: E402
from gpu_pathtracer_tpu.models.scene import build_scene  # noqa: E402
from gpu_pathtracer_tpu.ops import intersect, materials, trace  # noqa: E402
from gpu_pathtracer_tpu.ops.pallas_trace import (  # noqa: E402
    RAY_BLOCK_BIG, _LB_SLACK,
)
from gpu_pathtracer_tpu.render.integrator import interpolate_hit  # noqa: E402
from gpu_pathtracer_tpu.utils import testscenes  # noqa: E402

SIZE = int(os.environ.get("STATS_SIZE", "256"))
LEVEL = int(os.environ.get("STATS_LEVEL", "8"))
N_BLOCKS = int(os.environ.get("STATS_BLOCKS", "48"))


def record_wavefront(scene, camera, key):
    """(L, R, 8) per-bounce [o, d, live, pad] BEFORE each traversal."""
    r = SIZE * SIZE
    ii, jj = jnp.meshgrid(
        jnp.arange(SIZE, dtype=jnp.float32),
        jnp.arange(SIZE, dtype=jnp.float32), indexing="ij",
    )
    o, d = camera.generate_rays(
        ii.reshape(-1) + 0.5, jj.reshape(-1) + 0.5,
        jnp.full((r,), 0.5), jnp.full((r,), 0.5),
    )
    stack_ids, stack_len = materials.stack_init((r,), 8)

    def bounce(state, i):
        o, d, live, stack_ids, stack_len = state
        rec = jnp.concatenate(
            [o, d, live[:, None].astype(jnp.float32),
             jnp.zeros((r, 1))], axis=-1,
        )
        t, slot, bary, hit = trace.closest_hit(
            scene.geom, o, d, live=live
        )
        hit = hit & live
        pt, uv, nrm, mat = interpolate_hit(scene.geom, scene.materials, slot, bary)
        ref = materials.sample_bsdf(
            scene.materials, mat, pt, d, nrm, uv, stack_ids, stack_len,
            jax.random.fold_in(key, i),
        )
        stack_ids, stack_len = materials.stack_rearrange(
            stack_ids, stack_len, mat, ref.false_hit, ref.entering,
            ref.refracted, hit,
        )
        o2 = jnp.where(hit[:, None], ref.origin, o)
        d2 = jnp.where(hit[:, None], ref.dir, d)
        return (o2, d2, hit, stack_ids, stack_len), rec

    (_, _, _, _, _), recs = jax.lax.scan(
        bounce, (o, d, jnp.ones((r,), bool), stack_ids, stack_len),
        jnp.arange(LEVEL),
    )
    return recs  # (L, R, 8)


def main():
    t0 = time.time()
    scene = build_scene(testscenes.make_mesh_scene_host(subdiv=7))
    camera = Camera.create(
        eye=(0.5, 0.8, 2.2), center=(0.5, 0.45, 0.5), up=(0, 1, 0),
        fovy_deg=45.0, width=SIZE, height=SIZE,
    )
    g = scene.geom
    print(f"scene build {time.time() - t0:.0f}s; tiles:",
          g.tri_cols.shape, flush=True)
    nt = g.tri_cols.shape[0]
    tile = g.tri_cols.shape[2]
    aabb = np.asarray(g.tile_aabb)  # (NT, 8)

    recs = np.asarray(record_wavefront(scene, camera, jax.random.key(7)))
    print(f"wavefront recorded {recs.shape} in {time.time() - t0:.0f}s",
          flush=True)

    # per-tile min-t for one ray block, computed exactly on the chip
    # (pad the SoA to the packed tile count)
    tpad = nt * tile - g.p.shape[0]
    p = jnp.concatenate([g.p, jnp.zeros((tpad, 3, 3), g.p.dtype)])
    tol = jnp.concatenate([g.tol, jnp.full((tpad,), jnp.inf)])
    valid = jnp.concatenate([g.valid, jnp.zeros((tpad,), bool)])

    @jax.jit
    def block_min_t(o, d):
        """(RB, NT) min valid t per (ray, tile) + (RB,) final closest t."""
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
        _, per_tile = jax.lax.scan(
            one_tile, 0, (tp, tl, tv)
        )  # (NT, RB)
        per_tile = per_tile.T
        return per_tile, jnp.min(per_tile, axis=-1)

    rng = np.random.default_rng(3)
    rb = RAY_BLOCK_BIG
    stats = []
    for pick in range(N_BLOCKS):
        lvl = int(rng.integers(0, LEVEL))
        batch = recs[lvl]
        live = batch[:, 6] > 0
        if live.sum() < rb:
            continue
        # production coherence sort: (live, octant, origin-morton) order
        perm = np.asarray(
            trace._coherence_perm(
                g, jnp.asarray(batch[:, 0:3]), jnp.asarray(batch[:, 3:6]),
                jnp.asarray(live),
            )
        )
        n_blocks = len(perm) // rb
        bidx = int(rng.integers(0, max(1, live.sum() // rb)))
        rows = perm[bidx * rb:(bidx + 1) * rb]
        o = batch[rows, 0:3]
        d = batch[rows, 3:6]
        l_ = live[rows]
        if not l_.any():
            continue
        per_tile, final_t = map(
            np.asarray, block_min_t(jnp.asarray(o), jnp.asarray(d))
        )
        final_t = np.where(l_, final_t, -1.0)
        per_tile = np.where(l_[:, None], per_tile, np.inf)

        # kernel replay: host walk of the exact in-kernel conditions
        blo = o.min(axis=0)
        bhi = o.max(axis=0)
        dmax = np.abs(d).max()
        gap = np.maximum(aabb[:, 0:3] - bhi[None], blo[None] - aabb[:, 3:6])
        lb = np.maximum(gap, 0.0).max(axis=-1)  # (NT,)
        order = np.argsort(lb)
        with np.errstate(divide="ignore"):
            inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
        ta = (aabb[None, :, 0:3] - o[:, None]) * inv[:, None]  # (RB, NT, 3)
        tb = (aabb[None, :, 3:6] - o[:, None]) * inv[:, None]
        tlo = np.minimum(ta, tb).max(axis=-1)
        thi = np.maximum(ta, tb).min(axis=-1)

        best_t = np.where(l_, np.float32(3.4e38), -1.0)
        # root-exit cap (wrapper semantics)
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
            l_ & ok_root, np.minimum(best_t, rexit * 1.0001 + 1e-4),
            np.where(l_, -1.0, -1.0),
        )

        visited = 0
        pair = 0
        for ti in order:
            if lb[ti] * _LB_SLACK >= best_t.max() * dmax:
                break
            visited += 1
            any_hit = np.any(
                (thi[:, ti] >= tlo[:, ti]) & (thi[:, ti] > 0)
                & (np.maximum(tlo[:, ti], 0.0) < best_t)
            )
            if any_hit:
                pair += 1
                upd = per_tile[:, ti] < best_t
                best_t = np.where(upd, per_tile[:, ti], best_t)

        # irreducible at this granularity: tile AABB overlaps some live
        # ray's FINAL [0, t_hit] segment (any AABB-level cull must test it)
        seg_t = np.where(final_t > 0, np.minimum(final_t, rexit), 0.0)
        irred = np.any(
            (thi >= tlo) & (thi > 0) & (np.maximum(tlo, 0.0) <= seg_t[:, None])
            & l_[:, None],
            axis=0,
        ).sum()
        stats.append((lvl, visited, pair, int(irred)))
        print(f"block {pick}: bounce={lvl} loop_visited={visited} "
              f"pair_computed={pair} irreducible={int(irred)}", flush=True)

    arr = np.array([s[1:] for s in stats], np.float64)
    print(f"\nblocks sampled: {len(stats)} (tile={tile}, NT={nt}, RB={rb})")
    print(f"mean loop-visited tiles/block: {arr[:, 0].mean():.1f}")
    print(f"mean pair-computed tiles/block: {arr[:, 1].mean():.1f}")
    print(f"mean irreducible tiles/block:   {arr[:, 2].mean():.1f}")
    print(f"pair/irreducible ratio: {arr[:, 1].sum() / arr[:, 2].sum():.2f}")


if __name__ == "__main__":
    main()
