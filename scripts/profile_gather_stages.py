"""Decompose surface_gather_grid + eye_pass cost on the real chip.

NOTE: jax.block_until_ready does NOT reliably block on the remote `axon`
platform — every timing here forces a host materialization (np.asarray)
of a small reduction of the outputs instead.

Usage: python scripts/profile_gather_stages.py [fog]
Env: PROF_SIZE (512), PROF_PHOTONS (50000).
"""

import dataclasses
import functools
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from gpu_pathtracer_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def mat(x):
    return [np.asarray(l).reshape(-1)[:1] for l in jax.tree.leaves(x)
            if hasattr(l, "dtype")]


def timed(label, fn, *args, n=2, **kw):
    out = fn(*args, **kw)
    mat(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        mat(out)
    dt = (time.time() - t0) / n
    print(f"{label:34s} {dt:8.3f} s", flush=True)
    return out, dt


def main():
    fog = "fog" in sys.argv[1:]
    size = int(os.environ.get("PROF_SIZE", "512"))
    n_phot = int(os.environ.get("PROF_PHOTONS", "50000"))

    from gpu_pathtracer_tpu.models.camera import Camera
    from gpu_pathtracer_tpu.models.scene import build_scene
    from gpu_pathtracer_tpu.ops import hashgrid, trace
    from gpu_pathtracer_tpu.ops import linalg
    from gpu_pathtracer_tpu.render import sppm
    from gpu_pathtracer_tpu.utils import testscenes
    from gpu_pathtracer_tpu.utils.obj_io import load_scene

    folder = tempfile.mkdtemp(prefix="prof_gs_")
    testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=0, fog=fog)
    mtl = pathlib.Path(folder) / "box.mtl"
    mtl.write_text(mtl.read_text().replace(
        "newmtl light\nKd 0 0 0", "newmtl light\nKd 0.78 0.78 0.78"
    ))
    scene = build_scene(load_scene(folder, "box.obj"))
    camera = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=size, height=size,
    )
    w = h = size
    r = w * h
    ii, jj = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    pix_i = ii.reshape(-1)
    pix_j = jj.reshape(-1)
    use_grid = r * n_phot > (1 << 24)
    print(f"scene={'fog' if fog else 'cornell'} size={size} "
          f"photons={n_phot} grid={use_grid}", flush=True)

    eye_jit = jax.jit(
        functools.partial(sppm.eye_pass, max_bounce=64, volume_grid=use_grid),
        static_argnames=("init",),
    )
    key = jax.random.key(5)
    vol_r = jnp.full((r,), jnp.inf)
    loc, nrm, filt, direct, _, valid = eye_jit(
        scene, camera, jax.random.fold_in(key, 0),
        pix_i + 0.5, pix_j + 0.5, None, vol_r, init=True,
    )
    radius = sppm.initial_radius(
        eye_jit, scene, camera, jax.random.fold_in(key, 0), pix_i, pix_j,
        loc, valid, 1.0,
    )
    hp_loc = jnp.where(valid[..., None], loc, jnp.inf)

    pkey = jax.random.fold_in(key, 1000)
    photons, t_ph = timed(
        "photon_pass", sppm.photon_pass, scene, pkey,
        n_photons=n_phot, max_bounce=8,
    )

    _, t_eye = timed(
        "eye_pass(no-init)", eye_jit, scene, camera,
        jax.random.fold_in(pkey, 1),
        pix_i + jax.random.uniform(jax.random.fold_in(pkey, 2), (r,)),
        pix_j + jax.random.uniform(jax.random.fold_in(pkey, 3), (r,)),
        photons, 2.0 * radius, init=False,
    )

    # ---- gather stages ----------------------------------------------------
    g = scene.geom
    k_per_cell = 8
    k_nearest = 16
    sphot = photons.valid & photons.on_surface

    @jax.jit
    def stage_grid(photons, hp_radius, hp_valid):
        r_max = jnp.max(jnp.where(hp_valid, hp_radius, 0.0))
        return hashgrid.build_grid(photons.pos, sphot, r_max)

    grid, t_grid = timed("  build_grid", stage_grid, photons, radius, valid)

    CH = 16384

    def chunked(fn, *arrs):
        parts = [a.reshape((-1, CH) + a.shape[1:]) for a in arrs]
        return jax.lax.map(fn, tuple(parts))

    @jax.jit
    def stage_candidates(grid, hp_loc, hp_radius, hp_valid):
        def one(args):
            loc, rad, val = args
            cand, ok = hashgrid.query_candidates(grid, loc, k_per_cell)
            cpos = photons.pos[cand]
            d2 = jnp.sum((cpos - loc[:, None, :]) ** 2, axis=-1)
            in_r = ok & val[:, None] & (d2 <= rad[:, None] ** 2)
            return cand, in_r, d2
        cand, in_r, d2 = chunked(one, hp_loc, radius, valid)
        return (cand.reshape(-1, cand.shape[-1]),
                in_r.reshape(-1, in_r.shape[-1]),
                d2.reshape(-1, d2.shape[-1]))

    (cand, in_r, d2), t_cand = timed(
        "  query+d2 (216-wide)", stage_candidates, grid, hp_loc, radius, valid
    )
    print(f"    in-radius candidates/px: "
          f"{float(jnp.sum(in_r)) / r:.2f}", flush=True)

    @jax.jit
    def stage_topk(cand, in_r, d2):
        def one(args):
            cand, in_r, d2 = args
            key_val = jnp.where(in_r, -d2, -jnp.inf)
            top_val, top_pos = jax.lax.top_k(key_val, k_nearest)
            top_idx = jnp.take_along_axis(cand, top_pos, axis=-1)
            return top_idx, jnp.isfinite(top_val)
        ti, ok = chunked(one, cand, in_r, d2)
        return ti.reshape(-1, k_nearest), ok.reshape(-1, k_nearest)

    (top_idx, cand_ok), t_topk = timed("  top_k(216->16)", stage_topk, cand, in_r, d2)

    @jax.jit
    def stage_vis(top_idx, cand_ok, hp_loc):
        def one(args):
            top_idx, cand_ok, loc = args
            prev = photons.prev[top_idx]
            ray_vec = prev - loc[:, None, :]
            ray_len = jnp.sqrt(jnp.sum(ray_vec ** 2, axis=-1))
            ray_dir = linalg.normalize(ray_vec, 1e-8)
            c, kk = ray_dir.shape[:2]
            occ_near, occ_far = trace.occluded_window(
                g,
                jnp.broadcast_to(loc[:, None, :], (c, kk, 3)).reshape(-1, 3),
                ray_dir.reshape(-1, 3),
                (ray_len * (1.0 - 1e-3)).reshape(-1),
                live=cand_ok.reshape(-1),
            )
            return cand_ok & (occ_far & ~occ_near).reshape(c, kk)
        v = chunked(one, top_idx, cand_ok, hp_loc)
        return v.reshape(-1, v.shape[-1])

    visible, t_vis = timed("  visibility (anyhit)", stage_vis, top_idx, cand_ok, hp_loc)
    print(f"    visible/px: {float(jnp.sum(visible)) / r:.2f}", flush=True)

    @jax.jit
    def stage_flux(top_idx, visible):
        def one(args):
            top_idx, visible, nr = args
            pdir = photons.direction[top_idx]
            fac = jnp.maximum(0.0, jnp.sum(nr[:, None, :] * (-pdir), axis=-1))
            return jnp.sum(
                (visible * fac)[..., None] * photons.color[top_idx], axis=1
            )
        return chunked(one, top_idx, visible, nrm)

    _, t_flux = timed("  flux accum", stage_flux, top_idx, visible)

    gather_jit = jax.jit(functools.partial(
        sppm.surface_gather_grid if use_grid else sppm.surface_gather,
        k_nearest=16,
    ))
    _, t_full = timed(
        "surface_gather_grid (full)", gather_jit, scene, photons,
        hp_loc, nrm, radius, valid,
    )
    print(f"stage sum: {t_grid + t_cand + t_topk + t_vis + t_flux:.3f} "
          f"(full {t_full:.3f})", flush=True)
    print(f"TOTAL ph+eye+gather: {t_ph + t_eye + t_full:.3f}", flush=True)


if __name__ == "__main__":
    main()
