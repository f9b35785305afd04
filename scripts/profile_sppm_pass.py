"""Decompose the full-SPPM-iteration cost at 512^2 (bench.py's
sppm_pass_seconds metric) into its stages on the real chip:

    photon pass | eye pass (init=False) | surface gather | update

Usage: python scripts/profile_sppm_pass.py [fog]
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


def main():
    fog = "fog" in sys.argv[1:]
    size = int(os.environ.get("PROF_SIZE", "512"))
    n_phot = int(os.environ.get("PROF_PHOTONS", "50000"))

    from gpu_pathtracer_tpu.models.camera import Camera
    from gpu_pathtracer_tpu.models.scene import build_scene
    from gpu_pathtracer_tpu.render import sppm
    from gpu_pathtracer_tpu.utils import testscenes
    from gpu_pathtracer_tpu.utils.obj_io import load_scene

    folder = tempfile.mkdtemp(prefix="prof_sppm_")
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
          f"photons={n_phot} grid={use_grid}")

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
    hp = sppm.HitPoints(
        loc=jnp.where(valid[..., None], loc, jnp.inf), normal=nrm,
        filter=filt, direct=direct, indirect=jnp.zeros((r, 3)),
        tmp_lm=jnp.zeros((r, 3)), surface_radius=radius,
        volume_radius=2.0 * radius, valid=valid,
    )
    gather_jit = jax.jit(functools.partial(
        sppm.surface_gather_grid if use_grid else sppm.surface_gather,
        k_nearest=16,
    ))

    def timed(label, fn, *args, n=2, **kw):
        import numpy as _n

        def mat(x):
            # block_until_ready does NOT reliably block on the remote axon
            # platform; force a host materialization of every output leaf
            return [_n.asarray(l).reshape(-1)[:1] for l in jax.tree.leaves(x)
                    if hasattr(l, "dtype")]

        out = fn(*args, **kw)  # compile
        mat(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args, **kw)
            mat(out)
        dt = (time.time() - t0) / n
        print(f"{label:26s} {dt:8.3f} s")
        return out, dt

    pkey = jax.random.fold_in(key, 1000)
    photons, t_ph = timed(
        "photon_pass", sppm.photon_pass, scene, pkey,
        n_photons=n_phot, max_bounce=8,
    )
    import numpy as _np
    has_medium = bool(_np.any(
        _np.asarray(scene.materials.scattering_coef)
        + _np.asarray(scene.materials.absorption_coef) > 0
    ))
    eye_outs, t_eye = timed(
        "eye_pass(no-init)", eye_jit, scene, camera,
        jax.random.fold_in(pkey, 1),
        pix_i + jax.random.uniform(jax.random.fold_in(pkey, 2), (r,)),
        pix_j + jax.random.uniform(jax.random.fold_in(pkey, 3), (r,)),
        photons if has_medium else None, hp.volume_radius, init=False,
    )
    flux, t_g = timed(
        "surface_gather", gather_jit, scene, photons,
        hp.loc, hp.normal, hp.surface_radius, hp.valid,
    )
    print(f"{'TOTAL (ph+eye+gather)':26s} {t_ph + t_eye + t_g:8.3f} s")


if __name__ == "__main__":
    main()
