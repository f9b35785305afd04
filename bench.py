"""Benchmark: forward / backward / SPPM throughput on TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "detail"}.
The primary metric stays `rays_per_sec_fwd_512` (comparable across rounds);
`detail` carries the BASELINE.md companion metrics:

* grad_rays_per_sec — rays/s through `jax.grad` of an L2 loss over the
  render (BASELINE.md: grad-rays/sec/chip is a first-class metric);
* sppm_photons_per_sec — photon-pass throughput (photons traced / second);
* with BENCH_SCENE=mesh, the forward metric runs on a 327k-triangle
  displaced icosphere (the HBM-resident Pallas traversal) instead of the
  ~1k-tri Cornell box.

Metric definition: every wavefront step advances one bounce for every pixel
sample, so rays = W*H*spp*level.  The reference publishes no numbers
(BASELINE.md); vs_baseline is the ratio against the first recorded real-TPU
number (r01: 5.33M rays/s fwd @512).
"""

import json
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.utils.platform import apply_platform_env

# honor JAX_PLATFORMS even though sitecustomize imported jax already
apply_platform_env()

R01_BASELINE_RAYS_PER_SEC = 5.33e6  # first recorded real-TPU forward number


def _cornell_scene():
    from gpu_pathtracer_tpu.models.scene import build_scene
    from gpu_pathtracer_tpu.utils import testscenes
    from gpu_pathtracer_tpu.utils.obj_io import load_scene

    folder = tempfile.mkdtemp(prefix="bench_scene_")
    testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
    return build_scene(load_scene(folder, "box.obj"))


def _mesh_scene():
    from gpu_pathtracer_tpu.models.scene import build_scene
    from gpu_pathtracer_tpu.utils import testscenes

    return build_scene(testscenes.make_mesh_scene_host(subdiv=7))  # 327k tris


def main():
    width = height = int(os.environ.get("BENCH_SIZE", "512"))
    spp = int(os.environ.get("BENCH_SPP", "8"))
    level = int(os.environ.get("BENCH_LEVEL", "8"))
    scene_kind = os.environ.get("BENCH_SCENE", "cornell")
    skip_extras = os.environ.get("BENCH_SKIP_EXTRAS")

    from gpu_pathtracer_tpu.models.camera import Camera
    from gpu_pathtracer_tpu.render import render_image

    if scene_kind == "mesh":
        scene = _mesh_scene()
        camera = Camera.create(
            eye=(0.5, 0.8, 2.2), center=(0.5, 0.45, 0.5), up=(0, 1, 0),
            fovy_deg=45.0, width=width, height=height,
        )
    else:
        scene = _cornell_scene()
        camera = Camera.create(
            eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
            fovy_deg=40.0, width=width, height=height,
        )

    kw = dict(
        width=width, height=height, sample_size=spp, level=level,
        hittable_pdf_weight=0.5,
    )

    # ---- forward ----------------------------------------------------------
    img = render_image(scene, camera, jax.random.key(0), **kw)  # compile
    jax.block_until_ready(img)
    t0 = time.time()
    img = render_image(scene, camera, jax.random.key(1), **kw)
    jax.block_until_ready(img)
    fwd_dt = time.time() - t0
    rays = width * height * spp * level
    fwd_rps = rays / fwd_dt

    detail = {
        "size": width,
        "spp": spp,
        "level": level,
        "scene": scene_kind,
        "num_tris": scene.geom.num_tris,
        "seconds_fwd": round(fwd_dt, 3),
        "backend": jax.default_backend(),
    }

    if not skip_extras:
        # ---- backward (grad-rays/s, BASELINE.md metric) -------------------
        import dataclasses

        bw_spp = max(1, spp // 4)  # backward holds remat state; smaller batch
        target = jax.lax.stop_gradient(img)

        def loss(ke):
            scn = dataclasses.replace(
                scene, materials=dataclasses.replace(scene.materials, ke=ke)
            )
            out = render_image(
                scn, camera, jax.random.key(2), width=width, height=height,
                sample_size=bw_spp, level=level, hittable_pdf_weight=0.5,
            )
            return jnp.mean((out - target) ** 2)

        grad_fn = jax.jit(jax.grad(loss))
        g = grad_fn(scene.materials.ke)  # compile
        jax.block_until_ready(g)
        t0 = time.time()
        g = grad_fn(scene.materials.ke * 1.01)
        jax.block_until_ready(g)
        bwd_dt = time.time() - t0
        grad_rays = width * height * bw_spp * level
        detail["grad_rays_per_sec"] = round(grad_rays / bwd_dt, 1)
        detail["seconds_bwd"] = round(bwd_dt, 3)

        # ---- SPPM photon pass (photons/s) ---------------------------------
        if scene.light_tree is not None:
            from gpu_pathtracer_tpu.render import sppm

            n_phot = int(os.environ.get("BENCH_PHOTONS", "200000"))
            ph = sppm.photon_pass(
                scene, jax.random.key(3), n_photons=n_phot, max_bounce=8
            )
            jax.block_until_ready(ph.pos)
            t0 = time.time()
            ph = sppm.photon_pass(
                scene, jax.random.key(4), n_photons=n_phot, max_bounce=8
            )
            jax.block_until_ready(ph.pos)
            ph_dt = time.time() - t0
            detail["sppm_photons_per_sec"] = round(n_phot / ph_dt, 1)
            detail["seconds_photon_pass"] = round(ph_dt, 3)

    print(
        json.dumps(
            {
                "metric": (
                    "rays_per_sec_fwd_512" if scene_kind == "cornell"
                    else f"rays_per_sec_fwd_{scene_kind}_{width}"
                ),
                "value": round(fwd_rps, 1),
                "unit": "rays/s",
                "vs_baseline": round(fwd_rps / R01_BASELINE_RAYS_PER_SEC, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
