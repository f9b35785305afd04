"""Benchmark: path-tracer forward throughput on the Cornell benchmark scene.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: rays/sec (bounce-steps per second) at 512x512 — every wavefront scan
step advances one bounce for every pixel sample, so rays = W*H*spp*level.
The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against a fixed reference budget recorded in this file the first time
a real-TPU number exists.
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


def main():
    width = height = int(os.environ.get("BENCH_SIZE", "512"))
    spp = int(os.environ.get("BENCH_SPP", "8"))
    level = int(os.environ.get("BENCH_LEVEL", "8"))

    from gpu_pathtracer_tpu.models.camera import Camera
    from gpu_pathtracer_tpu.models.scene import build_scene
    from gpu_pathtracer_tpu.render import render_image
    from gpu_pathtracer_tpu.utils import testscenes
    from gpu_pathtracer_tpu.utils.obj_io import load_scene

    folder = tempfile.mkdtemp(prefix="bench_scene_")
    testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
    host = load_scene(folder, "box.obj")
    scene = build_scene(host)
    camera = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=width, height=height,
    )

    kw = dict(
        width=width, height=height, sample_size=spp, level=level,
        hittable_pdf_weight=0.5,
    )

    # warmup / compile
    img = render_image(scene, camera, jax.random.key(0), **kw)
    jax.block_until_ready(img)

    t0 = time.time()
    img = render_image(scene, camera, jax.random.key(1), **kw)
    jax.block_until_ready(img)
    dt = time.time() - t0

    rays = width * height * spp * level
    rays_per_sec = rays / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_fwd_512",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": 1.0,
                "detail": {
                    "size": width,
                    "spp": spp,
                    "level": level,
                    "seconds": round(dt, 3),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
