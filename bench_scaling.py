"""Scaling-efficiency harness (BASELINE.md north star: >= 80 % rays/s
efficiency at N >= 2).

Sweeps 1-D mesh sizes over the available devices, renders the same frame
with the pixel batch sharded over each mesh, and reports per-mesh wall time
plus efficiency = t_1 / (N * t_N).

Runs TODAY on the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python bench_scaling.py

and unchanged on a real pod slice the day multi-chip hardware exists (the
mesh comes from jax.devices()).  Virtual-CPU numbers measure the sharding
machinery's overhead, not ICI — they are recorded so the harness and its
output format are proven before real hardware.

Prints ONE JSON line {"metric": "scaling_efficiency", ...}.
"""

import json
import os
import sys
import tempfile
import time

import jax

from gpu_pathtracer_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    width = height = int(os.environ.get("BENCH_SIZE", "256"))
    spp = int(os.environ.get("BENCH_SPP", "4"))
    level = int(os.environ.get("BENCH_LEVEL", "4"))

    from gpu_pathtracer_tpu.models.camera import Camera
    from gpu_pathtracer_tpu.models.scene import build_scene
    from gpu_pathtracer_tpu.parallel import make_mesh
    from gpu_pathtracer_tpu.parallel.shard import render_image_distributed
    from gpu_pathtracer_tpu.utils import testscenes
    from gpu_pathtracer_tpu.utils.obj_io import load_scene

    folder = tempfile.mkdtemp(prefix="bench_scaling_")
    testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
    scene = build_scene(load_scene(folder, "box.obj"))
    camera = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=width, height=height,
    )
    kw = dict(
        width=width, height=height, sample_size=spp, level=level,
        hittable_pdf_weight=0.5,
    )

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    rays = width * height * spp * level

    results = []
    for n in sizes:
        mesh = make_mesh(devices[:n])
        img = render_image_distributed(
            scene, camera, jax.random.key(0), mesh=mesh, **kw
        )
        jax.block_until_ready(img)  # compile
        t0 = time.time()
        img = render_image_distributed(
            scene, camera, jax.random.key(1), mesh=mesh, **kw
        )
        jax.block_until_ready(img)
        dt = time.time() - t0
        results.append({"n": n, "seconds": round(dt, 4),
                        "rays_per_sec": round(rays / dt, 1)})

    t1 = results[0]["seconds"]
    for rec in results:
        rec["efficiency"] = round(t1 / (rec["n"] * rec["seconds"]), 3)

    eff_at_max = results[-1]["efficiency"] if len(results) > 1 else 1.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": eff_at_max,
                "unit": f"t1/(N*tN) at N={results[-1]['n']}",
                "vs_baseline": round(eff_at_max / 0.8, 3),  # target 0.8
                "detail": {
                    "sweep": results,
                    "size": width,
                    "spp": spp,
                    "level": level,
                    "backend": jax.default_backend(),
                    "virtual_mesh": jax.default_backend() == "cpu",
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
