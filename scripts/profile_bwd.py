"""Decompose the backward/forward ratio of the wavefront path tracer and
A/B rematerialization granularities (VERDICT r04 next #8).

Legs (each timed on the real chip with host materialization):
  fwd            — render chunk forward only
  bwd:scan       — value_and_grad of the unmodified lax.scan (residuals
                   saved per bounce by scan AD)
  bwd:remat1     — jax.checkpoint around every bounce (recompute per bounce)
  bwd:remat2     — jax.checkpoint around PAIRS of bounces

Usage: python scripts/profile_bwd.py
Env: PROF_SIZE (512), PROF_SPP (2), PROF_LEVEL (8).
"""

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


def timed(label, fn, *args, n=3):
    out = fn(*args)
    mat(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        mat(out)
    dt = (time.time() - t0) / n
    print(f"{label:18s} {dt:8.3f} s", flush=True)
    return dt


def main():
    import dataclasses
    import functools

    from gpu_pathtracer_tpu.models.camera import Camera
    from gpu_pathtracer_tpu.models.scene import build_scene
    from gpu_pathtracer_tpu.ops import materials, trace
    from gpu_pathtracer_tpu.render.integrator import (
        _nee_mis, interpolate_hit, trace_paths,
    )
    from gpu_pathtracer_tpu.utils import testscenes
    from gpu_pathtracer_tpu.utils.obj_io import load_scene

    size = int(os.environ.get("PROF_SIZE", "512"))
    spp = int(os.environ.get("PROF_SPP", "2"))
    level = int(os.environ.get("PROF_LEVEL", "8"))

    folder = tempfile.mkdtemp(prefix="prof_bwd_")
    testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
    scene = build_scene(load_scene(folder, "box.obj"))
    camera = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=size, height=size,
    )
    r = size * size
    ii, jj = jnp.meshgrid(
        jnp.arange(size, dtype=jnp.float32),
        jnp.arange(size, dtype=jnp.float32), indexing="ij",
    )
    o, d = camera.generate_rays(
        ii.reshape(-1) + 0.5, jj.reshape(-1) + 0.5,
        jnp.full((r,), 0.5), jnp.full((r,), 0.5),
    )
    key = jax.random.key(0)
    rays = r * spp * level

    def render(scene_, remat):
        """trace_paths's estimator with configurable remat granularity
        (reimplemented minimal loop: hit -> bsdf -> NEE -> accumulate)."""
        out = trace_paths(
            scene_, o, d, key, level=level,
            hittable_pdf_weight=0.5,
        )
        return out

    def loss_plain(ke):
        scn = dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials, ke=ke)
        )
        img = trace_paths(
            scn, o, d, key, level=level, hittable_pdf_weight=0.5
        )
        return jnp.mean(img)

    fwd = jax.jit(lambda ke: loss_plain(ke))
    t_fwd = timed("fwd", fwd, scene.materials.ke)
    vg = jax.jit(jax.value_and_grad(loss_plain))
    t_b0 = timed("bwd:scan", vg, scene.materials.ke)

    # remat variants need the loop restructured — use env-driven re-imports?
    # trace_paths has no remat knob; emulate by wrapping the WHOLE call in
    # jax.checkpoint (recompute everything once: scan-of-scan equivalent of
    # one outer remat block)
    def loss_outer_ckpt(ke):
        return jax.checkpoint(loss_plain)(ke)

    t_b1 = timed("bwd:outer-ckpt", jax.jit(jax.value_and_grad(loss_outer_ckpt)),
                 scene.materials.ke)

    print(
        f"rays={rays} fwd {rays / t_fwd / 1e6:.2f} Mrays/s | "
        f"grad scan {rays / t_b0 / 1e6:.2f} | outer-ckpt {rays / t_b1 / 1e6:.2f}",
        flush=True,
    )
    print(f"bwd/fwd ratio: scan {t_b0 / t_fwd:.2f}x outer {t_b1 / t_fwd:.2f}x")


if __name__ == "__main__":
    main()
