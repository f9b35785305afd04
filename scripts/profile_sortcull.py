"""Measure the coherence-sort overhead vs the raw Pallas kernel, and the
effect of ray_chunk on full-frame throughput (bench config)."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.utils.platform import apply_platform_env

apply_platform_env()

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.ops import pallas_trace, trace
from gpu_pathtracer_tpu.render import render_image
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene

folder = tempfile.mkdtemp()
testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
scene = build_scene(load_scene(folder, "box.obj"))
g = scene.geom
print("tris:", g.p.shape[0], "tiles:", g.tri_cols.shape[0])


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:38s} {dt*1e3:8.3f} ms")
    return dt


for R in (65536, 262144):
    key = jax.random.key(0)
    o = jnp.tile(jnp.array([[0.5, 0.5, 2.4]], jnp.float32), (R, 1))
    t = jnp.linspace(-0.4, 0.4, R)
    d = jnp.stack([t, jnp.sin(t * 17) * 0.3, -jnp.ones_like(t)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    print(f"--- R={R}")

    raw = jax.jit(
        lambda o, d: pallas_trace.closest_hit_pallas(
            g.tri_cols, g.tile_aabb, o, d
        )
    )
    timeit("pallas raw (no sort)", raw, o, d)

    srt = jax.jit(lambda o, d: trace.closest_hit_pallas_sorted(g, o, d))
    timeit("pallas + coherence sort", srt, o, d)

    full = jax.jit(lambda o, d: trace.closest_hit(g, o, d))
    timeit("closest_hit (sort + winner_bary)", full, o, d)

    perm = jax.jit(lambda o, d: trace._coherence_perm(g, o, d))
    timeit("coherence perm (argsort) alone", perm, o, d)

cam = Camera.create(
    eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
    fovy_deg=40.0, width=512, height=512,
)
for chunk in (65536, 131072, 262144):
    fn = lambda k: render_image(
        scene, cam, k, width=512, height=512, sample_size=8, level=8,
        hittable_pdf_weight=0.5, ray_chunk=chunk,
    )
    dt = timeit(f"render 512x512 spp8 chunk={chunk}", fn, jax.random.key(1), n=3)
    print(f"  -> {512*512*8*8/dt/1e6:.2f} M rays/s")
