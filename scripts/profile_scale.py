"""Separate dispatch overhead from per-ray cost: scale R and fit."""
import time, tempfile, sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp

from gpu_pathtracer_tpu.utils.platform import apply_platform_env
apply_platform_env()

from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene
from gpu_pathtracer_tpu.ops import trace, materials
from gpu_pathtracer_tpu.render.integrator import trace_paths, interpolate_hit

folder = tempfile.mkdtemp()
testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
scene = build_scene(load_scene(folder, "box.obj"))
g = scene.geom
table = scene.materials
key = jax.random.key(0)


def mk(R):
    o = jnp.tile(jnp.array([[0.5, 0.5, 2.4]], jnp.float32), (R, 1))
    t = jnp.linspace(-0.4, 0.4, R)
    d = jnp.stack([t, jnp.sin(t * 17) * 0.3, -jnp.ones_like(t)], -1)
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def timeit(name, f, *args, n=20):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:38s} {dt*1e3:8.3f} ms")
    return dt


noop = jax.jit(lambda x: x + 1.0)
timeit("noop jit", noop, jnp.zeros((8, 128)))

for R in (65536, 262144):
    o, d = mk(R)
    ch = jax.jit(lambda o, d: trace.closest_hit(g, o, d))
    timeit(f"closest_hit R={R}", ch, o, d)

    @jax.jit
    def shade(o, d, key):
        t_, slot, bary, hit = trace.closest_hit(g, o, d)
        point, uv, normal, mat_id = interpolate_hit(g, table, slot, bary)
        ids, ln = materials.stack_init((o.shape[0],), 8)
        ref = materials.sample_bsdf(table, mat_id, point, d, normal, uv, ids, ln, key)
        return ref.dir, ref.filter

    timeit(f"hit+interp+bsdf R={R}", shade, o, d, key)

    tp = jax.jit(lambda o, d, k: trace_paths(
        scene, o, d, k, level=8, hittable_pdf_weight=0.5))
    timeit(f"trace_paths L8 R={R}", tp, o, d, key, n=5)
