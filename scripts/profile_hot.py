"""Decompose forward-render time on the real chip: full bounce step vs its
pieces (closest-hit, BSDF, NEE) at the bench wavefront width."""
import time, tempfile, sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp

from gpu_pathtracer_tpu.utils.platform import apply_platform_env
apply_platform_env()

from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene
from gpu_pathtracer_tpu.ops import trace, materials, lights
from gpu_pathtracer_tpu.render.integrator import trace_paths, interpolate_hit, _nee_mis

folder = tempfile.mkdtemp()
testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
scene = build_scene(load_scene(folder, "box.obj"))
g = scene.geom
print("tris:", g.p.shape, "pallas tiles:", None if g.tri_cols is None else g.tri_cols.shape)

R = 65536
key = jax.random.key(0)
o = jnp.tile(jnp.array([[0.5, 0.5, 2.4]], jnp.float32), (R, 1))
t = jnp.linspace(-0.4, 0.4, R)
d = jnp.stack([t, jnp.sin(t * 17) * 0.3, -jnp.ones_like(t)], -1)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def timeit(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:30s} {dt*1e3:8.3f} ms  {R/dt/1e6:8.2f} Mrays/s")
    return dt


ch = jax.jit(lambda o, d: trace.closest_hit(g, o, d))
timeit("closest_hit (pallas)", ch, o, d)

@jax.jit
def hit_plus_shade(o, d, key):
    t_, slot, bary, hit = trace.closest_hit(g, o, d)
    point, uv, normal, mat_id = interpolate_hit(g, scene.materials, slot, bary)
    ids, ln = materials.stack_init((R,), 8)
    ref = materials.sample_bsdf(scene.materials, mat_id, point, d, normal, uv, ids, ln, key)
    return ref.dir, ref.filter

timeit("hit + interp + bsdf", hit_plus_shade, o, d, key)

@jax.jit
def nee_only(o, d, key):
    t_, slot, bary, hit = trace.closest_hit(g, o, d)
    point, uv, normal, mat_id = interpolate_hit(g, scene.materials, slot, bary)
    ids, ln = materials.stack_init((R,), 8)
    ref = materials.sample_bsdf(scene.materials, mat_id, point, d, normal, uv, ids, ln, key)
    return _nee_mis(scene, ref, normal, d, 0.5, key)

timeit("hit + bsdf + nee", nee_only, o, d, key)

tp = jax.jit(lambda o, d, k: trace_paths(scene, o, d, k, level=8, hittable_pdf_weight=0.5))
dt = timeit("trace_paths level=8", tp, o, d, key, n=5)
print(f"per-bounce: {dt/8*1e3:.3f} ms -> {R*8/dt/1e6:.2f} M raysteps/s")
