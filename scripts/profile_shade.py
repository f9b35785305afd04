"""Ablate the shading path on the real chip: which piece of
interpolate_hit + sample_bsdf costs the time?"""
import time, tempfile, sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp

from gpu_pathtracer_tpu.utils.platform import apply_platform_env
apply_platform_env()

from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene
from gpu_pathtracer_tpu.ops import trace, materials, sampling, linalg
from gpu_pathtracer_tpu.render.integrator import interpolate_hit

folder = tempfile.mkdtemp()
testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
scene = build_scene(load_scene(folder, "box.obj"))
g = scene.geom
table = scene.materials

R = 65536
key = jax.random.key(0)
o = jnp.tile(jnp.array([[0.5, 0.5, 2.4]], jnp.float32), (R, 1))
t = jnp.linspace(-0.4, 0.4, R)
d = jnp.stack([t, jnp.sin(t * 17) * 0.3, -jnp.ones_like(t)], -1)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

t_, slot, bary, hit = jax.jit(lambda o, d: trace.closest_hit(g, o, d))(o, d)
jax.block_until_ready(slot)
point, uv, normal, mat_id = jax.jit(
    lambda s, b: interpolate_hit(g, table, s, b)
)(slot, bary)
jax.block_until_ready(point)
ids, ln = materials.stack_init((R,), 8)


def timeit(name, fn, *args, n=30):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:34s} {dt*1e3:8.3f} ms")
    return dt


timeit("interpolate_hit", lambda s, b: interpolate_hit(g, table, s, b), slot, bary)
timeit("gather p/uv/n only", lambda s: (
    trace.gather_rows(g.p, jnp.maximum(s, 0)),
    trace.gather_rows(g.uv, jnp.maximum(s, 0)),
    trace.gather_rows(g.n, jnp.maximum(s, 0)),
    g.mat_id[jnp.maximum(s, 0)],
), slot)
timeit("sample_bsdf", lambda mi, p, dd, nn, u, i, l, k: materials.sample_bsdf(
    table, mi, p, dd, nn, u, i, l, k), mat_id, point, d, normal, uv, ids, ln, key)

# pieces of sample_bsdf
def rng_only(k):
    u0 = jax.random.uniform(jax.random.fold_in(k, 0), (R,))
    u1 = jax.random.uniform(jax.random.fold_in(k, 1), (R,))
    u2 = jax.random.uniform(jax.random.fold_in(k, 2), (R,))
    u3 = jax.random.uniform(jax.random.fold_in(k, 3), (R,))
    return u0 + u1 + u2 + u3
timeit("4x random.uniform", rng_only, key)

timeit("find_highest_prioritised", lambda i, l: materials.find_highest_prioritised(
    table, i, l), ids, ln)

timeit("phong_exponent", lambda mi, u: table.phong_exponent(mi, u), mat_id, uv)
timeit("diffuse+specular+emission color", lambda mi, u: (
    table.diffuse_color(mi, u), table.specular_color(mi, u),
    table.emission_color(mi, u)), mat_id, uv)

u1 = jax.random.uniform(key, (R,))
u2 = jax.random.uniform(key, (R,))
timeit("generate_direction x3", lambda md, nn, n, a, b: (
    sampling.generate_direction(md, nn, jnp.zeros((R,), jnp.int32), n, a, b),
    sampling.generate_direction(md, nn, jnp.ones((R,), jnp.int32), n, a, b),
    sampling.generate_direction(md, nn, jnp.ones((R,), jnp.int32), n, a, b),
), d, normal, jnp.full((R,), 10.0), u1, u2)

timeit("phong_filter x4", lambda k_, n, idd, od: (
    sampling.phong_filter(k_, n, idd, od), sampling.phong_filter_2(k_, n, idd, od),
    sampling.phong_filter(k_, n, idd, od), sampling.phong_filter_2(k_, n, idd, od),
), jnp.ones((R, 3)), jnp.full((R,), 10.0), normal, d)

timeit("stack_rearrange", lambda i, l, mi: materials.stack_rearrange(
    i, l, mi, jnp.zeros((R,), bool), jnp.ones((R,), bool),
    jnp.ones((R,), bool), jnp.ones((R,), bool)), ids, ln, mat_id)
