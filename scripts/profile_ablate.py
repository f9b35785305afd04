"""In-jit ablation: compile bounce variants with pieces disabled, all within
one jit call so dispatch overhead doesn't contaminate the numbers."""
import time, tempfile, sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp

from gpu_pathtracer_tpu.utils.platform import apply_platform_env
apply_platform_env()

from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene
from gpu_pathtracer_tpu.ops import trace, materials, linalg
from gpu_pathtracer_tpu.render.integrator import interpolate_hit, _nee_mis

folder = tempfile.mkdtemp()
testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
scene = build_scene(load_scene(folder, "box.obj"))
g = scene.geom
table = scene.materials
key = jax.random.key(0)

R = 262144
LEVEL = 8
o0 = jnp.tile(jnp.array([[0.5, 0.5, 2.4]], jnp.float32), (R, 1))
t = jnp.linspace(-0.4, 0.4, R)
d0 = jnp.stack([t, jnp.sin(t * 17) * 0.3, -jnp.ones_like(t)], -1)
d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)


def loop(body):
    def run(o, d, key):
        state = dict(o=o, d=d, acc=jnp.zeros((R, 3)))
        def step(state, i):
            return body(state, jax.random.fold_in(key, i)), None
        state, _ = jax.lax.scan(step, state, jnp.arange(LEVEL))
        return state["acc"]
    return jax.jit(run)


def timeit(name, f, *args, n=5):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:40s} {dt*1e3:9.3f} ms   {dt/LEVEL*1e3:7.3f} ms/bounce")
    return dt


# A: trace only — bounce = perturb direction deterministically
def body_trace(state, bkey):
    t_, slot, bary, hit = trace.closest_hit(g, state["o"], state["d"])
    newd = linalg.normalize(state["d"] + 0.01 * bary, 1e-9)
    return dict(o=state["o"] + t_[..., None].clip(0, 10) * state["d"] * 0.5,
                d=newd, acc=state["acc"] + bary)

timeit("A trace only", loop(body_trace), o0, d0, key)


# B: trace + interp
def body_interp(state, bkey):
    t_, slot, bary, hit = trace.closest_hit(g, state["o"], state["d"])
    point, uv, normal, mat_id = interpolate_hit(g, table, slot, bary)
    newd = linalg.normalize(state["d"] + 0.01 * normal, 1e-9)
    return dict(o=point, d=newd, acc=state["acc"] + normal)

timeit("B trace+interp", loop(body_interp), o0, d0, key)


# C: trace + interp + bsdf
def body_bsdf(state, bkey):
    t_, slot, bary, hit = trace.closest_hit(g, state["o"], state["d"])
    point, uv, normal, mat_id = interpolate_hit(g, table, slot, bary)
    ids, ln = materials.stack_init((R,), 8)
    ref = materials.sample_bsdf(table, mat_id, point, state["d"], normal, uv,
                                ids, ln, jax.random.fold_in(bkey, 17))
    return dict(o=ref.origin, d=ref.dir, acc=state["acc"] + ref.filter)

timeit("C trace+interp+bsdf", loop(body_bsdf), o0, d0, key)


# D: C + NEE
def body_nee(state, bkey):
    t_, slot, bary, hit = trace.closest_hit(g, state["o"], state["d"])
    point, uv, normal, mat_id = interpolate_hit(g, table, slot, bary)
    ids, ln = materials.stack_init((R,), 8)
    ref = materials.sample_bsdf(table, mat_id, point, state["d"], normal, uv,
                                ids, ln, jax.random.fold_in(bkey, 17))
    nd, nf, fac = _nee_mis(scene, ref, normal, state["d"], 0.5,
                           jax.random.fold_in(bkey, 23))
    return dict(o=ref.origin, d=nd, acc=state["acc"] + nf * fac[..., None])

timeit("D trace+interp+bsdf+nee", loop(body_nee), o0, d0, key)


# E: bsdf only (no trace): reuse fixed hit attrs
def body_bsdf_only(state, bkey):
    point, uv, normal = state["o"], state["o"][:, :2], state["d"]
    mat_id = jnp.zeros((R,), jnp.int32)
    ids, ln = materials.stack_init((R,), 8)
    ref = materials.sample_bsdf(table, mat_id, point, state["d"], normal, uv,
                                ids, ln, jax.random.fold_in(bkey, 17))
    return dict(o=ref.origin, d=ref.dir, acc=state["acc"] + ref.filter)

timeit("E bsdf only (no trace)", loop(body_bsdf_only), o0, d0, key)


# F: RNG only
def body_rng(state, bkey):
    acc = state["acc"]
    for j in range(10):
        u = jax.random.uniform(jax.random.fold_in(bkey, j), (R,))
        acc = acc + u[..., None]
    return dict(o=state["o"], d=state["d"], acc=acc)

timeit("F 10x rng/bounce", loop(body_rng), o0, d0, key)
