"""Raw TPU gather cost vs alternatives (one-hot matmul for small tables)."""
import time, sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp

from gpu_pathtracer_tpu.utils.platform import apply_platform_env
apply_platform_env()

R = 262144
key = jax.random.key(0)
idx_tri = jax.random.randint(jax.random.fold_in(key, 0), (R,), 0, 972)
idx_mat = jax.random.randint(jax.random.fold_in(key, 1), (R,), 0, 4)

tri_tab = jax.random.normal(jax.random.fold_in(key, 2), (972, 36))
mat_tab = jax.random.normal(jax.random.fold_in(key, 3), (4, 16))
big_tab = jax.random.normal(jax.random.fold_in(key, 4), (1048576, 36))
idx_big = jax.random.randint(jax.random.fold_in(key, 5), (R,), 0, 1048576)


def timeit(name, f, *args, n=30):
    f = jax.jit(f)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return dt


timeit("gather (972,36)[R]", lambda t, i: t[i], tri_tab, idx_tri)
timeit("gather (972,36)[R] x4", lambda t, i: (t[i], t[(i+1)%972], t[(i+2)%972], t[(i+3)%972]), tri_tab, idx_tri)
timeit("one-hot matmul (972,36)", lambda t, i: jax.nn.one_hot(i, 972, dtype=t.dtype) @ t, tri_tab, idx_tri)
timeit("gather (4,16)[R]", lambda t, i: t[i], mat_tab, idx_mat)
timeit("one-hot matmul (4,16)", lambda t, i: jax.nn.one_hot(i, 4, dtype=t.dtype) @ t, mat_tab, idx_mat)
timeit("gather (1M,36)[R]", lambda t, i: t[i], big_tab, idx_big)
timeit("gather 1 col (972,)[R]", lambda t, i: t[:, 0][i], tri_tab, idx_tri)
timeit("gather 16 sep cols (972,)[R]",
       lambda t, i: sum(t[:, c][i] for c in range(16)), tri_tab, idx_tri)
# sorted indices (ray coherence)
idx_sorted = jnp.sort(idx_big)
timeit("gather (1M,36)[R sorted]", lambda t, i: t[i], big_tab, idx_sorted)
