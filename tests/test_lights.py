"""Light-tree tests: dense matmul pdf == reference walk, normalization,
and the categorical pick distribution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_pathtracer_tpu.ops import lights


def _random_tree(key, e):
    k1, k2, k3 = jax.random.split(key, 3)
    tri_p = jax.random.uniform(k1, (e, 3, 3), minval=-2.0, maxval=2.0)
    tri_n = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (e * 3, 1)).reshape(e, 3, 3)
    tri_uv = jnp.zeros((e, 3, 2))
    energy = jax.random.uniform(k2, (e, 3), minval=0.1, maxval=5.0)
    return lights.build_light_tree(
        tri_p, tri_n, tri_uv, energy, jnp.arange(e, dtype=jnp.int32)
    )


@pytest.mark.parametrize("e", [1, 2, 3, 7, 16, 33])
def test_dense_pdf_matches_walk(e):
    key = jax.random.key(e)
    lt = _random_tree(key, e)
    r = 64
    point = jax.random.uniform(jax.random.fold_in(key, 1), (r, 3), minval=-3, maxval=3)
    pivot = jax.random.normal(jax.random.fold_in(key, 2), (r, 3))
    pivot = pivot / jnp.linalg.norm(pivot, axis=-1, keepdims=True)

    dense = lights.leaf_node_pdfs(lt, point, pivot)
    walk = lights.leaf_node_pdfs_walk(lt, point, pivot)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(walk), rtol=2e-4, atol=1e-7)


def test_pdf_normalized():
    lt = _random_tree(jax.random.key(0), 16)
    r = 32
    point = jax.random.uniform(jax.random.key(1), (r, 3), minval=-3, maxval=3)
    pivot = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (r, 1))
    pdf = lights.leaf_node_pdfs(lt, point, pivot)
    np.testing.assert_allclose(np.asarray(pdf.sum(-1)), 1.0, rtol=1e-4)


def test_pick_dense_matches_pdf_histogram():
    lt = _random_tree(jax.random.key(3), 8)
    r = 20000
    point = jnp.tile(jnp.array([[0.0, 3.0, 0.0]]), (r, 1))
    pivot = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (r, 1))
    pdf = lights.leaf_node_pdfs(lt, point, pivot)
    leaf = lights.pick_light_dense(lt, pdf, jax.random.key(4))
    hist = np.bincount(np.asarray(leaf), minlength=8) / r
    np.testing.assert_allclose(hist, np.asarray(pdf[0]), atol=0.02)
