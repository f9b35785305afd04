"""Large-mesh path (BASELINE config 2 at stress scale): procedural displaced
icosphere, BVH traversal vs dense oracle, and the HBM-resident Pallas kernel
(`big=True`) that lifts the VMEM triangle cap."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.ops import pallas_trace, trace
from gpu_pathtracer_tpu.render import render_image
from gpu_pathtracer_tpu.utils import testscenes


@pytest.fixture(scope="module")
def mesh_scene():
    # subdiv=4 -> 5,124 triangles: above DENSE_MAX (4096), so the dispatch
    # exercises the threaded-BVH path on CPU
    return build_scene(testscenes.make_mesh_scene_host(subdiv=4))


def _rays(n, key=0):
    k = jax.random.key(key)
    o = jnp.tile(jnp.array([[0.5, 0.8, 2.2]]), (n, 1))
    target = jax.random.uniform(
        jax.random.fold_in(k, 1), (n, 3),
        minval=jnp.array([0.0, 0.0, 0.0]), maxval=jnp.array([1.0, 1.2, 1.0]),
    )
    d = target - o
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_mesh_bvh_matches_dense_oracle(mesh_scene):
    g = mesh_scene.geom
    assert g.num_tris > trace.DENSE_MAX  # the point of the test
    o, d = _rays(512)
    t_bvh, slot_bvh, _, hit_bvh = trace.closest_hit(g, o, d)
    t_dense, slot_dense, _, hit_dense = trace.closest_hit_dense(
        g.p, g.tol, g.valid, o, d
    )
    np.testing.assert_array_equal(np.asarray(hit_bvh), np.asarray(hit_dense))
    h = np.asarray(hit_bvh)
    np.testing.assert_allclose(
        np.asarray(t_bvh)[h], np.asarray(t_dense)[h], rtol=1e-5
    )


def test_big_pallas_kernel_matches_dense(mesh_scene):
    """HBM-resident kernel (per-tile DMA under the cull) == dense oracle on
    the real displaced mesh, in interpret mode."""
    g = mesh_scene.geom
    o, d = _rays(256, key=3)
    t_big, slot_big, hit_big = pallas_trace.closest_hit_pallas(
        g.tri_cols, g.tile_aabb, o, d, interpret=True, big=True
    )
    t_dense, slot_dense, _, hit_dense = trace.closest_hit_dense(
        g.p, g.tol, g.valid, o, d
    )
    np.testing.assert_array_equal(np.asarray(hit_big), np.asarray(hit_dense))
    h = np.asarray(hit_dense)
    np.testing.assert_allclose(
        np.asarray(t_big)[h], np.asarray(t_dense)[h], rtol=1e-5
    )


def test_mesh_render_smoke(mesh_scene):
    cam = Camera.create(
        eye=(0.5, 0.8, 2.2), center=(0.5, 0.45, 0.5), up=(0, 1, 0),
        fovy_deg=45.0, width=16, height=16,
    )
    img = np.asarray(
        render_image(
            mesh_scene, cam, jax.random.key(2), width=16, height=16,
            sample_size=2, level=3, hittable_pdf_weight=0.5,
        )
    )
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.mean() > 1e-3, f"mesh render black: {img.mean()}"
