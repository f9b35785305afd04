"""Point-splat debug images (point_operations.h:19-75) + BVH validate
(the library form of the reference's `check` kernel, bvh_building.h:187-219).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.ops import bvh as bvh_mod
from gpu_pathtracer_tpu.render.splat import splat_points


def _camera(w=32, h=32):
    return Camera.create(
        eye=(0.0, 0.0, 2.0), center=(0.0, 0.0, 0.0), up=(0, 1, 0),
        fovy_deg=60.0, width=w, height=h,
    )


def test_splat_center_point_lands_mid_frame():
    cam = _camera()
    loc = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
    col = jnp.array([[1.0, 0.5, 0.25]], jnp.float32)
    img = splat_points(cam, loc, col, 32, 32)
    i, j = np.unravel_index(np.argmax(np.asarray(img)[..., 0]), (32, 32))
    assert abs(i - 16) <= 1 and abs(j - 16) <= 1
    np.testing.assert_allclose(np.asarray(img[i, j]), [1.0, 0.5, 0.25])
    # exactly one pixel written
    assert np.sum(np.asarray(img)[..., 0] > 0) == 1


def test_splat_drops_invalid_and_behind():
    cam = _camera()
    loc = jnp.array(
        [[jnp.inf, 0.0, 0.0], [0.0, 0.0, 5.0], [0.0, 0.0, 0.0]], jnp.float32
    )  # inf, behind the eye, valid
    col = jnp.ones((3, 3), jnp.float32)
    img = splat_points(cam, loc, col, 32, 32)
    assert np.sum(np.asarray(img)[..., 0] > 0) == 1
    # valid mask drops the last point too
    img2 = splat_points(
        cam, loc, col, 32, 32, valid=jnp.array([True, True, False])
    )
    assert np.sum(np.asarray(img2)[..., 0] > 0) == 0


def test_bvh_validate_clean_and_corrupted():
    rng = np.random.default_rng(3)
    c = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    pmin, pmax = c - 0.02, c + 0.02
    tree = bvh_mod.build_bvh(jnp.asarray(pmin), jnp.asarray(pmax), leaf_size=4)
    fails = bvh_mod.validate(tree, pmin, pmax)
    assert all(v == 0 for v in fails.values()), fails

    # shrink the root AABB -> containment must trip
    import dataclasses

    bad = dataclasses.replace(
        tree, aabb_max=tree.aabb_max.at[0].set(tree.aabb_min[0])
    )
    fails_bad = bvh_mod.validate(bad, pmin, pmax)
    assert fails_bad["aabb_containment"] > 0
