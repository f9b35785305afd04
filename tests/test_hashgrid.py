"""Hash-grid photon map: structural properties + equivalence with the dense
all-pairs gather (ops/hashgrid.py, render/sppm.py surface_gather_grid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_pathtracer_tpu.ops import hashgrid


def test_query_finds_all_in_radius_neighbors():
    """No false negatives for query radius <= cell size (candidate superset)."""
    key = jax.random.key(0)
    p = 512
    pos = jax.random.uniform(key, (p, 3), minval=-2.0, maxval=2.0)
    valid = jnp.ones((p,), bool)
    radius = 0.25
    grid = hashgrid.build_grid(pos, valid, jnp.float32(radius))

    q = jax.random.uniform(jax.random.fold_in(key, 1), (64, 3), minval=-1.5, maxval=1.5)
    cand, ok = hashgrid.query_candidates(grid, q, k_per_cell=p)  # no cap

    d2 = jnp.sum((pos[None, :, :] - q[:, None, :]) ** 2, axis=-1)
    in_r = d2 <= radius**2  # (Q, P)

    cand_np = np.asarray(cand)
    ok_np = np.asarray(ok)
    in_r_np = np.asarray(in_r)
    for qi in range(q.shape[0]):
        expected = set(np.nonzero(in_r_np[qi])[0].tolist())
        got = set(cand_np[qi][ok_np[qi]].tolist())
        missing = expected - got
        assert not missing, f"query {qi} missing neighbors {missing}"


def test_invalid_photons_never_returned():
    key = jax.random.key(2)
    p = 128
    pos = jax.random.uniform(key, (p, 3))
    valid = jnp.arange(p) % 2 == 0
    grid = hashgrid.build_grid(pos, valid, jnp.float32(0.3))
    cand, ok = hashgrid.query_candidates(grid, pos, k_per_cell=p)
    cand_np = np.asarray(cand)
    ok_np = np.asarray(ok)
    returned = set(cand_np[ok_np].tolist())
    invalid = set(np.nonzero(~np.asarray(valid))[0].tolist())
    assert not (returned & invalid)


def test_build_is_jittable_and_static_shape():
    pos = jnp.zeros((64, 3))
    valid = jnp.ones((64,), bool)
    built = jax.jit(lambda p, v: hashgrid.build_grid(p, v, jnp.float32(0.1)))(
        pos, valid
    )
    assert built.sorted_idx.shape == (64,)


@pytest.fixture(scope="module")
def sppm_scene():
    import tempfile

    from gpu_pathtracer_tpu.models.scene import build_scene
    from gpu_pathtracer_tpu.utils import testscenes
    from gpu_pathtracer_tpu.utils.obj_io import load_scene

    folder = tempfile.mkdtemp(prefix="hashgrid_scene_")
    testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=1)
    return build_scene(load_scene(folder, "box.obj"))


def test_grid_gather_matches_dense(sppm_scene):
    """surface_gather_grid == surface_gather when k caps don't bind."""
    from gpu_pathtracer_tpu.render import sppm

    scene = sppm_scene
    key = jax.random.key(7)
    photons = sppm.photon_pass(scene, key, n_photons=256, max_bounce=6)

    r = 128
    hp_loc = jax.random.uniform(
        jax.random.fold_in(key, 1), (r, 3), minval=0.05, maxval=0.95
    )
    hp_normal = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (r, 1))
    hp_radius = jnp.full((r,), 0.15)
    hp_valid = jnp.ones((r,), bool)

    flux_d, count_d = sppm.surface_gather(
        scene, photons, hp_loc, hp_normal, hp_radius, hp_valid, k_nearest=64
    )
    flux_g, count_g = sppm.surface_gather_grid(
        scene, photons, hp_loc, hp_normal, hp_radius, hp_valid,
        k_nearest=64, k_per_cell=256, chunk=64,
    )
    np.testing.assert_allclose(
        np.asarray(flux_g), np.asarray(flux_d), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(count_g), np.asarray(count_d))
