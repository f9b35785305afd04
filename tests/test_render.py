"""End-to-end integrator tests: analytic furnace cases + Cornell box.

The reference ships no tests (SURVEY.md §4); these encode the estimator
invariants its integrator satisfies by construction (pathtracing.h:86-200).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.render import render_image, trace_paths
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene


@pytest.fixture(scope="module")
def cornell(tmp_path_factory):
    folder = tmp_path_factory.mktemp("cornell")
    testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=1)
    host = load_scene(folder, "box.obj")
    return build_scene(host)


@pytest.fixture(scope="module")
def floor_scene(tmp_path_factory):
    """A single large diffuse floor quad, no lights, white sky."""
    folder = tmp_path_factory.mktemp("floor")
    mtl = ["newmtl grey", "Kd 0.73 0.73 0.73", "Ks 0 0 0", "d 1.0", "Ns 1"]
    obj = [
        "mtllib floor.mtl",
        "usemtl grey",
        "v -50 0 -50", "v -50 0 50", "v 50 0 50", "v 50 0 -50",
        "f 1 2 3", "f 1 3 4",
    ]
    (folder / "floor.mtl").write_text("\n".join(mtl) + "\n")
    (folder / "floor.obj").write_text("\n".join(obj) + "\n")
    host = load_scene(folder, "floor.obj")
    return build_scene(host, sky_emission=(1.0, 1.0, 1.0))


def test_furnace_diffuse_floor(floor_scene):
    """Downward rays onto a flat diffuse floor under a unit-white sky: the
    estimator is *deterministic* kd * clamp-factor — bounce 1 multiplies the
    throughput by kd*0.9999 (cosine pdf cancels exactly), bounce 2 leaves the
    plane upward and adds mask * sky."""
    r = 64
    o = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (r, 1))
    d = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (r, 1))
    c = trace_paths(floor_scene, o, d, jax.random.key(0), level=4)
    np.testing.assert_allclose(np.asarray(c), 0.73 * 0.9999, rtol=1e-4)


def test_miss_returns_sky(floor_scene):
    o = jnp.array([[0.0, 1.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])  # straight up, no geometry
    c = trace_paths(floor_scene, o, d, jax.random.key(0), level=4)
    np.testing.assert_allclose(np.asarray(c), 1.0, rtol=1e-6)


def test_cornell_smoke(cornell):
    """Small Cornell render: finite, emitter visible, wall tints correct."""
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=48, height=48,
    )
    img = np.asarray(
        render_image(
            cornell, cam, jax.random.key(1), width=48, height=48,
            sample_size=8, level=4, hittable_pdf_weight=0.5,
        )
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.5  # something bright (the light or its splash)
    # left wall is red, right wall green (testscenes geometry)
    left = img[20:28, 2:6].mean(axis=(0, 1))
    right = img[20:28, 42:46].mean(axis=(0, 1))
    assert left[0] > left[1] * 1.5, f"left wall not red: {left}"
    assert right[1] > right[0] * 1.5, f"right wall not green: {right}"
    # image is lit overall
    assert img.mean() > 0.01


def test_cornell_nee_reduces_variance(cornell):
    """NEE (hittable_pdf_weight=0.5) must stay unbiased w.r.t. brute-force
    BSDF sampling: means agree within Monte-Carlo noise on a small crop."""
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=24, height=24,
    )
    a = np.asarray(
        render_image(cornell, cam, jax.random.key(2), width=24, height=24,
                     sample_size=96, level=4, hittable_pdf_weight=0.0)
    )
    b = np.asarray(
        render_image(cornell, cam, jax.random.key(3), width=24, height=24,
                     sample_size=96, level=4, hittable_pdf_weight=0.5)
    )
    # compare mean image brightness (integrated estimate)
    assert abs(a.mean() - b.mean()) < 0.25 * max(a.mean(), b.mean()), (
        a.mean(), b.mean(),
    )


def _kd_loss(scene, kd, level=4, n_rays=64, w=0.5):
    import dataclasses

    o = jnp.tile(jnp.array([[0.5, 0.5, 2.4]], jnp.float32), (n_rays, 1))
    t = jnp.linspace(-0.3, 0.3, n_rays)
    d = jnp.stack([t, jnp.zeros_like(t), -jnp.ones_like(t)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    scn = dataclasses.replace(
        scene, materials=dataclasses.replace(scene.materials, kd=kd)
    )
    img = trace_paths(scn, o, d, jax.random.key(5), level=level,
                      hittable_pdf_weight=w)
    return jnp.mean(img**2)


def test_grad_finite_and_nonzero(cornell):
    """Reverse-mode gradients w.r.t. the diffuse-material table must be
    finite at depth (safe_pow/safe_sqrt guard the 0*inf backward hazards)
    and nonzero (light actually flows to kd)."""
    kd = cornell.materials.kd
    for level in (3, 6):
        val, gr = jax.value_and_grad(lambda k: _kd_loss(cornell, k, level))(kd)
        gr = np.asarray(gr)
        assert np.isfinite(gr).all(), f"level={level}"
        assert np.linalg.norm(gr) > 1e-6


def test_grad_matches_finite_difference(cornell):
    """Pathwise (path-replay) gradient vs central finite differences along a
    random direction in kd-space.  Same RNG key => same discrete path
    decisions, so the FD of the fixed-sample estimator equals the pathwise
    derivative up to O(eps^2) unless a decision boundary is crossed.

    Rows with kd == 0 are excluded from the direction: the diffuse lobe is
    never sampled there (pick probability kd/(kd+ks) = 0), so the pathwise
    estimator has no gradient support — the standard path-replay boundary
    limitation, not an autodiff defect."""
    kd = cornell.materials.kd
    rng = np.random.default_rng(0)
    v = rng.standard_normal(kd.shape).astype(np.float32)
    v[np.asarray(kd).max(axis=-1) <= 0.0] = 0.0
    v = jnp.asarray(v)
    f = lambda k: _kd_loss(cornell, k, level=4)
    g = jax.grad(f)(kd)
    directional = float(jnp.vdot(g, v))
    eps = 3e-4
    fd = (float(f(kd + eps * v)) - float(f(kd - eps * v))) / (2 * eps)
    assert abs(directional - fd) < 0.05 * max(abs(fd), abs(directional), 1e-3), (
        directional, fd,
    )


def test_reproducible(cornell):
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=16, height=16,
    )
    kw = dict(width=16, height=16, sample_size=2, level=3)
    img1 = np.asarray(render_image(cornell, cam, jax.random.key(7), **kw))
    img2 = np.asarray(render_image(cornell, cam, jax.random.key(7), **kw))
    np.testing.assert_array_equal(img1, img2)


def test_trace_paths_return_stats(cornell):
    """Cap-overflow stats API ("no silent caps"): the dense many-lights
    regime sums over every emitter, so mis_targets_dropped must be 0, and
    the radiance must equal the stats-free call exactly."""
    r = 64
    o = jnp.tile(jnp.array([[0.5, 0.5, 2.4]], jnp.float32), (r, 1))
    t = jnp.linspace(-0.3, 0.3, r)
    d = jnp.stack([t, jnp.zeros_like(t), -jnp.ones_like(t)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    key = jax.random.key(2)

    plain = trace_paths(cornell, o, d, key, level=4, hittable_pdf_weight=0.5)
    col, stats = trace_paths(
        cornell, o, d, key, level=4, hittable_pdf_weight=0.5,
        return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(col), np.asarray(plain))
    assert int(stats["mis_targets_dropped"]) == 0
