"""Differentiable SPPM (BASELINE config 5): the photon-mapping render as a
jitted functional pass loop whose output radiance is reverse-differentiable
w.r.t. the material table — emitter optimization THROUGH the photon mapper.

The reference's SPPM driver (main.cu:1489-1869) is forward-only; these tests
are the capability the TPU rebuild adds on top."""

import dataclasses
import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu import optim
from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.ops import lights as lights_mod
from gpu_pathtracer_tpu.render import sppm
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene


def _dim_box(folder, fog=False):
    """Cornell box, diffuse-capable light, emission dimmed well below the
    direct-chain <=1 clamp so the image is linear in the emitter scale."""
    testscenes.make_cornell_box(folder, spheres=fog, sphere_subdiv=0, fog=fog)
    mtl = folder / "box.mtl"
    text = mtl.read_text().replace(
        "newmtl light\nKd 0 0 0", "newmtl light\nKd 0.78 0.78 0.78"
    ).replace("Ke 15 15 15", "Ke 2 2 2")
    mtl.write_text(text)
    return build_scene(load_scene(folder, "box.obj"))


@pytest.fixture(scope="module")
def dim_box(tmp_path_factory):
    return _dim_box(tmp_path_factory.mktemp("diff_box"))


@pytest.fixture(scope="module")
def dim_fog_box(tmp_path_factory):
    return _dim_box(tmp_path_factory.mktemp("diff_fog_box"), fog=True)


@pytest.fixture(scope="module")
def neon(tmp_path_factory):
    folder = tmp_path_factory.mktemp("neon")
    testscenes.make_neon_sign(folder, segs_per_tube=6, emission=4.0)
    return build_scene(load_scene(folder, "sign.obj"))


def _cam(n=8):
    return Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=n, height=n,
    )


KW = dict(width=8, height=8, n_photons=256, num_pass=2,
          max_bounce=4, eye_bounce=6)


def test_leaf_energies_match_baked(dim_box):
    """The differentiable table-derived emitter energies equal the values
    build_scene baked into the light tree at construction."""
    lt = dim_box.light_tree
    live = lights_mod.leaf_energies(lt, dim_box.materials, dim_box.geom.mat_id)
    baked = lt.node_energy[lt.num_lights - 1 :]
    np.testing.assert_allclose(np.asarray(live), np.asarray(baked), rtol=1e-5)


def test_photon_pass_differentiable_mode_identical(dim_box):
    """differentiable=True (bounded scan) must produce EXACTLY the same
    photon map as the while_loop path — the early exit is pure optimization."""
    key = jax.random.key(3)
    a = sppm.photon_pass(dim_box, key, n_photons=128, max_bounce=4)
    b = sppm.photon_pass(
        dim_box, key, n_photons=128, max_bounce=4, differentiable=True
    )
    for f in dataclasses.fields(a):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f.name)), np.asarray(getattr(b, f.name)), f.name
        )


def test_eye_pass_differentiable_mode_identical(dim_box):
    key = jax.random.key(5)
    r = 16
    pix = jnp.arange(r, dtype=jnp.float32) % 4 + 0.5
    vol_r = jnp.full((r,), jnp.inf)
    outs_a = sppm.eye_pass(
        dim_box, _cam(4), key, pix, pix, None, vol_r, init=False, max_bounce=6
    )
    outs_b = sppm.eye_pass(
        dim_box, _cam(4), key, pix, pix, None, vol_r, init=False, max_bounce=6,
        differentiable=True,
    )
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_diff_sppm_gradient_matches_finite_difference(dim_box):
    """d/dθ mean(render(θ·ke)) via autodiff == central finite difference.
    Pick probabilities are θ-invariant (uniform scale) and the direct chain
    stays unclamped, so the pathwise gradient is exact up to fp error."""
    cam = _cam(8)
    ke0 = dim_box.materials.ke

    def loss(theta):
        scn = dataclasses.replace(
            dim_box,
            materials=dataclasses.replace(dim_box.materials, ke=ke0 * theta),
        )
        img = sppm.render_sppm_differentiable(
            scn, cam, jax.random.key(0), **KW
        )
        return jnp.mean(img)

    g = jax.grad(loss)(jnp.float32(1.0))
    eps = 1e-2
    fd = (loss(jnp.float32(1 + eps)) - loss(jnp.float32(1 - eps))) / (2 * eps)
    assert np.isfinite(float(g)) and float(fd) > 0
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)


def test_sppm_emitter_optimization_recovers(dim_box):
    """The SPPM analog of the path-tracing emitter recovery (test_optim):
    dim the emitter 4x, optimize `ke` against a target rendered with the
    true emission.  The loss uses the TARGET's RNG key (self-consistent
    estimator), so the loss surface is deterministic with an exact zero at
    the true emission — the optimizer must collapse the loss and move the
    light's ke most of the way back."""
    cam = _cam(8)
    key = jax.random.key(1)
    target = sppm.render_sppm_differentiable(dim_box, cam, key, **KW)

    ke_true = np.asarray(dim_box.materials.ke)
    dimmed = dataclasses.replace(
        dim_box,
        materials=dataclasses.replace(
            dim_box.materials, ke=dim_box.materials.ke * 0.25
        ),
    )

    base_loss = optim.sppm_loss_fn(
        dimmed, cam, jnp.asarray(target),
        n_photons=KW["n_photons"], num_pass=KW["num_pass"],
        max_bounce=KW["max_bounce"], eye_bounce=KW["eye_bounce"],
    )
    loss_fn = lambda params, _step_key: base_loss(params, key)  # noqa: E731
    params, losses = optim.optimize(
        dimmed, cam, jnp.asarray(target), param_names=("ke",),
        steps=40, lr=0.1, key=key, loss_fn=loss_fn,
    )
    assert losses[-1] < 0.15 * losses[0], losses
    # the emissive rows moved toward the true emission
    emissive = ke_true.max(axis=-1) > 0
    err0 = np.abs(ke_true * 0.25 - ke_true)[emissive].mean()
    err1 = np.abs(np.asarray(params["ke"]) - ke_true)[emissive].mean()
    assert err1 < 0.5 * err0, (err0, err1, losses)


def _scaled(scene, theta):
    return dataclasses.replace(
        scene,
        materials=dataclasses.replace(scene.materials, ke=scene.materials.ke * theta),
    )


def test_diff_sppm_grid_matches_dense_forward_and_grad(dim_box):
    """The hash-grid differentiable path must reproduce the dense one —
    image AND gradient — when the per-cell cap cannot truncate (k_per_cell
    = n_photons makes the 27-cell candidate set a superset of every
    in-radius photon, so the top-k sets coincide)."""
    cam = _cam(8)

    def render(theta, grid):
        return sppm.render_sppm_differentiable(
            _scaled(dim_box, theta), cam, jax.random.key(0),
            gather_grid=grid, k_per_cell=KW["n_photons"], **KW,
        )

    img_d = np.asarray(render(jnp.float32(1.0), False))
    img_g = np.asarray(render(jnp.float32(1.0), True))
    np.testing.assert_allclose(img_g, img_d, rtol=1e-4, atol=1e-6)

    g_d = float(jax.grad(lambda t: jnp.mean(render(t, False)))(jnp.float32(1.0)))
    g_g = float(jax.grad(lambda t: jnp.mean(render(t, True)))(jnp.float32(1.0)))
    assert np.isfinite(g_d) and g_d > 0
    np.testing.assert_allclose(g_g, g_d, rtol=1e-3)


def test_diff_sppm_grid_gradient_matches_finite_difference(dim_box):
    """FD check THROUGH the grid path at realistic caps (k_per_cell=8):
    truncation changes which photons contribute, but the truncated topology
    is theta-invariant (uniform ke scaling moves no photon), so the
    pathwise gradient must still match central differences."""
    cam = _cam(8)

    def loss(theta):
        img = sppm.render_sppm_differentiable(
            _scaled(dim_box, theta), cam, jax.random.key(0),
            gather_grid=True, k_per_cell=8, **KW,
        )
        return jnp.mean(img)

    g = float(jax.grad(loss)(jnp.float32(1.0)))
    eps = 1e-2
    fd = (loss(jnp.float32(1 + eps)) - loss(jnp.float32(1 - eps))) / (2 * eps)
    assert np.isfinite(g) and float(fd) > 0
    np.testing.assert_allclose(g, float(fd), rtol=1e-3)


def test_diff_sppm_volume_grid_matches_dense_grad(dim_fog_box):
    """Fog scene, gather_volume=True: the static-step hash-grid beam gather
    must agree with the dense recorded-segment gather in value and in the
    ke gradient (caps sized to cover: k_per_cell = n_photons)."""
    cam = _cam(8)
    kw = dict(KW, n_photons=192, num_pass=2, max_bounce=6, eye_bounce=8)

    def render(theta, grid):
        return sppm.render_sppm_differentiable(
            _scaled(dim_fog_box, theta), cam, jax.random.key(4),
            gather_volume=True, gather_grid=grid,
            k_per_cell=kw["n_photons"], vol_steps=48, **kw,
        )

    img_d = np.asarray(render(jnp.float32(1.0), False))
    img_g = np.asarray(render(jnp.float32(1.0), True))
    assert np.isfinite(img_g).all() and img_g.mean() > 1e-5
    np.testing.assert_allclose(img_g, img_d, rtol=1e-3, atol=1e-5)

    g_d = float(jax.grad(lambda t: jnp.mean(render(t, False)))(jnp.float32(1.0)))
    g_g = float(jax.grad(lambda t: jnp.mean(render(t, True)))(jnp.float32(1.0)))
    assert np.isfinite(g_g) and g_d > 0
    np.testing.assert_allclose(g_g, g_d, rtol=1e-3)


def test_neon_sign_scene_renders_and_differentiates(neon):
    """BASELINE config 5 scene: many thin colored emitters, SPPM forward
    non-black + finite, and a usable ke gradient."""
    assert neon.num_lights >= 30  # many emitter triangles
    cam = _cam(8)
    img = sppm.render_sppm_differentiable(
        neon, cam, jax.random.key(2), **KW
    )
    img = np.asarray(img)
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.mean() > 1e-4, f"neon sign render black: {img.mean()}"

    ke0 = neon.materials.ke

    def loss(theta):
        scn = dataclasses.replace(
            neon, materials=dataclasses.replace(neon.materials, ke=ke0 * theta)
        )
        out = sppm.render_sppm_differentiable(
            scn, cam, jax.random.key(2), **KW
        )
        return jnp.mean(out)

    g = float(jax.grad(loss)(jnp.float32(1.0)))
    assert np.isfinite(g) and g > 0, g
