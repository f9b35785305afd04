"""Inverse-rendering tests: recover emitter power from a target image
(the capability behind BASELINE config 5's neon-sign emitter optimization)
and checkpoint/resume of the optimization loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu import optim
from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.render import render_image
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    folder = tmp_path_factory.mktemp("cornell_opt")
    testscenes.make_cornell_box(folder, spheres=False)
    scene = build_scene(load_scene(folder, "box.obj"))
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=12, height=12,
    )
    target = render_image(
        scene, cam, jax.random.key(11), width=12, height=12,
        sample_size=8, level=3, hittable_pdf_weight=0.5,
    )
    return scene, cam, target


def test_emitter_recovery(setup):
    """Start from a dimmed emitter; Adam must move ke toward the true value
    and reduce the loss."""
    import dataclasses

    scene, cam, target = setup
    true_ke = scene.materials.ke
    dim = dataclasses.replace(
        scene, materials=dataclasses.replace(scene.materials, ke=true_ke * 0.3)
    )
    params, losses = optim.optimize(
        dim, cam, target, param_names=("ke",), steps=12, lr=0.5,
        key=jax.random.key(1), sample_size=4, level=3,
    )
    assert losses[-1] < losses[0] * 0.7, losses
    # the (only) emissive row moved toward the true emission
    emissive = np.asarray(true_ke).max(axis=-1) > 0
    err0 = np.abs(np.asarray(true_ke * 0.3 - true_ke))[emissive].mean()
    err1 = np.abs(np.asarray(params["ke"] - true_ke))[emissive].mean()
    assert err1 < err0, (err0, err1)


def test_checkpoint_resume(setup, tmp_path):
    """Interrupt after 4 steps, resume, and land at the same step count."""
    scene, cam, target = setup
    ckpt = str(tmp_path / "ck")
    _, losses_a = optim.optimize(
        scene, cam, target, param_names=("kd",), steps=4, lr=0.05,
        key=jax.random.key(2), checkpoint_dir=ckpt, checkpoint_every=2,
        sample_size=2, level=2,
    )
    params_b, losses_b = optim.optimize(
        scene, cam, target, param_names=("kd",), steps=6, lr=0.05,
        key=jax.random.key(2), checkpoint_dir=ckpt, checkpoint_every=2,
        sample_size=2, level=2,
    )
    # resumed run continues from the saved step, not from scratch
    assert len(losses_b) <= 3, losses_b
    assert np.isfinite(np.asarray(params_b["kd"])).all()
