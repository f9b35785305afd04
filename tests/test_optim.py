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


def _make_tex_wall(folder):
    """Checker-textured wall quad facing the camera, sky-lit (minimal copy
    of test_integration_tex's scene, for texture-content optimization)."""
    from PIL import Image

    folder.mkdir(parents=True, exist_ok=True)
    img = np.full((8, 8, 3), (40, 40, 230), np.uint8)
    img[::2, ::2] = (230, 40, 40)
    img[1::2, 1::2] = (230, 40, 40)
    Image.fromarray(img).save(folder / "checker.png")
    (folder / "wall.mtl").write_text(
        "newmtl wall\nKd 1 1 1\nKs 0 0 0\nd 1.0\nNs 1\nmap_Kd checker.png\n"
    )
    (folder / "wall.obj").write_text(
        "\n".join(
            [
                "mtllib wall.mtl",
                "usemtl wall",
                "v 0 0 0", "v 1 0 0", "v 1 1 0", "v 0 1 0",
                "vt 0 0", "vt 1 0", "vt 1 1", "vt 0 1",
                "vn 0 0 1",
                "f 1/1/1 2/2/1 3/3/1",
                "f 1/1/1 3/3/1 4/4/1",
            ]
        )
        + "\n"
    )


def test_atlas_texel_recovery(tmp_path):
    """Gradients reach texture CONTENT, not just per-material constants:
    darken the packed atlas texels, then `optimize(param_names=
    ("atlas_rgb",))` must pull the visible texels back toward the target's
    colors (README's 'gradients flow to textures' claim, exercised through
    the real map_Kd -> atlas -> lookup path)."""
    import dataclasses

    folder = tmp_path / "texopt"
    _make_tex_wall(folder)
    scene = build_scene(
        load_scene(folder, "wall.obj"), sky_emission=(1.0, 1.0, 1.0)
    )
    n = 12
    cam = Camera.create(
        eye=(0.5, 0.5, 1.2), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=50.0, width=n, height=n,
    )
    key = jax.random.key(7)
    target = render_image(
        scene, cam, key, width=n, height=n, sample_size=4, level=2
    )

    true_rgb = np.asarray(scene.materials.atlas.rgb)
    dimmed = dataclasses.replace(
        scene,
        materials=dataclasses.replace(
            scene.materials,
            atlas=dataclasses.replace(
                scene.materials.atlas, rgb=scene.materials.atlas.rgb * 0.4
            ),
        ),
    )

    base = optim.render_loss_fn(
        dimmed, cam, target, width=n, height=n, sample_size=4, level=2
    )
    # target's key -> deterministic loss surface with an exact zero at truth
    loss_fn = lambda params, _k: base(params, key)  # noqa: E731
    params, losses = optim.optimize(
        dimmed, cam, target, param_names=("atlas_rgb",),
        steps=30, lr=0.05, key=key, loss_fn=loss_fn,
    )
    assert losses[-1] < 0.25 * losses[0], losses
    # the checker's texels (rows 1:, row 0 is the 1x1 white default) moved
    # toward the true colors
    got = np.asarray(params["atlas_rgb"])[1:]
    err0 = np.abs(true_rgb[1:] * 0.4 - true_rgb[1:]).mean()
    err1 = np.abs(got - true_rgb[1:]).mean()
    assert err1 < 0.6 * err0, (err0, err1, losses)


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
