"""Golden-image regression fixtures: tiny deterministic PT and SPPM renders
(fixed key, fixed scene) compared against committed arrays — estimator
regressions break these tests instead of silently shifting images
(SURVEY.md §4: the reference's debug-image dumps double as visual fixtures;
these are the executable form).

Regenerate intentionally with `python tests/golden_gen.py`."""

import pathlib

import numpy as np
import jax
import pytest

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.render import render_image, sppm
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.config import RenderConfig
from gpu_pathtracer_tpu.utils.obj_io import load_scene

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "assets" / "golden"


def _cornell(tmp):
    testscenes.make_cornell_box(tmp, spheres=True, sphere_subdiv=1)
    return build_scene(load_scene(tmp, "box.obj"))


def _sppm_box(tmp):
    testscenes.make_cornell_box(tmp, spheres=True, sphere_subdiv=0)
    mtl = tmp / "box.mtl"
    mtl.write_text(mtl.read_text().replace(
        "newmtl light\nKd 0 0 0", "newmtl light\nKd 0.78 0.78 0.78"
    ))
    return build_scene(load_scene(tmp, "box.obj"))


def render_pt_golden(tmp_path=None):
    import tempfile

    tmp = pathlib.Path(tmp_path or tempfile.mkdtemp())
    scene = _cornell(tmp)
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=32, height=32,
    )
    return np.asarray(
        render_image(scene, cam, jax.random.key(7), width=32, height=32,
                     sample_size=4, level=4, hittable_pdf_weight=0.5)
    )


def render_sppm_golden(tmp_path=None):
    import tempfile

    tmp = pathlib.Path(tmp_path or tempfile.mkdtemp())
    scene = _sppm_box(tmp)
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=16, height=16,
    )
    cfg = RenderConfig(
        image_width=16, image_height=16,
        ppm_num_photon_per_pass=256, ppm_num_pass=2,
        ppm_max_bounce=4, ppm_alpha=0.7, ppm_radius_scaling_factor=1.0,
    )
    return np.asarray(sppm.render_sppm(scene, cam, cfg, jax.random.key(5)))


@pytest.mark.parametrize(
    "name,render",
    [("pt_cornell_32", render_pt_golden), ("sppm_box_16", render_sppm_golden)],
)
def test_golden(name, render, tmp_path):
    path = GOLDEN_DIR / f"{name}.npy"
    assert path.exists(), (
        f"golden fixture {path} missing — generate with "
        "`JAX_PLATFORMS=cpu python tests/golden_gen.py` and commit it"
    )
    want = np.load(path)
    got = render(tmp_path)
    # same-backend renders are deterministic; the tolerance absorbs only
    # cross-backend (CPU vs TPU) float differences
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)
