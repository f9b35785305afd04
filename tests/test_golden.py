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


def render_fog_sppm_golden(tmp_path=None):
    """BASELINE config 4 (participating medium): the recorded-segment
    volume gather + medium photon deposits can regress silently without a
    fixture — this pins the fog estimator."""
    import tempfile

    tmp = pathlib.Path(tmp_path or tempfile.mkdtemp())
    testscenes.make_cornell_box(tmp, spheres=True, sphere_subdiv=0, fog=True)
    mtl = tmp / "box.mtl"
    mtl.write_text(mtl.read_text().replace(
        "newmtl light\nKd 0 0 0", "newmtl light\nKd 0.78 0.78 0.78"
    ))
    scene = build_scene(load_scene(tmp, "box.obj"))
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=16, height=16,
    )
    cfg = RenderConfig(
        image_width=16, image_height=16,
        ppm_num_photon_per_pass=256, ppm_num_pass=2,
        ppm_max_bounce=6, ppm_alpha=0.7, ppm_radius_scaling_factor=1.0,
    )
    return np.asarray(sppm.render_sppm(scene, cam, cfg, jax.random.key(9)))


def render_sss_pt_golden(tmp_path=None):
    """BASELINE config 4 (sub-surface scattering): pins the SSS first pass
    + point-cloud gather estimator."""
    import tempfile

    from gpu_pathtracer_tpu.render import sss as sss_mod

    tmp = pathlib.Path(tmp_path or tempfile.mkdtemp())
    testscenes.make_cornell_box(tmp, spheres=True, sphere_subdiv=1)
    mtl_path = tmp / "box.mtl"
    mtl_path.write_text(
        mtl_path.read_text()
        + "\nnewmtl skin\nKd 0.8 0.5 0.4\nKs 0 0 0\nd 1.0\nNs 1\n"
        "path_length 0.15\n"
    )
    lines = (tmp / "box.obj").read_text().splitlines()
    seen = 0
    for i, l in enumerate(lines):
        if l == "usemtl white":
            seen += 1
            if seen == 4:  # 3 wall groups + the first sphere
                lines[i] = "usemtl skin"
                break
    (tmp / "box.obj").write_text("\n".join(lines) + "\n")
    scene = build_scene(load_scene(tmp, "box.obj"))
    scene = sss_mod.attach_sss(
        scene, jax.random.key(2), pts_per_object=64, sample_size=2, level=3
    )
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=32, height=32,
    )
    return np.asarray(
        render_image(scene, cam, jax.random.key(13), width=32, height=32,
                     sample_size=4, level=4, hittable_pdf_weight=0.5)
    )


@pytest.mark.parametrize(
    "name,render",
    [
        ("pt_cornell_32", render_pt_golden),
        ("sppm_box_16", render_sppm_golden),
        ("fog_sppm_16", render_fog_sppm_golden),
        ("sss_pt_32", render_sss_pt_golden),
    ],
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
