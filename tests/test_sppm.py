"""SPPM integration tests: photon pass, gathers, full progressive render.

Scene note: the reference's direct-radiance chain only records emission at
*diffuse* hits (ray_tracing_pass.h:112-118), and pure emitters with kd=ks=0
fall into the specular branch via the 0/0-NaN quirk (material.h:598-602) —
so SPPM scenes give their lights a nonzero Kd, as the reference's own scenes
must.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.render import sppm
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.config import RenderConfig
from gpu_pathtracer_tpu.utils.obj_io import load_scene


def _make_sppm_box(folder, fog=False):
    obj, mtl = testscenes.make_cornell_box(
        folder, spheres=True, sphere_subdiv=0, fog=fog
    )
    # give the light a diffuse component (see module docstring)
    mtl_path = folder / "box.mtl"
    text = mtl_path.read_text().replace(
        "newmtl light\nKd 0 0 0", "newmtl light\nKd 0.78 0.78 0.78"
    )
    mtl_path.write_text(text)
    return obj


@pytest.fixture(scope="module")
def box(tmp_path_factory):
    folder = tmp_path_factory.mktemp("sppm_box")
    _make_sppm_box(folder)
    return build_scene(load_scene(folder, "box.obj"))


@pytest.fixture(scope="module")
def fog_box(tmp_path_factory):
    folder = tmp_path_factory.mktemp("sppm_fog")
    _make_sppm_box(folder, fog=True)
    return build_scene(load_scene(folder, "box.obj"))


def test_photon_pass_deposits(box):
    photons = sppm.photon_pass(box, jax.random.key(3), n_photons=256, max_bounce=4)
    valid = np.asarray(photons.valid)
    pos = np.asarray(photons.pos)
    assert valid.any(), "no photons deposited"
    assert np.isfinite(pos[valid]).all()
    # all deposits inside the box (walls at [0,1]^3, eps slack)
    assert (pos[valid] > -0.01).all() and (pos[valid] < 1.01).all()
    # surface photons only in a closed diffuse box
    assert np.asarray(photons.on_surface)[valid].all()
    col = np.asarray(photons.color)[valid]
    assert np.isfinite(col).all() and (col >= 0).all()


def test_photon_pass_volume_deposits(fog_box):
    photons = sppm.photon_pass(
        fog_box, jax.random.key(4), n_photons=512, max_bounce=6
    )
    valid = np.asarray(photons.valid)
    on_surf = np.asarray(photons.on_surface)
    assert valid.any()
    assert (valid & ~on_surf).any(), "no volume photons in the fog scene"


def test_init_material_stack_inside_glass(tmp_path):
    """A camera inside the fog medium starts with the fog on its stack."""
    folder = tmp_path / "scene"
    _make_sppm_box(folder, fog=True)
    scene = build_scene(load_scene(folder, "box.obj"))
    # point inside the fog sphere (centered 0.5,0.5,0.5 r=0.45)
    pt = jnp.array([[0.5, 0.5, 0.5]])
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    ids, length = sppm.init_material_stack(scene, pt, dirs, jax.random.key(0))
    hp, _ = __import__(
        "gpu_pathtracer_tpu.ops.materials", fromlist=["find_highest_prioritised"]
    ).find_highest_prioritised(scene.materials, ids, length)
    # fog is on the stack (its id is the material named 'fog')
    fog_id = scene.materials  # noqa: just for clarity
    names = None
    assert int(length[0]) >= 2  # nullptr + fog
    # a point clearly outside any medium keeps a bare stack
    pt2 = jnp.array([[0.5, 0.5, 2.4]])
    ids2, length2 = sppm.init_material_stack(scene, pt2, dirs, jax.random.key(0))
    assert int(length2[0]) == 1


def test_sppm_render_smoke(box, tmp_path):
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=16, height=16,
    )
    cfg = RenderConfig(
        image_width=16, image_height=16,
        ppm_num_photon_per_pass=512, ppm_num_pass=3,
        ppm_max_bounce=4, ppm_alpha=0.7, ppm_radius_scaling_factor=1.0,
    )
    img = sppm.render_sppm(box, cam, cfg, jax.random.key(5))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.mean() > 1e-3, f"SPPM image black: mean={img.mean()}"
