"""Sub-surface scattering: point sampling, first pass, gather, integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.render import sss
from gpu_pathtracer_tpu.render.integrator import render_image
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene


@pytest.fixture(scope="module")
def sss_scene(tmp_path_factory):
    """Cornell box whose white sphere gets an SSS material."""
    folder = tmp_path_factory.mktemp("sss_box")
    testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=1)
    mtl = (folder / "box.mtl").read_text()
    mtl += "\nnewmtl skin\nKd 0.8 0.5 0.4\nKs 0 0 0\nd 1.0\nNs 1\npath_length 0.15\n"
    (folder / "box.mtl").write_text(mtl)
    # the first sphere is the white one at (0.3, 0.2, 0.4); swap its material
    # (the 4th "usemtl white" group: 3 wall groups precede it)
    lines = (folder / "box.obj").read_text().splitlines()
    seen_quads = 0
    for i, l in enumerate(lines):
        if l == "usemtl white":
            seen_quads += 1
            if seen_quads == 4:  # 3 wall groups + the first sphere
                lines[i] = "usemtl skin"
                break
    (folder / "box.obj").write_text("\n".join(lines) + "\n")
    return build_scene(load_scene(folder, "box.obj"))


def test_sample_points(sss_scene):
    pts = sss.sample_sss_points(sss_scene, jax.random.key(0), 64)
    assert pts is not None
    pos = np.asarray(pts.pos)
    assert pos.shape == (64, 3)
    # points live on the sphere surface: |p - c| ~= r
    d = np.linalg.norm(pos - np.array([0.3, 0.2, 0.4]), axis=-1)
    assert (np.abs(d - 0.2) < 0.02).all()  # icosphere subdiv=1 ~ sphere
    np.testing.assert_allclose(
        np.asarray(pts.filter), np.tile([[0.8, 0.5, 0.4]], (64, 1)), atol=1e-6
    )


def test_first_pass_and_gather(sss_scene):
    pts = sss.sample_sss_points(sss_scene, jax.random.key(0), 64)
    pts = sss.run_first_pass(
        sss_scene, pts, jax.random.key(1), sample_size=4, level=3
    )
    col = np.asarray(pts.color)
    assert np.isfinite(col).all() and (col >= 0).all()
    assert col.mean() > 0, "first pass produced no irradiance"

    # gather at a point on the sphere
    hit = jnp.array([[0.3, 0.4, 0.4]])  # top of the sphere
    sphere_obj = pts.obj_id[0:1]
    out = sss.gather_sss(
        pts,
        hit,
        sphere_obj,
        jnp.array([0.15]),
        jnp.array([[0.8, 0.5, 0.4]]),
        jnp.array([True]),
    )
    out = np.asarray(out)[0]
    assert np.isfinite(out).all() and (out >= 0).all()
    assert out.sum() > 0, "gather found no points"
    # out of radius: no contribution
    far = sss.gather_sss(
        pts, jnp.array([[10.0, 10.0, 10.0]]), sphere_obj,
        jnp.array([0.15]), jnp.ones((1, 3)), jnp.array([True]),
    )
    assert float(np.asarray(far).sum()) == 0.0


def test_render_with_sss(sss_scene):
    scene = sss.attach_sss(
        sss_scene, jax.random.key(2), pts_per_object=64, sample_size=2, level=3
    )
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=24, height=24,
    )
    img = np.asarray(
        render_image(scene, cam, jax.random.key(3), width=24, height=24,
                     sample_size=4, level=4, hittable_pdf_weight=0.5)
    )
    assert np.isfinite(img).all()
    assert img.mean() > 0.005


def test_gather_sss_grid_matches_dense():
    """Hash-grid SSS gather == dense all-pairs oracle on a synthetic cloud
    with several objects (no false negatives: cell = max radius)."""
    from gpu_pathtracer_tpu.models.scene import SSSPoints

    key = jax.random.key(21)
    s, r = 800, 128
    pts = SSSPoints(
        pos=jax.random.uniform(jax.random.fold_in(key, 0), (s, 3)),
        normal=jnp.zeros((s, 3)).at[:, 1].set(1.0),
        filter=jnp.ones((s, 3)),
        color=jax.random.uniform(jax.random.fold_in(key, 1), (s, 3)),
        obj_id=jax.random.randint(jax.random.fold_in(key, 2), (s,), 0, 3),
        valid=jax.random.uniform(jax.random.fold_in(key, 3), (s,)) < 0.9,
    )
    hit_pt = jax.random.uniform(jax.random.fold_in(key, 4), (r, 3))
    hit_obj = jax.random.randint(jax.random.fold_in(key, 5), (r,), 0, 3)
    radius = jax.random.uniform(
        jax.random.fold_in(key, 6), (r,), minval=0.05, maxval=0.2
    )
    kd = jax.random.uniform(jax.random.fold_in(key, 7), (r, 3))
    enable = jax.random.uniform(jax.random.fold_in(key, 8), (r,)) < 0.8

    dense = sss.gather_sss(pts, hit_pt, hit_obj, radius, kd, enable)
    grid = sss.gather_sss_grid(
        pts, hit_pt, hit_obj, radius, kd, enable, k_per_cell=64
    )
    assert np.asarray(dense).sum() > 0
    np.testing.assert_allclose(
        np.asarray(grid), np.asarray(dense), rtol=1e-5, atol=1e-7
    )


def test_render_with_sss_10k_points(sss_scene):
    """10k SSS points must route through the grid gather (> SSS_DENSE_MAX)
    and render without materializing the (rays, points) matrix."""
    scene = sss.attach_sss(
        sss_scene, jax.random.key(2), pts_per_object=10000, sample_size=1,
        level=2,
    )
    assert scene.sss.pos.shape[0] > sss.SSS_DENSE_MAX
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=16, height=16,
    )
    img = np.asarray(
        render_image(scene, cam, jax.random.key(3), width=16, height=16,
                     sample_size=2, level=3, hittable_pdf_weight=0.5)
    )
    assert np.isfinite(img).all()
    assert img.mean() > 0.005
