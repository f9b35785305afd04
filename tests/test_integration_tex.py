"""End-to-end texture / bump / depth-of-field integration (BASELINE configs
2-3): a real map_Kd image through the full OBJ->MTL->atlas->integrator
pipeline, a map_Bump that must change shading, and a thin-lens render whose
out-of-focus geometry measurably blurs."""

import numpy as np
import jax
import pytest

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.render import render_image
from gpu_pathtracer_tpu.utils.obj_io import load_scene


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8)).save(path)


def _make_textured_scene(folder, bump: bool = False):
    """A checker-textured wall quad facing the camera, lit by the sky."""
    folder.mkdir(parents=True, exist_ok=True)
    # 8x8 checker: left half red-dominant checks, right half blue-dominant
    cell = 16
    img = np.zeros((8 * cell, 8 * cell, 3), np.uint8)
    for i in range(8):
        for j in range(8):
            on = (i + j) % 2 == 0
            img[i * cell:(i + 1) * cell, j * cell:(j + 1) * cell] = (
                (230, 30, 30) if on else (30, 30, 230)
            )
    _write_png(folder / "checker.png", img)

    mtl = ["newmtl wall", "Kd 1 1 1", "Ks 0 0 0", "d 1.0", "Ns 1",
           "map_Kd checker.png"]
    if bump:
        # strong horizontal-gradient bump -> perturbed normals
        g = np.zeros((64, 64, 3), np.uint8)
        g[:, :, 0] = (np.sin(np.linspace(0, 12 * np.pi, 64))[None, :] * 100
                      + 120).astype(np.uint8)
        g[:, :, 1] = g[:, :, 0]
        g[:, :, 2] = g[:, :, 0]
        _write_png(folder / "bump.png", g)
        mtl.append("map_Bump -bm 5.0 bump.png")

    obj = [
        "mtllib wall.mtl",
        "usemtl wall",
        # wall quad at z=0 facing +z, uv covering [0,1]^2
        "v 0 0 0", "v 1 0 0", "v 1 1 0", "v 0 1 0",
        "vt 0 0", "vt 1 0", "vt 1 1", "vt 0 1",
        "vn 0 0 1",
        "f 1/1/1 2/2/1 3/3/1",
        "f 1/1/1 3/3/1 4/4/1",
    ]
    (folder / "wall.mtl").write_text("\n".join(mtl) + "\n")
    (folder / "wall.obj").write_text("\n".join(obj) + "\n")


def _frontal_cam(n):
    return Camera.create(
        eye=(0.5, 0.5, 1.2), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=50.0, width=n, height=n,
    )


def test_map_kd_texture_renders_checker(tmp_path):
    """The rendered wall must reproduce the checker's red/blue regions —
    exercises atlas packing, uv interpolation, and diffuse texture lookup
    through the full integrator."""
    folder = tmp_path / "tex"
    _make_textured_scene(folder)
    scene = build_scene(
        load_scene(folder, "wall.obj"), sky_emission=(1.0, 1.0, 1.0)
    )
    n = 32
    img = np.asarray(
        render_image(scene, _frontal_cam(n), jax.random.key(0),
                     width=n, height=n, sample_size=16, level=2)
    )
    assert np.isfinite(img).all()
    # sample the centers of two adjacent checker cells along the middle row:
    # cells are 1/8 of the wall; the frontal camera maps the wall to most of
    # the frame, so compare left-quarter vs adjacent cell mean hue
    red = img[..., 0]
    blue = img[..., 2]
    # per-pixel dominant channel must split the image into both classes
    red_px = (red > 2 * blue).sum()
    blue_px = (blue > 2 * red).sum()
    assert red_px > n * n * 0.2, f"no red checker cells visible ({red_px})"
    assert blue_px > n * n * 0.2, f"no blue checker cells visible ({blue_px})"


def test_map_bump_changes_shading(tmp_path):
    """Same scene +- map_Bump under a DIRECTIONAL sky (bright band at the
    top of the equirect env map): the bump branch of interpolate_hit must
    produce a materially different image (perturbed shading normals steer
    the cosine lobe toward/away from the bright band).  Under a uniform sky
    a single flat wall's radiance is normal-independent — the directional
    sky is what makes the bump observable."""
    flat = tmp_path / "flat"
    bumped = tmp_path / "bumped"
    _make_textured_scene(flat, bump=False)
    _make_textured_scene(bumped, bump=True)
    sky = np.zeros((16, 32, 3), np.float32)
    sky[:4] = 4.0  # bright band toward +y
    sflat = build_scene(
        load_scene(flat, "wall.obj"), sky_emission=(1, 1, 1), sky_image=sky
    )
    sbump = build_scene(
        load_scene(bumped, "wall.obj"), sky_emission=(1, 1, 1), sky_image=sky
    )
    n = 24
    kw = dict(width=n, height=n, sample_size=16, level=2)
    a = np.asarray(render_image(sflat, _frontal_cam(n), jax.random.key(1), **kw))
    b = np.asarray(render_image(sbump, _frontal_cam(n), jax.random.key(1), **kw))
    assert np.isfinite(b).all()
    diff = np.abs(a - b).mean()
    assert diff > 1e-3, f"bump map had no effect on shading (mean diff {diff})"


def test_depth_of_field_blurs_out_of_focus(tmp_path):
    """Thin-lens camera end-to-end (camera.h:68-83): with the focus plane on
    near geometry, a distant checker wall must lose edge contrast as the
    aperture opens."""
    folder = tmp_path / "dof"
    _make_textured_scene(folder)
    scene = build_scene(
        load_scene(folder, "wall.obj"), sky_emission=(1.0, 1.0, 1.0)
    )
    n = 32

    def render(aperture):
        cam = Camera.create(
            eye=(0.5, 0.5, 1.2), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
            fovy_deg=50.0, width=n, height=n,
            aperture=aperture, focus_dist=0.6,  # focus in FRONT of the wall
        )
        return np.asarray(
            render_image(scene, cam, jax.random.key(2), width=n, height=n,
                         sample_size=32, dof_sample_size=4, level=2)
        )

    sharp = render(0.0)
    blurred = render(0.3)  # lens-blur circle ~ one checker cell on the wall

    def contrast(im):
        # checker contrast in the central crop (clear of the wall/sky edge);
        # red channel — the red/blue checks share the same luminance
        g = im[n // 4 : 3 * n // 4, n // 4 : 3 * n // 4, 0]
        return g.std()

    c_sharp = contrast(sharp)
    c_blur = contrast(blurred)
    assert c_blur < 0.7 * c_sharp, (c_sharp, c_blur)
