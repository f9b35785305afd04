"""Wavefront renderer vs the scalar reference-semantics oracle.

The oracle (gpu_pathtracer_tpu/validation/oracle.py) is a one-ray-at-a-time
NumPy transcription of the reference's exact control flow (_compute_color,
pathtracing.h:86-200; check_next_path, material.h:536-651; change_ref_ray,
material_operations.h:87-153).  Nothing of the wavefront estimator is
shared with it except scene constants and camera math (validated by its own
inverse-projection tests) — so agreement here is evidence the wavefront
renderer computes the REFERENCE's estimator, not merely its own.

The comparison is statistical (curand and threefry streams cannot be
matched): both renderers integrate the same image; region means must agree
within Monte-Carlo noise.  Tolerances are 3-sigma-ish for the sample counts
used; the means additionally get a tight global check.
"""

import tempfile

import jax
import numpy as np
import pytest

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.render import render_image
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene
from gpu_pathtracer_tpu.validation import oracle as orc

W = H = 10
LEVEL = 4

# Cornell-style box with a LARGE ceiling light (low-variance: the reference
# Cornell's small quad makes the w=0 BSDF-only estimator too heavy-tailed to
# compare at test-sized sample counts) and a glossy block.  Exercises every
# PT branch the oracle transcribes: diffuse pick, phong pick, the
# pure-emitter 0/0-NaN branch (light: Kd 0 Ks 0), sky miss, NEE redirect +
# mixture pdf.
_OBJ = """
mtllib box.mtl
v 0 0 0\nv 1 0 0\nv 1 0 1\nv 0 0 1
v 0 1 0\nv 1 1 0\nv 1 1 1\nv 0 1 1
v 0.15 0.998 0.15\nv 0.85 0.998 0.15\nv 0.85 0.998 0.85\nv 0.15 0.998 0.85
v 0.45 0 0.35\nv 0.75 0 0.35\nv 0.75 0 0.65\nv 0.45 0 0.65
v 0.45 0.45 0.35\nv 0.75 0.45 0.35\nv 0.75 0.45 0.65\nv 0.45 0.45 0.65
usemtl white
f 1 3 2\nf 1 4 3
f 5 6 7\nf 5 7 8
f 1 2 6\nf 1 6 5
usemtl red
f 1 5 8\nf 1 8 4
usemtl green
f 2 3 7\nf 2 7 6
usemtl light
f 9 10 11\nf 9 11 12
usemtl gloss
f 13 17 18\nf 13 18 14
f 14 18 19\nf 14 19 15
f 15 19 20\nf 15 20 16
f 16 20 17\nf 16 17 13
f 17 20 19\nf 17 19 18
"""

_MTL = """
newmtl white\nKd 0.68 0.68 0.68\nKs 0.06 0.06 0.06\nNs 8\nd 1.0
newmtl red\nKd 0.65 0.05 0.05\nKs 0 0 0\nNs 1\nd 1.0
newmtl green\nKd 0.12 0.45 0.15\nKs 0 0 0\nNs 1\nd 1.0
newmtl light\nKd 0 0 0\nKs 0 0 0\nKe 4 4 4\nd 1.0\nNs 1
newmtl gloss\nKd 0.2 0.25 0.3\nKs 0.5 0.45 0.4\nNs 40\nd 1.0
"""


@pytest.fixture(scope="module")
def cornell():
    import pathlib

    folder = pathlib.Path(tempfile.mkdtemp(prefix="oracle_box_"))
    (folder / "box.obj").write_text(_OBJ.strip() + "\n")
    (folder / "box.mtl").write_text(_MTL.strip() + "\n")
    return build_scene(load_scene(str(folder), "box.obj"))


def _cube_obj(lo, hi, vbase):
    """Emit OBJ v/f lines for an axis-aligned cube with OUTWARD winding
    (absent vn -> the loader's geometric normals; outward orientation is what
    the reference's enter/exit refraction bookkeeping expects,
    material.h:311-356)."""
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    v = [
        (x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1),
        (x0, y1, z0), (x1, y1, z0), (x1, y1, z1), (x0, y1, z1),
    ]
    quads = [
        (1, 2, 3, 4),  # bottom (-y)
        (5, 8, 7, 6),  # top (+y)
        (4, 3, 7, 8),  # front (+z)
        (1, 5, 6, 2),  # back (-z)
        (1, 4, 8, 5),  # left (-x)
        (2, 6, 7, 3),  # right (+x)
    ]
    lines = [f"v {a} {b} {c}" for a, b, c in v]
    for a, b, c, d in quads:
        lines.append(f"f {vbase + a} {vbase + b} {vbase + c}")
        lines.append(f"f {vbase + a} {vbase + c} {vbase + d}")
    return "\n".join(lines)


# Glass config (BASELINE config 3 semantics, pinhole): the cornell room +
# a mirror-smooth glass cube (Tr 1, Ni 1.5, priority 1) with a SECOND glass
# cube fully inside it at lower priority (higher value).  Exercises the
# branches the cornell fixture cannot: _refract (Schlick pick, Snell bend,
# enter/exit against the dielectric stack, material.h:259-409), the
# transparent-material mirror limit (material.h:457-460), Tf transmission
# filtering, NEE's forced w=0 on mirror lobes (material_operations.h:105),
# and — the distinctive nested-dielectric semantics — priority FALSE HITS:
# every inner-cube interface lies inside the priority-1 medium, so
# _check_if_false_hit (material.h:230-257) must pass straight through it.
_GLASS_OBJ = """
mtllib glassbox.mtl
v 0 0 0\nv 1 0 0\nv 1 0 1\nv 0 0 1
v 0 1 0\nv 1 1 0\nv 1 1 1\nv 0 1 1
v 0.15 0.998 0.15\nv 0.85 0.998 0.15\nv 0.85 0.998 0.85\nv 0.15 0.998 0.85
usemtl white
f 1 3 2\nf 1 4 3
f 5 6 7\nf 5 7 8
f 1 2 6\nf 1 6 5
usemtl red
f 1 5 8\nf 1 8 4
usemtl green
f 2 3 7\nf 2 7 6
usemtl light
f 9 10 11\nf 9 11 12
usemtl glass
{outer}
usemtl innerglass
{inner}
"""

_GLASS_MTL = """
newmtl white\nKd 0.68 0.68 0.68\nKs 0.06 0.06 0.06\nNs 8\nd 1.0
newmtl red\nKd 0.65 0.05 0.05\nKs 0 0 0\nNs 1\nd 1.0
newmtl green\nKd 0.12 0.45 0.15\nKs 0 0 0\nNs 1\nd 1.0
newmtl light\nKd 0 0 0\nKs 0 0 0\nKe 4 4 4\nd 1.0\nNs 1
newmtl glass\nKd 0 0 0\nKs 1 1 1\nNs 10000000\nNi 1.5\nTr 1\nTf 0.92 0.96 0.98\npriority 1
newmtl innerglass\nKd 0 0 0\nKs 1 1 1\nNs 10000000\nNi 1.3\nTr 1\nTf 0.98 0.9 0.9\npriority 2
"""


@pytest.fixture(scope="module")
def glassbox():
    import pathlib

    outer = _cube_obj((0.3, 0.05, 0.3), (0.7, 0.55, 0.7), 12)
    inner = _cube_obj((0.4, 0.15, 0.4), (0.6, 0.45, 0.6), 20)
    folder = pathlib.Path(tempfile.mkdtemp(prefix="oracle_glass_"))
    (folder / "glassbox.obj").write_text(
        _GLASS_OBJ.strip().format(outer=outer, inner=inner) + "\n"
    )
    (folder / "glassbox.mtl").write_text(_GLASS_MTL.strip() + "\n")
    return build_scene(load_scene(str(folder), "glassbox.obj"))


@pytest.fixture(scope="module")
def cam():
    return Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=W, height=H,
    )


def _np_pinhole(cam):
    """Numpy port of Camera.generate_rays for aperture 0 (camera.h:68-83) —
    calling the jitted camera per scalar ray costs ~90 ms in dispatch."""
    eye = np.asarray(cam.eye, np.float64)
    u = np.asarray(cam.u, np.float64)
    v = np.asarray(cam.v, np.float64)
    w_ = np.asarray(cam.w, np.float64)
    tanx = float(cam.tan_half_fovx)
    tany = float(cam.tan_half_fovy)

    def make(i, j):
        alpha = tanx * (j - W / 2.0) / (W / 2.0)
        beta = tany * (H / 2.0 - i) / (H / 2.0)
        d = alpha * u + beta * v - w_
        return eye, d / np.linalg.norm(d)

    return make


def _compare(img_repo, img_orc, spp_orc):
    """Region-mean comparison: 2x2 pixel blocks, tolerance from the
    cross-render pooled spread.  Specular fireflies make single-pixel
    comparisons meaningless at these sample counts; block means at
    4 * spp_orc effective samples are stable to ~10-20%."""
    a = img_repo.reshape(H // 2, 2, W // 2, 2, 3).mean(axis=(1, 3))
    b = img_orc.reshape(H // 2, 2, W // 2, 2, 3).mean(axis=(1, 3))
    lum_a = a.mean(axis=-1)
    lum_b = b.mean(axis=-1)
    # global mean: integrates all samples — tight
    assert abs(img_repo.mean() - img_orc.mean()) < 0.08 * max(
        img_repo.mean(), 0.05
    ), (img_repo.mean(), img_orc.mean())
    # per-region: loose MC bound (abs floor for near-black regions)
    diff = np.abs(lum_a - lum_b)
    tol = 0.06 + 0.35 * np.maximum(lum_a, lum_b)
    frac_bad = (diff > tol).mean()
    assert frac_bad <= 0.08, (
        frac_bad, np.stack([lum_a, lum_b], axis=-1).round(3).tolist()
    )


@pytest.mark.parametrize("weight", [0.0, 0.5])
def test_wavefront_matches_reference_oracle(cornell, cam, weight):
    """PT path with NEE off (weight=0: pure BSDF-sampling estimator) and on
    (weight=0.5: the light-tree mixture estimator of change_ref_ray)."""
    img_repo = np.asarray(
        render_image(
            cornell, cam, jax.random.key(3), width=W, height=H,
            sample_size=768, level=LEVEL, hittable_pdf_weight=weight,
        )
    )
    osc = orc.oracle_scene_from_repo(cornell)
    spp = 96
    img_orc = orc.render_oracle(
        osc, _np_pinhole(cam), W, H, sample_size=spp, level=LEVEL,
        hittable_pdf_weight=weight, seed=11,
    )
    _compare(img_repo, np.asarray(img_orc), spp)


def test_wavefront_matches_reference_oracle_glass(glassbox, cam):
    """Glass config: refraction + nested-dielectric priority stack vs the
    oracle.  Level 8 so a camera path can cross outer-enter, two inner
    false-hit pass-throughs, outer-exit, and still reach a wall + light."""
    weight = 0.5
    img_repo = np.asarray(
        render_image(
            glassbox, cam, jax.random.key(5), width=W, height=H,
            sample_size=768, level=8, hittable_pdf_weight=weight,
        )
    )
    osc = orc.oracle_scene_from_repo(glassbox)
    spp = 64
    img_orc = orc.render_oracle(
        osc, _np_pinhole(cam), W, H, sample_size=spp, level=8,
        hittable_pdf_weight=weight, seed=17,
    )
    _compare(img_repo, np.asarray(img_orc), spp)


def test_oracle_estimator_structure_no_lights_terminates_black():
    """Sanity on the transcription itself: a sky-only scene returns the sky
    color at the first miss (pathtracing.h:186-196 i<1 branch)."""
    p = np.array([[[10.0, 10, 10], [11, 10, 10], [10, 11, 10]]])
    n = np.tile(np.array([0.0, 0, 1]), (1, 3, 1)).reshape(1, 3, 3)
    mats = [orc.OracleMaterial(
        diffuse=np.zeros(3), specular=np.zeros(3), emission=np.zeros(3),
        transmission=np.zeros(3),
    )]
    scene = orc.OracleScene(
        p=p, n=n, mats=mats, tolerance=orc.triangle_tolerance(p),
        sky_emission=np.array([0.25, 0.5, 0.75]),
    )
    rng = np.random.default_rng(0)
    c = orc.compute_color(
        scene, None, orc.Ray(np.zeros(3), np.array([0.0, 0, -1.0])),
        4, 0.0, rng,
    )
    np.testing.assert_allclose(c, [0.25, 0.5, 0.75])
