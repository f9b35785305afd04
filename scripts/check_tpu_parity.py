"""TPU parity check: the Mosaic-compiled Pallas traversal must render the
same image as the non-Pallas (threaded-BVH / dense) path on the real chip.

Interpret-mode unit tests can't catch Mosaic-specific miscompiles; this
drives the full renderer twice in subprocesses (the Pallas switch is read
per call, but jit caching makes in-process toggling unreliable) and
compares.  Exit code 0 = allclose.
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

CHILD = r"""
import os, sys, tempfile, numpy as np
sys.path.insert(0, %(root)r)
import jax
from gpu_pathtracer_tpu.utils.platform import apply_platform_env
apply_platform_env()
from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.render import render_image
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene

if os.environ.get("PARITY_SCENE") == "mesh":
    # 327k tris -> exercises the HBM-resident (big) kernel
    scene = build_scene(testscenes.make_mesh_scene_host(subdiv=7))
    cam = Camera.create(eye=(0.5, 0.8, 2.2), center=(0.5, 0.45, 0.5),
                        up=(0, 1, 0), fovy_deg=45.0, width=64, height=64)
else:
    folder = tempfile.mkdtemp()
    testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
    scene = build_scene(load_scene(folder, "box.obj"))
    cam = Camera.create(eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0),
                        up=(0, 1, 0), fovy_deg=40.0, width=64, height=64)
img = render_image(scene, cam, jax.random.key(7), width=64, height=64,
                   sample_size=4, level=6, hittable_pdf_weight=0.5)
np.save(%(out)r, np.asarray(img))
print("backend:", jax.default_backend())
"""

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(out: str, extra_env: dict):
    env = dict(os.environ)
    env.pop("GPT_TPU_DISABLE_PALLAS", None)
    env.pop("GPT_TPU_DMA_PIPE", None)
    env.update(extra_env)
    r = subprocess.run(
        [sys.executable, "-c", CHILD % {"root": root, "out": out}],
        env=env, capture_output=True, text=True, timeout=560,
    )
    if r.returncode != 0:
        print(r.stderr[-2000:])
        sys.exit(2)


with tempfile.TemporaryDirectory() as td:
    scene_kind = os.environ.get("PARITY_SCENE", "cornell")
    print(f"scene: {scene_kind}")
    legs = [("pallas", {}), ("bvh", {"GPT_TPU_DISABLE_PALLAS": "1"})]
    if scene_kind == "mesh":
        # DMA_PIPE defaults ON, so the plain "pallas" leg already covers the
        # double-buffered kernel; this leg keeps the non-pipelined HBM kernel
        # (still selectable via GPT_TPU_DMA_PIPE=0) validated too
        legs.append(("pallas-nopipe", {"GPT_TPU_DMA_PIPE": "0"}))
        # MXU edge-test prefilter (flag-gated, perf-negative on this scene
        # but bit-exact by construction — keep it validated on-chip)
        legs.append(("pallas-mxu", {"GPT_TPU_MXU": "1"}))
    imgs = {}
    for name, env in legs:
        out = os.path.join(td, name + ".npy")
        run(out, env)
        imgs[name] = np.load(out)
    ref = imgs["bvh"]
    ok = True
    for name, ia in imgs.items():
        if name == "bvh":
            continue
        diff = np.abs(ia - ref)
        # identical RNG + identical estimator; only the traversal differs,
        # so images must agree to fp tolerance (tie-breaks on coplanar tris
        # may differ on a handful of pixels)
        frac_off = (diff.max(axis=-1) > 1e-3).mean()
        print(f"{name} vs bvh: max|diff|={diff.max():.3e} "
              f"mean|diff|={diff.mean():.3e} img mean={ia.mean():.4f} "
              f"pixels off by >1e-3: {frac_off*100:.3f}%")
        ok = ok and frac_off < 0.005
    print("PARITY OK" if ok else "PARITY FAIL")
    sys.exit(0 if ok else 1)
