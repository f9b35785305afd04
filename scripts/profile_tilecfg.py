"""Sweep (TRI_TILE, RAY_BLOCK) for the Pallas kernel on the bench render.

Each config runs in a subprocess (the knobs are read at import time).
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import os, sys, tempfile, time
sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp
from gpu_pathtracer_tpu.utils.platform import apply_platform_env
apply_platform_env()
from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.render import render_image
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene

folder = tempfile.mkdtemp()
testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
scene = build_scene(load_scene(folder, "box.obj"))
cam = Camera.create(eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
                    fovy_deg=40.0, width=512, height=512)
kw = dict(width=512, height=512, sample_size=4, level=8,
          hittable_pdf_weight=0.5)
img = render_image(scene, cam, jax.random.key(0), **kw)
jax.block_until_ready(img)
t0 = time.time()
img = render_image(scene, cam, jax.random.key(1), **kw)
jax.block_until_ready(img)
dt = time.time() - t0
print("RESULT", 512 * 512 * 4 * 8 / dt / 1e6)
"""

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
configs = [
    (512, 256), (256, 256), (128, 256), (512, 128), (256, 128), (512, 512),
]
for tri_tile, ray_block in configs:
    env = dict(os.environ)
    env["GPT_TPU_TRI_TILE"] = str(tri_tile)
    env["GPT_TPU_RAY_BLOCK"] = str(ray_block)
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"root": root}],
        env=env, capture_output=True, text=True, timeout=420,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    mrps = float(line[0].split()[1]) if line else None
    print(json.dumps({"tri_tile": tri_tile, "ray_block": ray_block,
                      "mrays_s": mrps}), flush=True)
    if mrps is None:
        print(out.stderr[-2000:], flush=True)
