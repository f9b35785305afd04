"""Sweep mesh-path kernel knobs (SUBCULL, TRI_TILE) on the 327k-tri bench.

Each config runs in a subprocess (knobs are read at import).  Serial only —
the persistent compile cache corrupts under concurrent writers, and the
2-CPU box can't overlap compiles anyway.

Usage: python scripts/profile_meshcfg.py [spp]
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_meshcfg_cache")
from gpu_pathtracer_tpu.utils.platform import apply_platform_env
apply_platform_env()
from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.render import render_image
from gpu_pathtracer_tpu.utils import testscenes

t0 = time.time()
scene = build_scene(testscenes.make_mesh_scene_host(subdiv=7))
jax.block_until_ready(scene.geom.p)
print("scene build:", round(time.time() - t0, 1), flush=True)
cam = Camera.create(eye=(0.5, 0.8, 2.2), center=(0.5, 0.45, 0.5), up=(0, 1, 0),
                    fovy_deg=45.0, width=512, height=512)
spp = int(os.environ.get("MESHCFG_SPP", "2"))
kw = dict(width=512, height=512, sample_size=spp, level=8,
          hittable_pdf_weight=0.5)
t0 = time.time()
img = render_image(scene, cam, jax.random.key(0), **kw)
import numpy as np
m0 = float(np.asarray(img).mean())  # force host materialization (axon
print("compile+first render:", round(time.time() - t0, 1), flush=True)
t0 = time.time()
img = render_image(scene, cam, jax.random.key(1), **kw)
mean = float(np.asarray(img).mean())
dt = time.time() - t0
print("img mean:", round(mean, 5))
print("RESULT", 512 * 512 * spp * 8 / dt / 1e6)
"""

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spp = sys.argv[1] if len(sys.argv) > 1 else "2"

configs = [
    {"GPT_TPU_SUBCULL": "0", "GPT_TPU_TRI_TILE": "2048", "GPT_TPU_RAY_BLOCK": "64"},
    {"GPT_TPU_SUBCULL": "0", "GPT_TPU_TRI_TILE": "1024", "GPT_TPU_RAY_BLOCK": "64"},
    {"GPT_TPU_SUBCULL": "0", "GPT_TPU_TRI_TILE": "4096", "GPT_TPU_RAY_BLOCK": "128"},
    {"GPT_TPU_SUBCULL": "1", "GPT_TPU_TRI_TILE": "2048", "GPT_TPU_RAY_BLOCK": "128"},
]
if os.environ.get("MESHCFG_ONLY"):
    idx = [int(x) for x in os.environ["MESHCFG_ONLY"].split(",")]
    configs = [configs[i] for i in idx]

for cfg in configs:
    env = dict(os.environ)
    env["MESHCFG_SPP"] = spp
    env.update(cfg)
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"root": root}],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    mrps = float(line[0].split()[1]) if line else None
    print(json.dumps({"cfg": cfg, "mrays_s": mrps}), flush=True)
    print("   " + " | ".join(
        l for l in out.stdout.splitlines() if not l.startswith("RESULT")
    ), flush=True)
    if mrps is None:
        print(out.stderr[-2000:], flush=True)
