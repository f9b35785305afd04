"""Capture an XLA op-level profile of the hot bounce step and print the
top ops by self time (uses xprof's xplane converter)."""
import sys, os, tempfile, glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp

from gpu_pathtracer_tpu.utils.platform import apply_platform_env
apply_platform_env()

from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene
from gpu_pathtracer_tpu.ops import trace, materials
from gpu_pathtracer_tpu.render.integrator import trace_paths, interpolate_hit

folder = tempfile.mkdtemp()
testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=2)
scene = build_scene(load_scene(folder, "box.obj"))
g = scene.geom
table = scene.materials
key = jax.random.key(0)

# REAL bench frame (synthetic linspace rays mislead: they are already
# coherent, so the coherence sort + cull look free)
from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.render import render_image
import numpy as np
camera = Camera.create(eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0),
                       up=(0, 1, 0), fovy_deg=40.0, width=512, height=512)
kw = dict(width=512, height=512, sample_size=2, level=8,
          hittable_pdf_weight=0.5)
out = render_image(scene, camera, key, **kw)
np.asarray(out).mean()  # block (axon block_until_ready is unreliable)

logdir = "/tmp/xprof_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    out = render_image(scene, camera, jax.random.key(1), **kw)
    np.asarray(out).mean()

xplane = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", xplane)

from xprof.convert import raw_to_tool_data as rtd

data, _ = rtd.xspace_to_tool_data(xplane, "framework_op_stats", {"tqx": "out:csv;"})
if isinstance(data, bytes):
    data = data.decode()
import csv, io
rows = list(csv.reader(io.StringIO(data)))
hdr = rows[0]
print(",".join(hdr[:8]))
for r in rows[1:40]:
    print(",".join(r[:8]))
