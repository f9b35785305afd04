"""XLA op-level profile of one full SPPM iteration (photon + eye + gather)
at 512^2 / 50k photons — prints top ops by self time per jitted stage.

Usage: python scripts/profile_sppm_xplane.py [fog]
"""
import csv
import dataclasses
import functools
import glob
import io
import os
import pathlib
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpu_pathtracer_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gpu_pathtracer_tpu.models.camera import Camera  # noqa: E402
from gpu_pathtracer_tpu.models.scene import build_scene  # noqa: E402
from gpu_pathtracer_tpu.render import sppm  # noqa: E402
from gpu_pathtracer_tpu.utils import testscenes  # noqa: E402
from gpu_pathtracer_tpu.utils.obj_io import load_scene  # noqa: E402

fog = "fog" in sys.argv[1:]
size = int(os.environ.get("PROF_SIZE", "512"))
n_phot = int(os.environ.get("PROF_PHOTONS", "50000"))

folder = tempfile.mkdtemp(prefix="prof_sx_")
testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=0, fog=fog)
mtl = pathlib.Path(folder) / "box.mtl"
mtl.write_text(mtl.read_text().replace(
    "newmtl light\nKd 0 0 0", "newmtl light\nKd 0.78 0.78 0.78"
))
scene = build_scene(load_scene(folder, "box.obj"))
camera = Camera.create(
    eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
    fovy_deg=40.0, width=size, height=size,
)
w = h = size
r = w * h
ii, jj = jnp.meshgrid(
    jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
    indexing="ij",
)
pix_i = ii.reshape(-1)
pix_j = jj.reshape(-1)
use_grid = r * n_phot > (1 << 24)

eye_jit = jax.jit(
    functools.partial(sppm.eye_pass, max_bounce=64, volume_grid=use_grid),
    static_argnames=("init",),
)
key = jax.random.key(5)
vol_r = jnp.full((r,), jnp.inf)
loc, nrm, filt, direct, _, valid = eye_jit(
    scene, camera, jax.random.fold_in(key, 0),
    pix_i + 0.5, pix_j + 0.5, None, vol_r, init=True,
)[:6]
radius = sppm.initial_radius(
    eye_jit, scene, camera, jax.random.fold_in(key, 0), pix_i, pix_j,
    loc, valid, 1.0,
)
hp_loc = jnp.where(valid[..., None], loc, jnp.inf)

gather_jit = jax.jit(functools.partial(
    sppm.surface_gather_grid if use_grid else sppm.surface_gather,
    k_nearest=16,
))

pkey = jax.random.fold_in(key, 1000)


def one_iter(tag):
    photons = sppm.photon_pass(scene, pkey, n_photons=n_phot, max_bounce=8)
    outs = eye_jit(
        scene, camera, jax.random.fold_in(pkey, 1),
        pix_i + jax.random.uniform(jax.random.fold_in(pkey, 2), (r,)),
        pix_j + jax.random.uniform(jax.random.fold_in(pkey, 3), (r,)),
        photons, 2.0 * radius, init=False,
    )
    flux = gather_jit(scene, photons, hp_loc, nrm, radius, valid)
    # materialize everything
    for leaf in jax.tree.leaves((photons.pos, outs[0], flux)):
        np.asarray(leaf).reshape(-1)[:1]


one_iter("warmup")

logdir = "/tmp/xprof_sppm"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    one_iter("profiled")

xplane = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", xplane)

from xprof.convert import raw_to_tool_data as rtd  # noqa: E402

data, _ = rtd.xspace_to_tool_data(xplane, "framework_op_stats", {"tqx": "out:csv;"})
if isinstance(data, bytes):
    data = data.decode()
rows = list(csv.reader(io.StringIO(data)))
hdr = rows[0]
print(",".join(hdr[:8]))
for row in rows[1:50]:
    print(",".join(row[:8]))
