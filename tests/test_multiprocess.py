"""Multi-HOST tests on the multiprocess CPU backend (SURVEY.md §4: "multi-
host tests runnable on CPU via ... multiprocess CPU backend").

Launches 2 REAL processes with 4 virtual CPU devices each, wired together
with `jax.distributed.initialize` (gpu_pathtracer_tpu.parallel.dist), and
runs the two cross-host code paths over the resulting 8-device global mesh:

* `render_image_shard_map` — pixel slices owned per device, cross-process
  device ids exercised end-to-end;
* `photon_pass_distributed` — the photon-map all-gather crossing the
  process (DCN-analog) boundary.

Both are compared BIT-FOR-BIT against the single-process 8-device run (the
pytest process's own virtual mesh): the RNG is counter-based with shard
folds by `axis_index`, and the all-gather is a deterministic concatenation,
so results depend on the mesh SIZE, not its process layout.  This is the
strongest possible statement that one-process multi-device tests and a real
multi-host launch execute the same estimator.
"""

import os
import pathlib
import socket
import subprocess
import sys
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

ROOT = str(pathlib.Path(__file__).resolve().parent.parent)

CHILD = r"""
import os, sys, tempfile
sys.path.insert(0, %(root)r)
import jax
from gpu_pathtracer_tpu.utils.platform import apply_platform_env
apply_platform_env()
from gpu_pathtracer_tpu.parallel import dist
assert dist.init_distributed(), "env should describe a 2-process run"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()
jax.config.update("jax_threefry_partitionable", True)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.parallel import render_image_shard_map
from gpu_pathtracer_tpu.parallel.sppm_shard import photon_pass_distributed
from gpu_pathtracer_tpu.utils import testscenes
from gpu_pathtracer_tpu.utils.obj_io import load_scene

folder = tempfile.mkdtemp()
testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=0)
scene = build_scene(load_scene(folder, "box.obj"))
cam = Camera.create(eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
                    fovy_deg=40.0, width=8, height=8)
mesh = dist.global_mesh()
repl = NamedSharding(mesh, P())
# scene/camera/key stay as UNCOMMITTED process-local arrays: in
# multi-controller jit they are treated as replicated inputs (identical on
# every process by construction — same deterministic build).  An explicit
# device_put(x, repl) would also work but its same-value-everywhere
# verification uses equality, which trips on legitimate NaN fields
# (untangent-able vertices are NaN by design).
key = jax.random.key(7)

img = render_image_shard_map(
    scene, cam, key, width=8, height=8, mesh=mesh,
    sample_size=2, level=3, hittable_pdf_weight=0.5,
)
# replicate the (possibly sharded) global image so every process holds the
# full (8, 8, 3) value locally — the image-assembly all-gather of §2.7
img_full = np.asarray(jax.jit(lambda x: x, out_shardings=repl)(img))

pkey = jax.random.key(3)
photons = photon_pass_distributed(
    scene, pkey, n_photons=256, mesh=mesh, max_bounce=4
)
# photon map is replicated (all-gathered) -> fully addressable everywhere
pos = np.asarray(photons.pos)
color = np.asarray(photons.color)
valid = np.asarray(photons.valid)

if jax.process_index() == 0:
    np.savez(os.environ["MP_OUT"], img=img_full, pos=pos, color=color,
             valid=valid)
multihost_utils.sync_global_devices("done")
print("child", jax.process_index(), "ok")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_and_photon_allgather(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mp_out.npz")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_PLATFORMS="cpu",
            GPT_TPU_COORDINATOR=f"127.0.0.1:{port}",
            GPT_TPU_NUM_PROCESSES="2",
            GPT_TPU_PROCESS_ID=str(pid),
            MP_OUT=out,
            JAX_ENABLE_X64="0",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD % {"root": ROOT}],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=800) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{so[-2000:]}\n{se[-4000:]}"

    got = np.load(out)

    # single-process 8-device oracle (the pytest process's own virtual mesh)
    from gpu_pathtracer_tpu.models.camera import Camera
    from gpu_pathtracer_tpu.models.scene import build_scene
    from gpu_pathtracer_tpu.parallel import render_image_shard_map
    from gpu_pathtracer_tpu.parallel.shard import make_mesh
    from gpu_pathtracer_tpu.parallel.sppm_shard import photon_pass_distributed
    from gpu_pathtracer_tpu.utils import testscenes
    from gpu_pathtracer_tpu.utils.obj_io import load_scene

    folder = tempfile.mkdtemp()
    testscenes.make_cornell_box(folder, spheres=True, sphere_subdiv=0)
    scene = build_scene(load_scene(folder, "box.obj"))
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=8, height=8,
    )
    mesh = make_mesh()
    assert mesh.size == 8
    want_img = np.asarray(
        render_image_shard_map(
            scene, cam, jax.random.key(7), width=8, height=8, mesh=mesh,
            sample_size=2, level=3, hittable_pdf_weight=0.5,
        )
    )
    want_ph = photon_pass_distributed(
        scene, jax.random.key(3), n_photons=256, mesh=mesh, max_bounce=4
    )

    np.testing.assert_array_equal(got["img"], want_img)
    np.testing.assert_array_equal(got["valid"], np.asarray(want_ph.valid))
    np.testing.assert_array_equal(got["pos"], np.asarray(want_ph.pos))
    np.testing.assert_array_equal(got["color"], np.asarray(want_ph.color))
    assert got["valid"].any(), "no photons deposited in multiprocess run"
