"""Multi-host execution: `jax.distributed` wiring + global-mesh helpers.

The reference renderer is strictly single-process/single-GPU (SURVEY.md §1:
"no multi-GPU/multi-node communication"); SURVEY.md §2.7 and §5 name the
TPU-native scale-out explicitly — `jax.distributed.initialize` + ICI/DCN
collectives, with multi-host code testable on CPU via a multiprocess
backend.  This module is that layer:

* `init_distributed()` — env-driven `jax.distributed.initialize`.  A no-op
  when the env doesn't describe a multi-process run, so every entry point
  can call it unconditionally: single-process behavior is unchanged.
* `global_mesh()` — 1-D 'rays' mesh over ALL devices (local + remote).
  Collectives inside `shard_map` over this mesh ride ICI within a host and
  DCN across hosts — XLA picks the transport from the device topology;
  nothing in the render code changes between 1 and N hosts.
* `host_local_slice()` — which rows of a globally sharded batch this
  process owns (for process-local IO like writing image tiles).

Launch convention (mirrors jax.distributed's own env vars but namespaced so
a single-process run on a multi-host-capable cluster stays explicit):

    GPT_TPU_COORDINATOR=host0:12345 GPT_TPU_NUM_PROCESSES=2 \
    GPT_TPU_PROCESS_ID=0 python render.py ...

On TPU pods with the standard runtime env, plain
`jax.distributed.initialize()` auto-discovers everything; we call it with
no args when GPT_TPU_AUTO_DISTRIBUTED=1 is set instead.

Tested in tests/test_multiprocess.py by launching 2 real processes x 4
virtual CPU devices each and checking the distributed render and the
photon-map all-gather agree with the single-process 8-device run
bit-for-bit (the collectives are concatenations and the RNG is counter-
based, so the mesh *size*, not its process layout, determines results).
"""

from __future__ import annotations

import os

import jax

from gpu_pathtracer_tpu.parallel.shard import AXIS


def init_distributed() -> bool:
    """Initialize `jax.distributed` from the environment; no-op otherwise.

    Returns True iff a multi-process runtime was initialized.  Call before
    any jax computation (device enumeration is frozen at first use).
    """
    if os.environ.get("GPT_TPU_AUTO_DISTRIBUTED", "0") != "0":
        jax.distributed.initialize()
        return True
    coord = os.environ.get("GPT_TPU_COORDINATOR")
    nproc = os.environ.get("GPT_TPU_NUM_PROCESSES")
    pid = os.environ.get("GPT_TPU_PROCESS_ID")
    if not (coord and nproc and pid is not None and pid != ""):
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc),
        process_id=int(pid),
        # virtual CPU devices for the multiprocess CPU-backend tests
        # (SURVEY.md §4); harmless on real TPU processes where the plugin
        # reports its own devices
        local_device_ids=None,
    )
    return True


def global_mesh() -> "jax.sharding.Mesh":
    """1-D 'rays' mesh over every device in the (possibly multi-host) job."""
    from jax.sharding import Mesh

    return Mesh(jax.devices(), axis_names=(AXIS,))


def host_local_slice(n_rows: int, mesh=None) -> slice:
    """Rows of a P('rays')-sharded length-`n_rows` batch owned by this
    process (contiguous because the mesh lists devices in process order).
    `n_rows` must divide evenly by the device count."""
    mesh = mesh or global_mesh()
    n_dev = mesh.size
    assert n_rows % n_dev == 0, (n_rows, n_dev)
    per_dev = n_rows // n_dev
    local = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    ids = sorted(
        i for i, d in enumerate(mesh.devices.flat)
        if d.process_index == jax.process_index()
    )
    assert ids == list(range(ids[0], ids[0] + len(local))), (
        "mesh devices of one process must be contiguous for slice addressing"
    )
    return slice(ids[0] * per_dev, (ids[-1] + 1) * per_dev)
