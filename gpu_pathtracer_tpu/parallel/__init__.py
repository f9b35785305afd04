"""Multi-chip data parallelism over rays/pixels.

The reference is single-process single-GPU (SURVEY.md §2.7); its only
parallelism is the per-pixel CUDA grid.  The TPU-native scale-out axis is
**ray/pixel data parallelism over an ICI mesh**: rays and pixels sharded
across chips, scene + BVH replicated, photon maps all-gathered, parameter
gradients all-reduced (`psum`) — the layout called for by BASELINE.json.

Two render paths:

* `render_image_distributed` — GSPMD: annotate the pixel batch with a
  `NamedSharding` over the 'rays' axis and run the ordinary jitted
  renderer.  XLA partitions every op; with `jax_threefry_partitionable`
  the result is bit-identical to the single-device render for any mesh.
* `render_image_shard_map` — explicit `shard_map`: each chip runs its own
  wavefront `while_loop` to convergence on its pixel slice with NO global
  synchronization per bounce step (the GSPMD path all-reduces the loop
  predicate every step).  Per-shard RNG keys are folded with the shard
  index, mirroring the reference's per-thread cuRAND streams
  (util/general.h:15: seed fixed, sequence = thread id).

`train_step_distributed` wires the differentiable loop: L2 loss between a
sharded render and a sharded target image, gradients on the replicated
material table all-reduced over ICI by GSPMD (the backward of a broadcast
is a psum).
"""

from gpu_pathtracer_tpu.parallel.dist import (  # noqa: F401
    global_mesh,
    host_local_slice,
    init_distributed,
)
from gpu_pathtracer_tpu.parallel.shard import (  # noqa: F401
    make_mesh,
    render_image_distributed,
    render_image_shard_map,
    train_step_distributed,
)
