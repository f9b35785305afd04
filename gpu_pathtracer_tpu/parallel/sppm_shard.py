"""Distributed SPPM: sharded photon tracing + photon-map all-gather.

The reference's SPPM is single-GPU (`src/main.cu:1489-1869`: one photon
kernel, one per-pass photon-BVH rebuild, one gather kernel).  The TPU-native
scale-out (SURVEY.md §2.7) is:

* **photon pass**: each chip traces `n_photons / n_dev` photons with a
  decorrelated (shard-folded) RNG key, then the per-chip photon maps are
  **all-gathered over ICI** so every chip holds the full map — the direct
  analog of the reference's single global photon array, with the build cost
  divided by the mesh size;
* **eye pass + gather**: the pixel batch is sharded over the same mesh
  (GSPMD: one `with_sharding_constraint` on the pixel arrays); the photon
  map stays replicated, so the per-pixel radius queries need no further
  communication;
* SPPM accumulation state (flux, radii) is per-pixel and therefore sharded
  with the pixels; no reduction is needed until the final image assembly
  (an all-gather XLA inserts at the output).

Everything is mesh-shape agnostic and runs identically on the tests' virtual
8-device CPU mesh and a real pod slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpu_pathtracer_tpu.parallel._shardmap import shard_map

from gpu_pathtracer_tpu.constants import MATERIAL_STACK_SIZE
from gpu_pathtracer_tpu.parallel.shard import AXIS, make_mesh
from gpu_pathtracer_tpu.render import sppm as sppm_mod


@functools.partial(
    jax.jit,
    static_argnames=("n_photons", "max_bounce", "stack_size", "mesh",
                     "differentiable"),
)
def photon_pass_distributed(
    scene,
    key: jax.Array,
    n_photons: int,
    mesh: Mesh,
    max_bounce: int = 16,
    stack_size: int = MATERIAL_STACK_SIZE,
    differentiable: bool = False,
) -> sppm_mod.Photons:
    """Photon tracing sharded over `mesh`; returns the full (replicated)
    photon map after an ICI all-gather.

    `n_photons` is the GLOBAL photon budget; it must divide by the mesh
    size (pad up if needed).  Each chip emits its slice with the shard index
    folded into the key, so the union is exactly one decorrelated global
    photon set — same estimator as the reference's single launch
    (photon_pass.h:98), independent of the mesh shape.
    """
    n_dev = mesh.size
    assert n_photons % n_dev == 0, (n_photons, n_dev)
    local = n_photons // n_dev

    def shard_fn(scene, key):
        shard_id = jax.lax.axis_index(AXIS)
        # decorrelate the shard fold from render_sppm's key namespace: a bare
        # fold_in(key, shard_id) makes shard 1's photon stream bit-identical
        # to the eye pass's fold_in(key, 1) stream, statistically correlating
        # photon map and hit points.  The large constant keeps every shard
        # fold outside the small integers render_sppm/eye_pass/photon_pass
        # fold from the same parent keys.
        local_key = jax.random.fold_in(
            jax.random.fold_in(key, 0x5BBD << 12), shard_id
        )
        photons = sppm_mod.photon_pass(
            scene, local_key, n_photons=local,
            max_bounce=max_bounce, stack_size=stack_size,
            differentiable=differentiable,
        )
        # photon-map all-gather over ICI (SURVEY.md §2.7): every chip ends
        # with the full map, tiled in shard order along the photon axis
        return jax.tree.map(
            lambda x: jax.lax.all_gather(x, AXIS, axis=0, tiled=True), photons
        )

    repl = jax.tree.map(lambda _: P(), scene)
    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(repl, P()),
        out_specs=sppm_mod.Photons(
            pos=P(), color=P(), direction=P(), prev=P(),
            on_surface=P(), valid=P(),
        ),
        check=False,
    )(scene, key)


def render_sppm_distributed(
    scene,
    camera,
    cfg,
    key,
    mesh: Mesh | None = None,
    output_prefix: str | None = None,
):
    """Full SPPM render with the photon pass sharded over `mesh` and the
    pixel batch GSPMD-sharded.  Same estimator as `render_sppm`; the only
    difference is where the work runs.  Returns (H, W, 3) numpy."""
    import numpy as np

    mesh = mesh or make_mesh()
    pix_sharding = NamedSharding(mesh, P(AXIS))

    # per-pass photon budget rounded up to the mesh size
    n_phot = int(cfg.ppm_num_photon_per_pass)
    n_phot += (-n_phot) % mesh.size

    def dist_photon_pass(scene, pkey, n_photons, max_bounce, stack_size):
        return photon_pass_distributed(
            scene, pkey, n_photons=n_photons, mesh=mesh,
            max_bounce=max_bounce, stack_size=stack_size,
        )

    return sppm_mod.render_sppm(
        scene, camera, cfg, key,
        output_prefix=output_prefix,
        photon_pass_fn=dist_photon_pass,
        n_photons_override=n_phot,
        pixel_sharding=pix_sharding,
    )
