"""Inverse rendering: optimize scene parameters against target images.

The reference renderer is forward-only; differentiability is this
framework's north star (BASELINE.md: "differentiable emitter optimization"
on the neon-sign config).  The estimator in `render.integrator.trace_paths`
is pathwise-differentiable (path-replay style: the sampled paths are fixed
by the RNG key, the throughput product is differentiated), so pixel
gradients flow to any continuous material/emitter/texture parameter.

`optimize` runs Adam over any subset of MaterialTable fields with:

* fresh RNG per step (a new key re-randomizes the path set, giving an
  unbiased stochastic gradient — the renderer analog of minibatching);
* non-negativity projection after each update (reflectances/emissions);
* optional orbax checkpointing so long runs resume (SURVEY.md §5 names
  checkpoint/resume as a subsystem the reference lacks).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Iterable, Mapping

import jax
import jax.numpy as jnp
import optax

from gpu_pathtracer_tpu.render.integrator import render_image


def _get_param(materials, name: str) -> jnp.ndarray:
    """Fetch an optimizable leaf by name.  Plain names are MaterialTable
    fields; `atlas_rgb` addresses the packed texture-atlas texels (the
    reference's single global RGB atlas, read_image_util.h:99-178), so
    texture CONTENT is optimizable, not just per-material constants."""
    if name == "atlas_rgb":
        return materials.atlas.rgb
    return getattr(materials, name)


def _substitute(scene, params: Mapping[str, jnp.ndarray]):
    plain = {k: v for k, v in params.items() if k != "atlas_rgb"}
    mats = scene.materials
    if plain:
        mats = dataclasses.replace(mats, **plain)
    if "atlas_rgb" in params:
        mats = dataclasses.replace(
            mats, atlas=dataclasses.replace(mats.atlas, rgb=params["atlas_rgb"])
        )
    return dataclasses.replace(scene, materials=mats)


def render_loss_fn(
    scene,
    camera,
    target: jnp.ndarray,  # (H, W, 3) linear radiance
    width: int,
    height: int,
    sample_size: int = 4,
    level: int = 4,
    hittable_pdf_weight: float = 0.5,
) -> Callable:
    """(params, key) -> scalar L2 loss between render and target."""

    def loss(params, key):
        scn = _substitute(scene, params)
        img = render_image(
            scn, camera, key, width=width, height=height,
            sample_size=sample_size, level=level,
            hittable_pdf_weight=hittable_pdf_weight,
        )
        return jnp.mean((img - target) ** 2)

    return loss


# Production-sized knobs for sppm_loss_fn: at 256^2 pixels the
# `pixels * photons` product crosses the 2^24 auto-dispatch threshold and
# `render_sppm_differentiable` uses the hash-grid gathers, so these sizes
# fit on one chip.  Pass **SPPM_LOSS_PRODUCTION to sppm_loss_fn for real
# optimization runs; the function's own defaults stay small so callers on
# CPU (or `optimize(loss_fn=sppm_loss_fn(...))` smoke tests) don't silently
# pick up a ~100x cost increase.
SPPM_LOSS_PRODUCTION = dict(
    n_photons=16384, num_pass=4, max_bounce=12, eye_bounce=12
)


def sppm_loss_fn(
    scene,
    camera,
    target: jnp.ndarray,  # (H, W, 3) linear radiance
    n_photons: int = 512,
    num_pass: int = 2,
    max_bounce: int = 8,
    eye_bounce: int = 8,
    **sppm_kw,
) -> Callable:
    """(params, key) -> scalar L2 loss between a DIFFERENTIABLE SPPM render
    and `target` — the emitter-optimization-through-the-photon-mapper loss
    (BASELINE config 5; the reference's SPPM, main.cu:1489-1869, is
    forward-only).

    Defaults are smoke-test sized; real optimization runs should pass
    `**SPPM_LOSS_PRODUCTION` (or explicit sizes)."""
    from gpu_pathtracer_tpu.render.sppm import render_sppm_differentiable

    def loss(params, key):
        scn = _substitute(scene, params)
        img = render_sppm_differentiable(
            scn, camera, key,
            width=target.shape[1], height=target.shape[0],
            n_photons=n_photons, num_pass=num_pass,
            max_bounce=max_bounce, eye_bounce=eye_bounce, **sppm_kw,
        )
        return jnp.mean((img - target) ** 2)

    return loss


def optimize(
    scene,
    camera,
    target: jnp.ndarray,
    param_names: Iterable[str] = ("ke",),
    steps: int = 50,
    lr: float = 5e-2,
    key: jax.Array | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 25,
    loss_fn: Callable | None = None,
    **render_kw,
):
    """Adam-optimize MaterialTable fields to match `target`.

    Returns (params, losses).  With `checkpoint_dir`, saves (step, params,
    opt_state) via orbax every `checkpoint_every` steps and resumes from
    the latest checkpoint if one exists.  `loss_fn` overrides the default
    path-tracing L2 loss (e.g. `sppm_loss_fn` for emitter optimization
    through the photon mapper).
    """
    if key is None:
        key = jax.random.key(0)
    params = {name: _get_param(scene.materials, name) for name in param_names}

    if loss_fn is None:
        loss_fn = render_loss_fn(
            scene, camera, target,
            width=target.shape[1], height=target.shape[0], **render_kw,
        )
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    start_step = 0

    mngr = None
    if checkpoint_dir is not None:
        mngr = _checkpoint_manager(checkpoint_dir)
        latest = mngr.latest_step()
        if latest is not None:
            restored = mngr.restore(latest)
            params = jax.tree.map(jnp.asarray, restored["params"])
            opt_state = jax.tree.map(
                jnp.asarray, restored["opt_state"],
            )
            # optax state is a pytree of arrays; rebuild the structure
            opt_state = jax.tree.unflatten(
                jax.tree.structure(opt.init(params)),
                jax.tree.leaves(opt_state),
            )
            start_step = int(latest) + 1

    @jax.jit
    def step_fn(params, opt_state, skey):
        loss, grads = jax.value_and_grad(loss_fn)(params, skey)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = {k: jnp.maximum(v, 0.0) for k, v in params.items()}
        return params, opt_state, loss

    losses = []
    for i in range(start_step, steps):
        params, opt_state, loss = step_fn(
            params, opt_state, jax.random.fold_in(key, i)
        )
        losses.append(float(loss))
        if mngr is not None and (i % checkpoint_every == 0 or i == steps - 1):
            mngr.save(
                i, args=_checkpoint_args({"params": params, "opt_state": opt_state})
            )
    if mngr is not None:
        mngr.wait_until_finished()
    return params, losses


# ---------------------------------------------------------------------------
# orbax helpers (gated import: orbax is baked into the image)
# ---------------------------------------------------------------------------

def _checkpoint_manager(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(max_to_keep=2)
    )


def _checkpoint_args(tree):
    import orbax.checkpoint as ocp

    return ocp.args.StandardSave(tree)
