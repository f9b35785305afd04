"""Distributed SPPM: sharded photon pass + photon-map all-gather, sharded
eye/gather passes, and checkpoint/resume of the SPPM accumulation state.

Runs on the virtual 8-device CPU mesh (conftest) — the TPU-native answer to
testing pod-slice code without a pod slice (SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import build_scene
from gpu_pathtracer_tpu.parallel import make_mesh
from gpu_pathtracer_tpu.parallel.sppm_shard import (
    photon_pass_distributed,
    render_sppm_distributed,
)
from gpu_pathtracer_tpu.render import sppm
from gpu_pathtracer_tpu.utils.config import RenderConfig
from gpu_pathtracer_tpu.utils.obj_io import load_scene

from test_sppm import _make_sppm_box


def _box(tmp_path):
    folder = tmp_path / "scene"
    _make_sppm_box(folder)
    return build_scene(load_scene(folder, "box.obj"))


def _cam(n=8):
    return Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=n, height=n,
    )


def test_photon_pass_distributed_matches_shape_and_deposits(tmp_path):
    scene = _box(tmp_path)
    mesh = make_mesh()
    n = 64 * mesh.size
    photons = photon_pass_distributed(
        scene, jax.random.key(3), n_photons=n, mesh=mesh, max_bounce=4
    )
    assert photons.pos.shape == (n, 3)
    valid = np.asarray(photons.valid)
    assert valid.any(), "no photons deposited on the distributed path"
    pos = np.asarray(photons.pos)[valid]
    assert (pos > -0.01).all() and (pos < 1.01).all()
    # every shard contributed: the map is the union of per-chip traces, so
    # deposits should appear in more than one shard's slice
    per_shard = valid.reshape(mesh.size, -1).any(axis=1)
    assert per_shard.sum() >= 2


def test_photon_pass_distributed_mesh_size_invariant(tmp_path):
    """The union over a 2-chip mesh equals the union of the two per-chip
    traces run locally (shard-stable counter-based RNG)."""
    scene = _box(tmp_path)
    mesh2 = make_mesh(jax.devices()[:2])
    key = jax.random.key(11)
    n = 128
    dist = photon_pass_distributed(
        scene, key, n_photons=n, mesh=mesh2, max_bounce=4
    )
    shard_base = jax.random.fold_in(key, 0x5BBD << 12)
    local0 = sppm.photon_pass(
        scene, jax.random.fold_in(shard_base, 0), n_photons=n // 2, max_bounce=4
    )
    local1 = sppm.photon_pass(
        scene, jax.random.fold_in(shard_base, 1), n_photons=n // 2, max_bounce=4
    )
    ref_pos = np.concatenate([np.asarray(local0.pos), np.asarray(local1.pos)])
    ref_valid = np.concatenate(
        [np.asarray(local0.valid), np.asarray(local1.valid)]
    )
    got_valid = np.asarray(dist.valid)
    np.testing.assert_array_equal(got_valid, ref_valid)
    np.testing.assert_allclose(
        np.asarray(dist.pos)[got_valid], ref_pos[ref_valid], rtol=1e-6
    )


def test_render_sppm_distributed_smoke(tmp_path):
    scene = _box(tmp_path)
    cfg = RenderConfig(
        image_width=8, image_height=8,
        ppm_num_photon_per_pass=256, ppm_num_pass=2,
        ppm_max_bounce=4, ppm_alpha=0.7, ppm_radius_scaling_factor=1.0,
    )
    img = render_sppm_distributed(
        scene, _cam(8), cfg, jax.random.key(5), mesh=make_mesh()
    )
    assert img.shape == (8, 8, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.mean() > 1e-4, f"distributed SPPM image black: {img.mean()}"


def test_shard_photon_keys_decorrelated():
    """Shard-local photon keys must not collide with any key render_sppm /
    photon_pass / eye_pass derive from the same per-pass key (round-2
    advisor finding: shard 1's photon stream was bit-identical to the eye
    pass's fold_in(pkey, 1) stream, correlating map and hit points)."""
    pkey = jax.random.fold_in(jax.random.key(3), 1000)
    shard_keys = {
        bytes(np.asarray(jax.random.key_data(
            jax.random.fold_in(jax.random.fold_in(pkey, 0x5BBD << 12), s)
        )))
        for s in range(16)
    }
    render_keys = {
        bytes(np.asarray(jax.random.key_data(jax.random.fold_in(pkey, t))))
        for t in range(4096)
    }
    assert shard_keys.isdisjoint(render_keys)


def test_sppm_checkpoint_refuses_foreign_run(tmp_path):
    """A checkpoint written by a different run (here: different key) must
    not be silently blended into this one."""
    import pytest

    scene = _box(tmp_path)
    cam = _cam(8)
    base = dict(
        image_width=8, image_height=8,
        ppm_num_photon_per_pass=256,
        ppm_max_bounce=4, ppm_alpha=0.7, ppm_radius_scaling_factor=1.0,
    )
    cfg = RenderConfig(ppm_num_pass=1, **base)
    ckpt = str(tmp_path / "ckpt_foreign")
    sppm.render_sppm(
        scene, cam, cfg, jax.random.key(5),
        checkpoint_dir=ckpt, checkpoint_every=1,
    )
    with pytest.raises(ValueError, match="different run"):
        sppm.render_sppm(
            scene, cam, cfg, jax.random.key(6),
            checkpoint_dir=ckpt, checkpoint_every=1,
        )


def test_sppm_checkpoint_resume(tmp_path):
    """Interrupting after pass 1 and resuming yields the same accumulation
    state as an uninterrupted run (per-pass state is fully checkpointed)."""
    scene = _box(tmp_path)
    cam = _cam(8)
    key = jax.random.key(5)
    base = dict(
        image_width=8, image_height=8,
        ppm_num_photon_per_pass=256,
        ppm_max_bounce=4, ppm_alpha=0.7, ppm_radius_scaling_factor=1.0,
    )
    ckpt = str(tmp_path / "ckpt")

    # run 2 passes straight through (no checkpointing) — the oracle
    cfg3 = RenderConfig(ppm_num_pass=2, **base)
    oracle = sppm.render_sppm(scene, cam, cfg3, key)

    # run 1 pass with checkpointing, then "crash" and resume to pass 2
    cfg1 = RenderConfig(ppm_num_pass=1, **base)
    sppm.render_sppm(
        scene, cam, cfg1, key, checkpoint_dir=ckpt, checkpoint_every=1
    )
    resumed = sppm.render_sppm(
        scene, cam, cfg3, key, checkpoint_dir=ckpt, checkpoint_every=1
    )
    np.testing.assert_allclose(resumed, oracle, rtol=1e-5, atol=1e-7)


def test_distributed_differentiable_sppm_step(tmp_path):
    """VERDICT r04 missing #2: gradients THROUGH a mesh-sharded SPPM render
    (BASELINE north star: "parameter gradients all-reduced over ICI"
    composed with "differentiable emitter optimization").  One jitted
    value_and_grad of the SPPM L2 loss with the photon pass sharded over
    the 8-device mesh and the pixel wavefront GSPMD-sharded; loss and ke
    gradients must match the same estimator run without any sharding
    (photon shard keys emulated locally), and be finite."""
    import dataclasses
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpu_pathtracer_tpu import optim

    scene = _box(tmp_path)
    cam = _cam(8)
    mesh = make_mesh()
    n_phot = 8 * mesh.size
    kw = dict(num_pass=1, max_bounce=3, eye_bounce=4, gather_grid=False)
    target = jnp.zeros((8, 8, 3))

    dist_loss = optim.sppm_loss_fn(
        scene, cam, target, n_photons=n_phot, **kw,
        photon_pass_fn=functools.partial(photon_pass_distributed, mesh=mesh),
        pixel_sharding=NamedSharding(mesh, P("rays")),
    )

    def local_photon_fn(scene, key, n_photons, max_bounce, stack_size,
                        differentiable=False):
        # the exact per-shard key folding of photon_pass_distributed,
        # emulated without a mesh (all_gather tiling == concatenation)
        base = jax.random.fold_in(key, 0x5BBD << 12)
        parts = [
            sppm.photon_pass(
                scene, jax.random.fold_in(base, s),
                n_photons=n_photons // mesh.size, max_bounce=max_bounce,
                stack_size=stack_size, differentiable=differentiable,
            )
            for s in range(mesh.size)
        ]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)

    local_loss = optim.sppm_loss_fn(
        scene, cam, target, n_photons=n_phot, **kw,
        photon_pass_fn=local_photon_fn,
    )

    params = {"ke": scene.materials.ke}
    key = jax.random.key(7)
    lv_d, g_d = jax.jit(jax.value_and_grad(dist_loss))(params, key)
    lv_l, g_l = jax.jit(jax.value_and_grad(local_loss))(params, key)

    assert np.isfinite(float(lv_d))
    gd = np.asarray(g_d["ke"])
    gl = np.asarray(g_l["ke"])
    assert np.isfinite(gd).all()
    assert np.abs(gd).max() > 0, "no gradient flowed through the sharded render"
    np.testing.assert_allclose(float(lv_d), float(lv_l), rtol=1e-5)
    np.testing.assert_allclose(gd, gl, rtol=1e-4, atol=1e-7)
