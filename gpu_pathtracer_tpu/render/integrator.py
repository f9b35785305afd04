"""Wavefront path-tracing integrator.

TPU-native re-derivation of the reference's megakernel path tracer
(`src/render/pathtracing.h:86-200` `_compute_color` and `:252-305`
`path_tracing_render`): instead of one divergent per-pixel thread, ALL rays
advance one bounce per step of a `lax.scan` — each step is a batched BVH
traversal + batched BSDF sample + batched NEE, which is pure vector work.

Estimator parity with the reference per bounce:

    hit  -> ref = check_next_path(...)                    (materials.sample_bsdf)
            if not false_hit and not sss: change_ref_ray  (NEE/MIS, factor)
            acc  += mask * emission(uv)          [non-false hits]
            mask *= ref.filter * clamp(factor, 0, .9999); dead if factor <= 0
            dielectric stack push/pop from (false_hit, entering, refracted)
    miss -> acc += mask * sky(dir); dead

Randomness is counter-based: every (ray, bounce) folds the base key, so the
image is reproducible and independent of sharding layout (the TPU answer to
the reference's per-pixel cuRAND XORWOW streams, util/general.h:8-16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.constants import MATERIAL_STACK_SIZE, SMALL_EPS
from gpu_pathtracer_tpu.ops import bvh as bvh_mod
from gpu_pathtracer_tpu.ops import trace
from gpu_pathtracer_tpu.ops import lights as lights_mod
from gpu_pathtracer_tpu.ops import linalg, materials, sampling, texture
from gpu_pathtracer_tpu.models.scene import Scene


def interpolate_hit(g, table, slot, bary):
    """Barycentric position/uv + the reference's shading normal with
    tangent-frame bump perturbation (Triangle::_get_normal,
    triangle.h:410-441).  Works on any GeometrySet (main or transparent)."""
    s = jnp.maximum(slot, 0)
    b = bary[..., None]  # (R, 3, 1)
    attr = getattr(g, "attr", None)
    if attr is not None:
        # one packed-row gather (CSEs with winner_bary's) instead of four
        rows = attr[s]  # (R, 26)
        point = jnp.sum(b * rows[:, 0:9].reshape(-1, 3, 3), axis=-2)
        n = linalg.normalize(
            jnp.sum(b * rows[:, 9:18].reshape(-1, 3, 3), axis=-2), SMALL_EPS
        )
        uv = jnp.sum(b * rows[:, 18:24].reshape(-1, 3, 2), axis=-2)
        mat_id = rows[:, 25].astype(jnp.int32)  # exact for < 2^24 materials
    else:
        point = jnp.sum(b * trace.gather_rows(g.p, s), axis=-2)
        uv = jnp.sum(b * trace.gather_rows(g.uv, s), axis=-2)
        n = linalg.normalize(
            jnp.sum(b * trace.gather_rows(g.n, s), axis=-2), SMALL_EPS
        )
        mat_id = g.mat_id[s]

    if table.atlas.rgb.shape[0] <= 1:  # no images anywhere -> no bump maps
        return point, uv, n, mat_id

    bump = table.bump_vector(mat_id, uv)  # (R, 3) [u, v, _]
    tangent = jnp.sum(b * trace.gather_rows(g.tangent, s), axis=-2)
    tan_ok = jnp.all(jnp.isfinite(tangent), axis=-1)
    tangent = jnp.where(tan_ok[..., None], tangent, 1.0)
    ux, vy, _ = linalg.onb_from_z_tangent(n, linalg.normalize(tangent, SMALL_EPS))
    ux0, vy0, _ = linalg.onb_from_z(n)
    u_axis = jnp.where(tan_ok[..., None], ux, ux0)
    v_axis = jnp.where(tan_ok[..., None], vy, vy0)

    has_bump = linalg.length(bump) > 0.0
    n_bumped = linalg.normalize(
        n + bump[..., 0:1] * u_axis + bump[..., 1:2] * v_axis, SMALL_EPS
    )
    normal = jnp.where(has_bump[..., None], n_bumped, n)
    return point, uv, normal, mat_id


def _sky_color(scene: Scene, direction):
    """pathtracing.h:69-82."""
    return texture.lookup_sky(
        scene.sky_rgb, scene.sky_h, scene.sky_w, direction, scene.sky_emission
    )


def _nee_mis(
    scene: Scene,
    ref: materials.ReflectionRecord,
    normal,
    coming_dir,
    hittable_pdf_weight: float,
    key,
):
    """change_ref_ray (material_operations.h:87-153): with prob w redirect
    the sampled ray at a light-tree-sampled emitter point, then weight with
    the mixture pdf.  Returns (new_dir, new_filter, factor, mis_dropped) —
    mis_dropped is the (R,) count of emitter leaves the sparse pdf sum had
    to drop past MAX_POTENTIAL_TARGETS (always 0 on the dense path, which
    sums over every emitter)."""
    lt = scene.light_tree
    r_shape = ref.pdf.shape
    pivot = jnp.where(ref.diffuse[..., None], normal, ref.perfect_dir)

    w = jnp.where(jnp.isinf(ref.n), 0.0, hittable_pdf_weight)
    u_accept = jax.random.uniform(jax.random.fold_in(key, 0), r_shape)
    take_light = u_accept < w

    # light pick: dense regime shares one (R, E) pdf table between the pick
    # and the MIS mixture pdf; sparse regime (E > LIGHT_TREE_DENSE_MAX) uses
    # the reference's stochastic descent + bounded walks — O(R log E)
    if lt.dense:
        node_pdf = lights_mod.leaf_node_pdfs(lt, ref.origin, pivot)
        leaf = lights_mod.pick_light_dense(
            lt, node_pdf, jax.random.fold_in(key, 1)
        )
    else:
        leaf = lights_mod.pick_light(
            lt, ref.origin, pivot, jax.random.fold_in(key, 1)
        )
    u1 = jax.random.uniform(jax.random.fold_in(key, 2), r_shape)
    u2 = jax.random.uniform(jax.random.fold_in(key, 3), r_shape)
    target = lights_mod.sample_point_on_light(lt, leaf, u1, u2)
    light_dir = linalg.normalize(target - ref.origin, SMALL_EPS)

    new_dir = jnp.where(take_light[..., None], light_dir, ref.dir)
    # phong re-weighting when a specular/refracted lobe got redirected
    refilter = take_light & (ref.reflected | ref.refracted)
    filt_l = sampling.phong_filter(ref.k, ref.n, pivot, new_dir)
    new_filter = jnp.where(refilter[..., None], filt_l, ref.filter)

    # mixture pdf (material_operations.h:26-72)
    if lt.dense:
        hittable = lights_mod.hittable_pdf_sum(
            lt, ref.origin, new_dir, pivot, node_pdf=node_pdf
        )
        mis_dropped = jnp.zeros(r_shape, jnp.int32)
    else:
        hittable, mis_dropped = lights_mod.hittable_pdf_sum_sparse(
            lt, ref.origin, new_dir, pivot, with_stats=True
        )
    samp_diff = sampling.diffuse_sampling_pdf(normal, new_dir)
    samp_spec = sampling.specular_sampling_pdf(
        coming_dir, new_dir, normal, ref.perfect_dir, ref.n, ref.refracted
    )
    samp = jnp.where(ref.diffuse, samp_diff, samp_spec)
    pdf = w * hittable + (1.0 - w) * samp

    scat = sampling.scattering_pdf(normal, new_dir, ref.diffuse, coming_dir, ref.refracted)
    factor = scat / jnp.pi / jnp.where(pdf != 0, pdf, 1.0)
    factor = jnp.where(pdf != 0, factor, 0.0)
    return new_dir, new_filter, factor, mis_dropped


@functools.partial(
    jax.jit,
    static_argnames=(
        "level", "hittable_pdf_weight", "stack_size", "sss_first_pass",
        "return_stats",
    ),
)
def trace_paths(
    scene: Scene,
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3) unit
    key: jax.Array,
    level: int = 8,
    hittable_pdf_weight: float = 0.0,
    stack_size: int = MATERIAL_STACK_SIZE,
    sss_first_pass: bool = False,
    return_stats: bool = False,
) -> jnp.ndarray:
    """Radiance for a batch of rays (_compute_color, pathtracing.h:86-200).

    One scan step == one bounce for every ray (wavefront).  Returns (R, 3);
    with `return_stats=True`, returns (radiance, stats) where stats carries
    the capacity-overflow counters ("no silent caps"):
    `mis_targets_dropped` = total emitter leaves dropped past
    MAX_POTENTIAL_TARGETS across all (ray, bounce) MIS pdf sums.
    """
    r = origin.shape[0]
    g = scene.geom
    stack_ids, stack_len = materials.stack_init((r,), stack_size)

    state = dict(
        o=origin,
        d=direction,
        mask=jnp.ones((r, 3)),
        acc=jnp.zeros((r, 3)),
        live=jnp.ones((r,), bool),
        stack_ids=stack_ids,
        stack_len=stack_len,
        sss_color=jnp.zeros((r, 3)),
        sss_done=jnp.zeros((r,), bool),
        cap_mis=jnp.zeros((), jnp.int32),
    )

    def bounce(state, i):
        bkey = jax.random.fold_in(key, i)
        t, slot, bary, hit = trace.closest_hit(
            g, state["o"], state["d"], live=state["live"]
        )
        hit = hit & state["live"]

        point, uv, normal, mat_id = interpolate_hit(
            g, scene.materials, slot, bary
        )

        ref = materials.sample_bsdf(
            scene.materials,
            mat_id,
            point,
            state["d"],
            normal,
            uv,
            state["stack_ids"],
            state["stack_len"],
            jax.random.fold_in(bkey, 17),
        )

        # NEE/MIS factor (skipped for false hits / SSS gathers)
        cap_mis = state["cap_mis"]
        if scene.light_tree is not None:
            do_nee = hit & ~ref.false_hit & ~(ref.sss & jnp.bool_(not sss_first_pass))
            new_dir, new_filter, nee_factor, mis_dropped = _nee_mis(
                scene, ref, normal, state["d"],
                hittable_pdf_weight, jax.random.fold_in(bkey, 23),
            )
            next_dir = jnp.where(do_nee[..., None], new_dir, ref.dir)
            filt = jnp.where(do_nee[..., None], new_filter, ref.filter)
            factor = jnp.where(do_nee, nee_factor, 1.0)
            cap_mis = cap_mis + jnp.sum(jnp.where(do_nee, mis_dropped, 0))
        else:
            next_dir, filt, factor = ref.dir, ref.filter, jnp.ones((r,))

        # emission accumulation + throughput update (pathtracing.h:164-183)
        emit = scene.materials.emission_color(mat_id, uv)
        real_hit = hit & ~ref.false_hit
        acc = state["acc"] + jnp.where(
            real_hit[..., None], linalg.de_nan(state["mask"] * emit), 0.0
        )
        cont = factor > 0
        mask = jnp.where(
            (real_hit & cont)[..., None],
            state["mask"] * filt * jnp.clip(factor, 0.0, 0.9999)[..., None],
            state["mask"],
        )

        # miss -> sky (pathtracing.h:186-196)
        sky = _sky_color(scene, state["d"])
        acc = acc + jnp.where(
            (state["live"] & ~hit)[..., None],
            linalg.de_nan(state["mask"] * sky),
            0.0,
        )

        live = state["live"] & hit & (ref.false_hit | cont)

        # SSS diffuse hit: the path's radiance IS the point-cloud gather
        # (pathtracing.h:140-142 returns compute_color_sss, discarding acc)
        sss_color = state["sss_color"]
        sss_done = state["sss_done"]
        if (scene.sss is not None) and (not sss_first_pass):
            from gpu_pathtracer_tpu.render import sss as sss_mod

            sss_now = hit & ref.sss & ~sss_done
            gathered = sss_mod.gather_sss_auto(
                scene.sss,
                point,
                g.obj_id[jnp.maximum(slot, 0)],
                scene.materials.path_length[jnp.maximum(mat_id, 0)],
                scene.materials.diffuse_color(mat_id, uv),
                sss_now,
            )
            sss_color = jnp.where(sss_now[..., None], gathered, sss_color)
            sss_done = sss_done | sss_now
            live = live & ~sss_now

        stack_ids, stack_len = materials.stack_rearrange(
            state["stack_ids"],
            state["stack_len"],
            mat_id,
            ref.false_hit,
            ref.entering,
            ref.refracted,
            hit,
        )

        new_state = dict(
            o=jnp.where(hit[..., None], ref.origin, state["o"]),
            d=jnp.where(hit[..., None], next_dir, state["d"]),
            mask=mask,
            acc=acc,
            live=live,
            stack_ids=stack_ids,
            stack_len=stack_len,
            sss_color=sss_color,
            sss_done=sss_done,
            cap_mis=cap_mis,
        )
        return new_state, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(level))
    out = jnp.where(state["sss_done"][..., None], state["sss_color"], state["acc"])
    if return_stats:
        return linalg.de_nan(out), {"mis_targets_dropped": state["cap_mis"]}
    return linalg.de_nan(out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "sample_size", "dof_sample_size", "level",
        "hittable_pdf_weight", "stack_size", "ray_chunk",
    ),
)
def render_image(
    scene: Scene,
    camera,
    key: jax.Array,
    width: int,
    height: int,
    sample_size: int = 16,
    dof_sample_size: int = 1,
    level: int = 8,
    hittable_pdf_weight: float = 0.0,
    stack_size: int = MATERIAL_STACK_SIZE,
    ray_chunk: int = 65536,
) -> jnp.ndarray:
    """Full-frame render (path_tracing_render, pathtracing.h:252-305).

    The pixel batch is processed in `ray_chunk`-ray wavefronts and samples
    are scanned sequentially, so HBM holds one chunk's (rays x tri-tile)
    working set regardless of resolution or spp.  Returns (H, W, 3) linear
    radiance.

    DoF deviation (deliberate): the reference draws ONE thin-lens sample
    per DoF sample and reuses that camera ray for all `sample_size` inner
    samples (pathtracing.h:277-280); here every one of the
    `sample_size * dof_sample_size` samples draws a fresh lens sample.
    Both estimate the same (lens x path) integral — identical expectation,
    and the decorrelated form has no higher variance at equal total sample
    count (it only removes the within-group lens correlation).  Asserted
    against a reference-structured estimator in
    tests/test_io_camera.py::test_dof_decorrelated_estimator_matches_reference_structure.
    """
    ii, jj = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    pix_i = ii.reshape(-1) + 0.5
    pix_j = jj.reshape(-1) + 0.5

    n_pix = pix_i.shape[0]
    chunk = min(ray_chunk, n_pix)
    pad = (-n_pix) % chunk
    if pad:
        pix_i = jnp.concatenate([pix_i, jnp.zeros((pad,), pix_i.dtype)])
        pix_j = jnp.concatenate([pix_j, jnp.zeros((pad,), pix_j.dtype)])
    n_chunks = (n_pix + pad) // chunk
    pix_i = pix_i.reshape(n_chunks, chunk)
    pix_j = pix_j.reshape(n_chunks, chunk)

    def one_step(carry, sc):
        s, c = sc // n_chunks, sc % n_chunks
        skey = jax.random.fold_in(jax.random.fold_in(key, s), 7 + c)
        pi = pix_i[c]
        pj = pix_j[c]
        u1 = jax.random.uniform(jax.random.fold_in(skey, 0), (chunk,))
        u2 = jax.random.uniform(jax.random.fold_in(skey, 1), (chunk,))
        o, d = camera.generate_rays(pi, pj, u1, u2)
        col = trace_paths(
            scene, o, d, jax.random.fold_in(skey, 2),
            level=level,
            hittable_pdf_weight=hittable_pdf_weight,
            stack_size=stack_size,
        )
        return carry.at[c].add(linalg.de_nan(col)), None

    n_samples = sample_size * dof_sample_size
    total, _ = jax.lax.scan(
        one_step,
        jnp.zeros((n_chunks, chunk, 3)),
        jnp.arange(n_samples * n_chunks),
    )
    img = total.reshape(-1, 3)[:n_pix] / n_samples
    return img.reshape(height, width, 3)
