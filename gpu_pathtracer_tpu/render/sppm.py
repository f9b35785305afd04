"""Stochastic progressive photon mapping (SPPM) with participating media.

TPU-native re-derivation of the reference's SPPM mode (`src/render/ppm/`,
`src/model/bvh/bvh_traversal_photon.h`, `src/model/point/ppm_hit_point.h`,
driver `src/main.cu:1213-1869`):

* eye pass (`ray_tracing_pass.h:491-594`): per pixel, trace through the
  specular/refractive chain to the first diffuse hit (wavefront while_loop,
  hard cap 64 bounces like `:210`), accumulating `filter_2` products and the
  per-segment Beer-Lambert transmittance; at the diffuse hit compute direct
  radiance via light sampling + a forced-refraction shadow chain
  (`_compute_direct_radiance`, `:19-142`); on the init pass shoot 4 corner
  rays and set the initial gather radius to the min pairwise hit distance
  (`:542-583`), then assign the average radius to invalid pixels
  (`:394-450`).
* photon pass (`photon_pass.h:98-237`): emit from emitters ∝ mean-energy CDF,
  bounce with the dielectric stack; in media, sample propagation distances
  and deposit VOLUME photons on scatter events; on surfaces, Russian
  roulette on max(k) and deposit SURFACE photons at diffuse hits after the
  first bounce.  Faithful to the reference's control flow including its
  move-by-new-distance-along-old-direction medium march.
* photon maps: instead of the reference's per-pass photon LBVH rebuild, the
  gathers are batched all-pairs reductions over the (bounded, static-shape)
  photon arrays — radius queries become masked vector ops, the visibility
  re-check (`bvh_traversal_photon.h:140-156`) shoots rays for the K nearest
  candidates per pixel.
* per-pixel SPPM state update (`ppm_hit_point.h:115-171`): flux -> radiance
  `filter * Φ / (N_emitted * π * r²)`, radius schedule
  `r *= ((i+α)/(i+1))^(1/2)` surface and `^(1/3)` volume from iteration 2.

Deviation noted: the reference's volume gather accumulates its per-photon
temporary without reset (`bvh_traversal_photon.h:63-77`), super-linearly
over-counting photons within one traversal; this implementation computes the
mathematically intended sum.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.constants import MATERIAL_STACK_SIZE, SMALL_EPS
from gpu_pathtracer_tpu.ops import bounding_sphere
from gpu_pathtracer_tpu.ops import bvh as bvh_mod
from gpu_pathtracer_tpu.ops import trace
from gpu_pathtracer_tpu.ops import lights as lights_mod
from gpu_pathtracer_tpu.ops import linalg, materials, sampling
from gpu_pathtracer_tpu.models.scene import Scene
from gpu_pathtracer_tpu.pytree import pytree_dataclass
from gpu_pathtracer_tpu.render.integrator import interpolate_hit

# eye-pass straggler compaction kicks in at this batch width (see
# eye_pass docstring); 0 disables
EYE_COMPACT_MIN = int(os.environ.get("GPT_TPU_EYE_COMPACT_MIN", "65536"))


# ---------------------------------------------------------------------------
# media helpers (material.h:199-228, ppm/common.h:8-39)
# ---------------------------------------------------------------------------

def extinction_coef(table, mat_id):
    safe = jnp.maximum(mat_id, 0)
    ext = table.scattering_coef[safe] + table.absorption_coef[safe]
    return jnp.where(mat_id < 0, 0.0, ext)


def transmittance(table, mat_id, dist):
    """Beer-Lambert exp(-t*sigma_t); 1 outside media (material.h:223-228)."""
    ext = extinction_coef(table, mat_id)
    return jnp.where(ext > SMALL_EPS, jnp.exp(-dist * ext), 1.0)


def scattering_prob(table, mat_id):
    safe = jnp.maximum(mat_id, 0)
    ext = extinction_coef(table, mat_id)
    return jnp.where(
        ext > 0, table.scattering_coef[safe] / jnp.maximum(ext, 1e-20), 0.0
    )


def check_entering_medium(table, ref, in_medium, medium_id):
    """ppm/common.h:8-24."""
    entering = (
        ~ref.false_hit
        & (ref.next_mat >= 0)
        & (extinction_coef(table, ref.next_mat) > SMALL_EPS)
    ) | (ref.false_hit & in_medium)
    new_medium = jnp.where(entering, ref.next_mat, medium_id)
    return entering, new_medium


def sample_hg_direction(table, medium_id, current_dir, key):
    """HG scattering direction (material.h:208-221): sample cos(theta) by
    inverse CDF, build the new direction in the ONB of the current one."""
    shape = medium_id.shape
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), shape)
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), shape)
    g = table.g[jnp.maximum(medium_id, 0)]
    cos_t = jnp.clip(sampling.henyey_greenstein_cos_theta(g, u1), -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2
    local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )
    x, y, z = linalg.onb_from_z(current_dir)
    return linalg.to_world(x, y, z, local)


def sample_propagation_distance(table, medium_id, key):
    """-ln(xi)/sigma_t (material.h:203-206)."""
    u = jax.random.uniform(key, medium_id.shape, minval=1e-12, maxval=1.0)
    ext = extinction_coef(table, medium_id)
    return -jnp.log(u) / jnp.maximum(ext, 1e-20)


# ---------------------------------------------------------------------------
# dielectric-stack initialization (material_list_operations.h:60-92)
# ---------------------------------------------------------------------------

def init_material_stack(
    scene: Scene,
    point: jnp.ndarray,  # (R, 3) start points (camera eye / photon origin)
    init_dir: jnp.ndarray,  # (R, 3) probe direction
    key: jax.Array,
    stack_size: int = MATERIAL_STACK_SIZE,
    max_steps: int = 8,
):
    """March from far away (t=999) back toward `point` through the
    transparent-geometry BVH with forced refraction, pushing/popping media so
    a camera inside glass/water starts with the right stack."""
    r = point.shape[0]
    ids, length = materials.stack_init((r,), stack_size)
    tset = scene.transparent
    if tset is None:
        return ids, length

    t_rem0 = jnp.full((r,), 999.0)
    origin0 = point + t_rem0[..., None] * init_dir
    probe_dir = -init_dir

    def body(i, carry):
        ids, length, origin, t_rem, live = carry
        t, slot, bary, hit = trace.closest_hit(tset, origin, probe_dir)
        live = live & hit & (t_rem - t > SMALL_EPS)
        t_rem = jnp.where(live, t_rem - t, t_rem)
        pt, uv, normal, mat_id = interpolate_hit(tset, scene.materials, slot, bary)
        ref = materials.sample_bsdf(
            scene.materials, mat_id, pt, probe_dir, normal, uv,
            ids, length, jax.random.fold_in(key, i), force_refract=True,
        )
        ids, length = materials.stack_rearrange(
            ids, length, mat_id, ref.false_hit, ref.entering, ref.refracted, live
        )
        origin = jnp.where(live[..., None], pt, origin)
        return ids, length, origin, t_rem, live

    ids, length, _, _, _ = jax.lax.fori_loop(
        0, max_steps, body,
        (ids, length, origin0, t_rem0, jnp.ones((r,), bool)),
    )
    return ids, length


# ---------------------------------------------------------------------------
# photon map
# ---------------------------------------------------------------------------

@pytree_dataclass
class Photons:
    pos: jnp.ndarray  # (P, 3)
    color: jnp.ndarray  # (P, 3)
    direction: jnp.ndarray  # (P, 3) travel direction at deposit
    prev: jnp.ndarray  # (P, 3) previous interaction location
    on_surface: jnp.ndarray  # (P,) bool
    valid: jnp.ndarray  # (P,) bool


@functools.partial(
    jax.jit,
    static_argnames=("n_photons", "max_bounce", "stack_size", "differentiable"),
)
def photon_pass(
    scene: Scene,
    key: jax.Array,
    n_photons: int,
    max_bounce: int = 16,
    stack_size: int = MATERIAL_STACK_SIZE,
    differentiable: bool = False,
) -> Photons:
    """Wavefront photon tracing (photon_pass.h:98-237).

    With `differentiable=True` the bounce loop runs as a bounded
    (rematerialized) `lax.scan` instead of a `while_loop`, so the deposited
    photon colors are reverse-differentiable w.r.t. the material table
    (emission flows through the energy normalization via `leaf_energies`;
    discrete decisions — emitter pick, RR, scatter events — are integer/
    comparison outputs, i.e. the standard pathwise gradient with the score
    term omitted).  Identical outputs either way: the while_loop's early
    exit is purely an optimization because every state update is masked."""
    lt = scene.light_tree
    table = scene.materials
    g = scene.geom
    p_shape = (n_photons,)

    # emitter pick ∝ accumulated mean energy (photon_pass.h:60-95), energies
    # read differentiably from the live table (== the baked lt.node_energy
    # leaf values at construction time)
    leaf_energy = lights_mod.leaf_energies(lt, table, g.mat_id)
    mean_energy = linalg.de_nan(jnp.mean(leaf_energy, axis=-1))
    acc = jnp.cumsum(mean_energy)
    max_energy = acc[-1]
    u_pick = jax.random.uniform(jax.random.fold_in(key, 0), p_shape)
    leaf = jnp.clip(
        jnp.searchsorted(acc, u_pick * max_energy), 0, lt.num_lights - 1
    ).astype(jnp.int32)

    # uniform point + interpolated attributes on the emitter
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), p_shape)
    u2 = jax.random.uniform(jax.random.fold_in(key, 2), p_shape)
    s = jnp.sqrt(jnp.maximum(u1, 0.0))
    bu = 1.0 - s
    bv = u2 * s
    bary = jnp.stack([bu, bv, 1.0 - bu - bv], axis=-1)
    point = jnp.sum(bary[..., None] * lt.tri_p[leaf], axis=-2)
    normal = linalg.normalize(
        jnp.sum(bary[..., None] * lt.tri_n[leaf], axis=-2), SMALL_EPS
    )
    uv = jnp.sum(bary[..., None] * lt.tri_uv[leaf], axis=-2)
    mat_id = g.mat_id[lt.geom_slot[leaf]]

    # photon color normalized to constant mean energy (photon_pass.h:134-137).
    # Double-where (not a bare maximum floor): d(x/y)/dy = -x/y^2 and
    # (1e-20)^2 underflows f32 to 0, so a floored denominator becomes an
    # inf in reverse even under a zero cotangent (see the RR
    # renormalization below for the case that actually fired)
    color = table.emission_color(mat_id, uv)
    _mean0 = jnp.mean(color, axis=-1)
    _mean0_safe = jnp.where(_mean0 > 1e-20, _mean0, 1.0)
    color = color * jnp.where(
        _mean0 > 1e-20, max_energy / _mean0_safe, 0.0
    )[..., None]
    mean_color = jnp.mean(color, axis=-1)

    # fake incoming ray (Triangle::get_random_point_on_surface,
    # triangle.h:214-221): hemisphere sample about the normal, negated
    u3 = jax.random.uniform(jax.random.fold_in(key, 3), p_shape)
    u4 = jax.random.uniform(jax.random.fold_in(key, 4), p_shape)
    coming_dir = -sampling.generate_direction(
        normal, normal, jnp.full(p_shape, 2, jnp.int32), jnp.ones(p_shape),
        u3, u4,
    )

    stack_ids, stack_len = init_material_stack(
        scene, point, normal, jax.random.fold_in(key, 5), stack_size
    )

    PH_SURF, PH_MARCH = 0, 1
    state = dict(
        # current surface interaction
        pt=point, nrm=normal, uv=uv, mat=mat_id, coming=coming_dir,
        # current march ray (phase MARCH)
        m_o=point, m_d=coming_dir, m_dsamp=jnp.zeros(p_shape),
        m_t=jnp.zeros(p_shape), m_pt=point,
        color=color,
        prev=point,
        stack_ids=stack_ids, stack_len=stack_len,
        in_medium=jnp.zeros(p_shape, bool),
        medium=jnp.full(p_shape, -1, jnp.int32),
        scattered_ever=jnp.zeros(p_shape, bool),
        dcs=jnp.zeros(p_shape, bool),  # direct_check_surface
        phase=jnp.full(p_shape, PH_SURF, jnp.int32),
        nb=jnp.full(p_shape, -1, jnp.int32),
        alive=jnp.ones(p_shape, bool),
        # deposit slots
        d_pos=jnp.full((n_photons, 3), jnp.inf),
        d_color=jnp.ones((n_photons, 3)),
        d_dir=jnp.zeros((n_photons, 3)),
        d_prev=jnp.zeros((n_photons, 3)),
        d_surf=jnp.zeros(p_shape, bool),
        d_valid=jnp.zeros(p_shape, bool),
        step=jnp.int32(0),
    )

    max_steps = 4 * max_bounce + 32

    def cond(st):
        return jnp.any(st["alive"]) & (st["step"] < max_steps)

    def body(st):
        skey = jax.random.fold_in(key, 100 + st["step"])
        surf = st["alive"] & (st["phase"] == PH_SURF)
        march = st["alive"] & (st["phase"] == PH_MARCH)

        # ---------------- SURF step ----------------
        nb = jnp.where(surf, st["nb"] + 1, st["nb"])
        ref = materials.sample_bsdf(
            table, st["mat"], st["pt"], st["coming"], st["nrm"], st["uv"],
            st["stack_ids"], st["stack_len"], jax.random.fold_in(skey, 0),
        )
        stack_ids, stack_len = materials.stack_rearrange(
            st["stack_ids"], st["stack_len"], st["mat"],
            ref.false_hit, ref.entering, ref.refracted, surf & (nb > 0),
        )
        entering_m, medium = check_entering_medium(
            table, ref, st["in_medium"], st["medium"]
        )
        in_medium = jnp.where(surf, entering_m, st["in_medium"])
        medium = jnp.where(surf, medium, st["medium"])

        want_march = surf & ~ref.false_hit & in_medium & ~st["dcs"]
        d_samp = sample_propagation_distance(
            table, medium, jax.random.fold_in(skey, 1)
        )

        # MARCH-phase proposal ray (state + RNG only, so it can be computed
        # before the traversal; consumed by the MARCH section below)
        u_sc = jax.random.uniform(jax.random.fold_in(skey, 3), p_shape)
        p_s = scattering_prob(table, medium)
        deposit_vol = march & (u_sc < p_s)
        keep_march = march & ~deposit_vol
        hg_dir = sample_hg_direction(
            table, medium, st["m_d"], jax.random.fold_in(skey, 4)
        )
        d_new = sample_propagation_distance(
            table, medium, jax.random.fold_in(skey, 5)
        )
        # move by the NEW distance along the OLD direction, then turn
        # (photon_pass.h:191-194, faithful to the reference's ordering)
        o_new = st["m_o"] + d_new[..., None] * st["m_d"]

        # ONE merged traversal per step: a photon is in exactly one phase
        # (SURF tests its BSDF ray, MARCH its HG ray), so select per photon
        # instead of paying two full closest-hit queries
        q_o = jnp.where(march[..., None], o_new, ref.origin)
        q_d = jnp.where(march[..., None], hg_dir, ref.dir)
        t_q, slot_q, bary_q, hit_q = trace.closest_hit(
            g, q_o, q_d, live=st["alive"] & ~deposit_vol
        )
        pt_q, uv_q, nrm_q, mat_q = interpolate_hit(g, table, slot_q, bary_q)

        t_next, slot_next, hit_next = t_q, slot_q, hit_q  # SURF view
        t_for_march = jnp.where(hit_next, t_next, jnp.inf)
        march_now = want_march & (d_samp - t_for_march < SMALL_EPS)
        dcs = jnp.where(want_march & ~march_now, True, st["dcs"])

        # Russian roulette on surfaces (photon_pass.h:206-227)
        do_rr = surf & ~march_now & ~ref.false_hit & (nb > 0)
        u_rr = jax.random.uniform(jax.random.fold_in(skey, 2), p_shape)
        k_max = jnp.max(ref.k, axis=-1)
        absorbed = do_rr & (u_rr > k_max)
        deposit_surf = (
            absorbed & ref.diffuse & ((nb > 1) | st["scattered_ever"])
        )
        new_color = st["color"] * ref.k
        # double-where renormalization: max(mean, 1e-20) alone is a NaN
        # mine in reverse — d(x/y)/dy = -x/y^2 and (1e-20)^2 UNDERFLOWS to
        # 0 in f32, so dead photons (k = 0 at pure emitters) turned the
        # masked cotangent into 0 * inf = NaN, which rode the shared
        # max_energy normalization into d/d ke of every emitter
        mean_raw = jnp.mean(new_color, axis=-1)
        mean_safe = jnp.where(mean_raw > 1e-20, mean_raw, 1.0)
        scale = jnp.where(mean_raw > 1e-20, mean_color / mean_safe, 0.0)
        new_color = new_color * scale[..., None]
        survive = do_rr & ~absorbed
        color = jnp.where(survive[..., None], new_color, st["color"])
        dcs = jnp.where(survive, False, dcs)

        # advance to the next surface (skipped when entering a march)
        advance = surf & ~march_now & ~absorbed
        pt_n, uv_n, nrm_n, mat_n = pt_q, uv_q, nrm_q, mat_q
        prev = jnp.where(advance[..., None], st["pt"], st["prev"])
        new_pt = jnp.where(advance[..., None], pt_n, st["pt"])
        new_nrm = jnp.where(advance[..., None], nrm_n, st["nrm"])
        new_uv = jnp.where(advance[..., None], uv_n, st["uv"])
        new_mat = jnp.where(advance, mat_n, st["mat"])
        new_coming = jnp.where(advance[..., None], ref.dir, st["coming"])
        alive = st["alive"] & jnp.where(
            advance, hit_next & (nb < max_bounce), ~absorbed
        )

        # enter march: record the march ray + its surface hit
        m_o = jnp.where(march_now[..., None], ref.origin, st["m_o"])
        m_d = jnp.where(march_now[..., None], ref.dir, st["m_d"])
        m_dsamp = jnp.where(march_now, d_samp, st["m_dsamp"])
        m_t = jnp.where(march_now, t_for_march, st["m_t"])
        m_pt = jnp.where(march_now[..., None], pt_n, st["m_pt"])
        phase = jnp.where(march_now, PH_MARCH, st["phase"])
        scattered_ever = st["scattered_ever"] | march_now

        # ---------------- MARCH step (traversal done above, merged) --------
        hit_m = hit_q  # MARCH view of the merged query
        prev = jnp.where(keep_march[..., None], m_pt, prev)
        t_m_eff = jnp.where(hit_m, t_q, jnp.inf)
        still = keep_march & (d_new - t_m_eff < SMALL_EPS)
        exit_march = keep_march & ~still

        m_o = jnp.where(keep_march[..., None], o_new, m_o)
        m_d = jnp.where(keep_march[..., None], hg_dir, m_d)
        m_dsamp = jnp.where(keep_march, d_new, m_dsamp)
        mp_new, muv_new, mnrm_new, mmat_new = pt_q, uv_q, nrm_q, mat_q
        m_pt = jnp.where(keep_march[..., None], mp_new, m_pt)

        # march exit -> the surface hit becomes the next interaction
        new_pt = jnp.where(exit_march[..., None], mp_new, new_pt)
        new_nrm = jnp.where(exit_march[..., None], mnrm_new, new_nrm)
        new_uv = jnp.where(exit_march[..., None], muv_new, new_uv)
        new_mat = jnp.where(exit_march, mmat_new, new_mat)
        new_coming = jnp.where(exit_march[..., None], m_d, new_coming)
        phase = jnp.where(exit_march, PH_SURF, phase)
        dcs = jnp.where(exit_march, True, dcs)
        alive = alive & jnp.where(exit_march, hit_m, True)

        # deposits (once per photon)
        can = ~st["d_valid"]
        dep_s = deposit_surf & can
        dep_v = deposit_vol & can
        vol_pos = m_o + m_dsamp[..., None] * m_d
        d_pos = jnp.where(
            dep_s[..., None], st["pt"],
            jnp.where(dep_v[..., None], vol_pos, st["d_pos"]),
        )
        d_color = jnp.where((dep_s | dep_v)[..., None], color, st["d_color"])
        d_dir = jnp.where(
            dep_s[..., None], st["coming"],
            jnp.where(dep_v[..., None], m_d, st["d_dir"]),
        )
        d_prev = jnp.where((dep_s | dep_v)[..., None], st["prev"], st["d_prev"])
        d_surf = jnp.where(dep_s, True, st["d_surf"])
        d_valid = st["d_valid"] | dep_s | dep_v
        alive = alive & ~deposit_vol  # volume deposit terminates the photon

        return dict(
            pt=new_pt, nrm=new_nrm, uv=new_uv, mat=new_mat, coming=new_coming,
            m_o=m_o, m_d=m_d, m_dsamp=m_dsamp, m_t=m_t, m_pt=m_pt,
            color=color, prev=prev,
            stack_ids=stack_ids, stack_len=stack_len,
            in_medium=in_medium, medium=medium,
            scattered_ever=scattered_ever, dcs=dcs, phase=phase,
            nb=nb, alive=alive,
            d_pos=d_pos, d_color=d_color, d_dir=d_dir, d_prev=d_prev,
            d_surf=d_surf, d_valid=d_valid,
            step=st["step"] + 1,
        )

    if differentiable:
        ckpt_body = jax.checkpoint(body)
        st, _ = jax.lax.scan(
            lambda s, _: (ckpt_body(s), None), state, None, length=max_steps
        )
    else:
        st = jax.lax.while_loop(cond, body, state)
    return Photons(
        pos=st["d_pos"],
        color=st["d_color"],
        direction=st["d_dir"],
        prev=st["d_prev"],
        on_surface=st["d_surf"],
        valid=st["d_valid"],
    )


# ---------------------------------------------------------------------------
# gathers
# ---------------------------------------------------------------------------

def volume_gather_segment(
    table,
    photons: Photons,
    medium_id: jnp.ndarray,  # (R,)
    seg_start: jnp.ndarray,  # (R, 3)
    seg_dir: jnp.ndarray,  # (R, 3) unit
    seg_len: jnp.ndarray,  # (R,)
    vol_radius: jnp.ndarray,  # (R,)
    enable: jnp.ndarray,  # (R,)
) -> jnp.ndarray:
    """Volumetric beam gather along a camera-path segment
    (traverse_bvh_volume_photon + compute_ppm_volume_kernel,
    bvh_traversal_photon.h:15-106, ppm_hit_point.h:47-60): photons inside the
    cylinder contribute kernel * transmittance * sigma_s * phase * color."""
    vphot = photons.valid & ~photons.on_surface  # (P,)
    w = photons.pos[None, :, :] - seg_start[:, None, :]  # (R, P, 3)
    d_par = jnp.sum(w * seg_dir[:, None, :], axis=-1)  # (R, P)
    d_perp = linalg.length(w - d_par[..., None] * seg_dir[:, None, :])
    r = jnp.maximum(vol_radius[:, None], 1e-20)
    inside = (
        vphot[None, :]
        & enable[:, None]
        & (d_par >= 0)
        & (d_par <= seg_len[:, None])
        & (d_perp <= r)
    )
    kernel = (1.0 / (r * r)) * sampling.silverman_biweight(d_perp / r)
    tr = transmittance(table, medium_id[:, None], d_par)
    sigma_s = table.scattering_coef[jnp.maximum(medium_id, 0)]
    phase = sampling.henyey_greenstein_pdf(
        table.g[jnp.maximum(medium_id, 0)][:, None],
        seg_dir[:, None, :],
        photons.direction[None, :, :],
    )
    contrib = (
        (kernel > SMALL_EPS)
        * inside
        * kernel
        * tr
        * sigma_s[:, None]
        * phase
    )[..., None] * photons.color[None, :, :]
    return jnp.sum(linalg.de_nan(contrib), axis=1)


def volume_gather_segments_dense(
    table,
    photons: Photons,
    seg_start: jnp.ndarray,  # (R, S, 3)
    seg_dir: jnp.ndarray,  # (R, S, 3)
    seg_len: jnp.ndarray,  # (R, S)
    seg_medium: jnp.ndarray,  # (R, S)
    seg_filt: jnp.ndarray,  # (R, S, 3) path throughput at the segment
    seg_valid: jnp.ndarray,  # (R, S)
    vol_radius: jnp.ndarray,  # (R,)
) -> jnp.ndarray:
    """Beam gather over RECORDED eye-path medium segments (dense all-pairs
    oracle): sum_s filt_s * volume_gather_segment(segment_s).  Identical to
    the reference's in-walk accumulation (ray_tracing_pass.h:262-286) —
    the per-segment contributions are linear, so gathering after the walk
    from the recorded (origin, dir, len, medium, throughput) tuples gives
    the same sum without an O(R*P) matrix per walk step."""
    s = seg_start.shape[1]
    out = jnp.zeros(seg_start.shape[:1] + (3,))
    for k in range(s):
        lm = volume_gather_segment(
            table, photons, seg_medium[:, k], seg_start[:, k], seg_dir[:, k],
            seg_len[:, k], vol_radius, seg_valid[:, k],
        )
        out = out + seg_filt[:, k] * lm
    return out


def volume_gather_segments_grid(
    table,
    photons: Photons,
    seg_start: jnp.ndarray,  # (R, S, 3)
    seg_dir: jnp.ndarray,  # (R, S, 3)
    seg_len: jnp.ndarray,  # (R, S)
    seg_medium: jnp.ndarray,  # (R, S)
    seg_filt: jnp.ndarray,  # (R, S, 3)
    seg_valid: jnp.ndarray,  # (R, S)
    vol_radius: jnp.ndarray,  # (R,)
    k_per_cell: int = 8,
    chunk: int = 4096,
    static_steps: int | None = None,
) -> jnp.ndarray:
    """Hash-grid beam gather over recorded medium segments (replaces the
    reference's per-pass volume-photon LBVH + cylinder traversal,
    bvh_traversal_photon.h:15-106, with the BASELINE-mandated grid).

    Geometry: grid cell = 1.5 * r_max and sample points spaced r_max apart
    along each segment; a photon within perpendicular distance r <= r_max of
    the axis and parallel offset <= r_max/2 from its CANONICAL sample point
    (i = round(d_par / r_max)) is then within r_max + r_max/2 = cell of that
    sample per axis, so the 27-cell neighborhood cannot miss it.  Each
    in-cylinder photon has exactly one canonical i, so counting it only at
    step i dedups across overlapping neighborhoods.  Cost per pass:
    O(segments * steps * 27 * k_per_cell) instead of O(R * P) per walk step.

    `static_steps`: with a Python int, the step loop has a static trip
    count, which makes the whole gather reverse-differentiable (a dynamic
    `fori_loop` bound lowers to `while_loop`, which has no transpose).
    Segments needing more than `static_steps` sample points lose their tail
    — pick it >= ceil(max segment length / r_max) + 1.
    """
    from gpu_pathtracer_tpu.ops import hashgrid

    vphot = photons.valid & ~photons.on_surface
    r_max = jnp.max(jnp.where(seg_valid.any(axis=1), vol_radius, 0.0))
    spacing = jnp.maximum(r_max, 1e-12)
    cell = 1.5 * spacing
    grid = hashgrid.build_grid(
        jax.lax.stop_gradient(photons.pos), vphot,
        jax.lax.stop_gradient(cell),
    )

    r_total, s = seg_start.shape[:2]
    q_total = r_total * s

    def flat(x):
        return x.reshape((q_total,) + x.shape[2:])

    f_start = flat(seg_start)
    f_dir = flat(seg_dir)
    f_len = flat(seg_len)
    f_med = flat(seg_medium)
    f_valid = flat(seg_valid)
    f_radius = jnp.repeat(vol_radius, s)

    # step bound: segments longer than max_steps * r_max lose their tail
    # (the reference has its own caps: 400-entry collection lists, 64
    # bounces); scene-scale segments at sane radii stay far below this
    if static_steps is None:
        max_steps = 512
        n_steps = jnp.minimum(
            jnp.int32(max_steps),
            jnp.max(
                jnp.where(f_valid, jnp.ceil(f_len / spacing), 0.0)
            ).astype(jnp.int32)
            + 1,
        )
    else:
        n_steps = static_steps  # Python int -> fori_loop unrolls to scan

    # pack VALID slots first (one stable bool argsort): chunks past the
    # valid prefix skip every gather/step via lax.cond, so the per-pass
    # cost scales with segments actually recorded — a media-free render
    # pays ~nothing, and fog pays for its ~2 segments/ray, not the padded
    # (R, max_segments) slot matrix (measured 21 s of dead gathers at
    # 512^2 x 50k photons before this)
    order = jax.lax.stop_gradient(jnp.argsort(~f_valid))
    f_start = f_start[order]
    f_dir = f_dir[order]
    f_len = f_len[order]
    f_med = f_med[order]
    f_valid_s = f_valid[order]
    f_radius = f_radius[order]

    pad = (-q_total) % chunk
    def padded(x, fill=0.0):
        if not pad:
            return x
        filler = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, filler])

    start_c = padded(f_start).reshape(-1, chunk, 3)
    dir_c = padded(f_dir).reshape(-1, chunk, 3)
    len_c = padded(f_len).reshape(-1, chunk)
    med_c = padded(f_med.astype(jnp.int32), -1).reshape(-1, chunk)
    valid_c = padded(f_valid_s, False).reshape(-1, chunk)
    rad_c = padded(f_radius).reshape(-1, chunk)

    def one_chunk_work(args):
        st, dr, ln, med, val, rad = args
        sigma_s = table.scattering_coef[jnp.maximum(med, 0)]
        g_hg = table.g[jnp.maximum(med, 0)]
        rr = jnp.maximum(rad, 1e-20)

        def step(i, acc):
            p_i = st + (i.astype(jnp.float32) * spacing) * dr
            cand, ok = hashgrid.query_candidates(grid, p_i, k_per_cell)
            cpos = photons.pos[cand]  # (C, 27K, 3)
            w = cpos - st[:, None, :]
            d_par = jnp.sum(w * dr[:, None, :], axis=-1)  # (C, 27K)
            d_perp = linalg.length(w - d_par[..., None] * dr[:, None, :])
            canonical = jnp.round(d_par / spacing).astype(jnp.int32) == i
            inside = (
                ok
                & val[:, None]
                & (i <= jnp.ceil(ln / spacing))[:, None]
                & canonical
                & (d_par >= 0)
                & (d_par <= ln[:, None])
                & (d_perp <= rr[:, None])
            )
            kernel = (1.0 / (rr * rr))[:, None] * sampling.silverman_biweight(
                d_perp / rr[:, None]
            )
            tr = transmittance(table, med[:, None], d_par)
            phase = sampling.henyey_greenstein_pdf(
                g_hg[:, None], dr[:, None, :], photons.direction[cand]
            )
            contrib = (
                (kernel > SMALL_EPS) * inside * kernel * tr
                * sigma_s[:, None] * phase
            )[..., None] * photons.color[cand]
            return acc + jnp.sum(linalg.de_nan(contrib), axis=1)

        return jax.lax.fori_loop(
            0, n_steps, step, jnp.zeros((st.shape[0], 3))
        )

    def one_chunk(args):
        val = args[4]
        return jax.lax.cond(
            jnp.any(val),
            one_chunk_work,
            lambda a: jnp.zeros((a[0].shape[0], 3)),
            args,
        )

    lm = jax.lax.map(
        one_chunk, (start_c, dir_c, len_c, med_c, valid_c, rad_c)
    )
    # unsort back to (ray, segment) slot order
    lm = jnp.zeros((q_total, 3)).at[order].set(
        lm.reshape(-1, 3)[:q_total], unique_indices=True
    )
    lm = lm.reshape(r_total, s, 3)
    return jnp.sum(seg_filt * lm, axis=1)


def surface_gather_grid(
    scene: Scene,
    photons: Photons,
    hp_loc: jnp.ndarray,  # (R, 3)
    hp_normal: jnp.ndarray,  # (R, 3)
    hp_radius: jnp.ndarray,  # (R,)
    hp_valid: jnp.ndarray,  # (R,)
    k_nearest: int = 16,
    k_per_cell: int = 8,
    chunk: int = 16384,
    return_overflow: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """Hash-grid surface photon gather (BASELINE.json: hash-grid radiance
    estimation replaces the reference's per-pass photon-BVH rebuild +
    traversal, bvh_building_photon.h / bvh_traversal_photon.h:108-205).

    One `lax.sort` builds the grid per pass; each hit point inspects only
    the 27 cells around it (cell size = the current max gather radius), so
    per-pass cost is O(pixels * 27 * k_per_cell) instead of the dense
    O(pixels * photons).  Candidates are distance-filtered, reduced to the
    `k_nearest` nearest, and visibility-checked exactly like the dense path.

    `return_overflow=True` adds a scalar int32: total candidates dropped by
    the `k_per_cell` cell cap plus in-radius photons dropped by the
    `k_nearest` reduction, across all pixels ("no silent caps"; the
    reference's gather is unbounded, bvh_traversal_photon.h:108-205, so a
    large count here means this pass under-gathers flux — raise the caps).
    """
    from gpu_pathtracer_tpu.ops import hashgrid

    g = scene.geom
    sphot = photons.valid & photons.on_surface  # (P,)
    # cell size = max radius over valid pixels (radii only shrink with passes)
    r_max = jnp.max(jnp.where(hp_valid, hp_radius, 0.0))
    grid = hashgrid.build_grid(
        jax.lax.stop_gradient(photons.pos), sphot,
        jax.lax.stop_gradient(r_max),
    )
    # bucket-ordered payload copies: ONE (P,) row gather each per pass, so
    # per-chunk candidate payloads come from contiguous K-slice gathers
    # (gather_cell_slices) instead of 27*K independent row gathers — the
    # row-gather form measured ~17% of the whole SPPM iteration on TPU
    si = grid.sorted_idx
    pos_s = photons.pos[si]
    prev_s = photons.prev[si]
    dir_s = photons.direction[si]
    color_s = photons.color[si]

    r_total = hp_loc.shape[0]
    pad = (-r_total) % chunk
    def padded(x, fill=0.0):
        if not pad:
            return x
        filler = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, filler])

    loc_c = padded(hp_loc).reshape(-1, chunk, 3)
    nrm_c = padded(hp_normal).reshape(-1, chunk, 3)
    rad_c = padded(hp_radius).reshape(-1, chunk)
    val_c = padded(hp_valid, False).reshape(-1, chunk)

    def one_chunk(args):
        loc, nrm, rad, val = args
        starts, ok3, cell_drop = hashgrid.query_cell_ranges(
            grid, loc, k_per_cell, with_stats=True
        )  # (C, 27), (C, 27, K)
        cell_drop = jnp.where(val, cell_drop, 0)
        ok = ok3.reshape(ok3.shape[0], -1)  # (C, 27K) — query_candidates order
        cpos = hashgrid.gather_cell_slices(
            jax.lax.stop_gradient(pos_s), starts, k_per_cell
        )  # (C, 27K, 3)
        d2 = jnp.sum((cpos - loc[:, None, :]) ** 2, axis=-1)
        in_r = ok & val[:, None] & bounding_sphere.is_inside_sq(
            loc[:, None, :], rad[:, None], cpos, d2=d2
        )
        # candidate choice is topology, not value: stop_gradient keeps the
        # backward pass free of a pointless top_k transpose (no output
        # depends on the distances themselves)
        key_val = jax.lax.stop_gradient(jnp.where(in_r, -d2, -jnp.inf))
        k = min(k_nearest, key_val.shape[-1])
        top_val, top_pos = jax.lax.top_k(key_val, k)  # (C, K)
        slot_mat = (
            starts[:, :, None]
            + jnp.arange(k_per_cell, dtype=jnp.int32)[None, None, :]
        ).reshape(starts.shape[0], -1)  # (C, 27K) bucket-order slots
        top_idx = jnp.take_along_axis(slot_mat, top_pos, axis=-1)
        cand_ok = jnp.isfinite(top_val)

        prev = prev_s[top_idx]  # (C, K, 3)
        ray_vec = prev - loc[:, None, :]
        ray_len = linalg.length(ray_vec)
        ray_dir = linalg.normalize(ray_vec, SMALL_EPS)
        c, kk = ray_dir.shape[:2]
        # any-hit window query: visible ⇔ some hit exists AND none before
        # the photon's prev location — `geom_hit && rec.t > len`
        # (bvh_traversal_photon.h:151) without paying closest-hit refinement
        occ_near, occ_far = trace.occluded_window(
            g,
            jnp.broadcast_to(loc[:, None, :], (c, kk, 3)).reshape(-1, 3),
            ray_dir.reshape(-1, 3),
            (ray_len * (1.0 - 1e-3)).reshape(-1),
            live=cand_ok.reshape(-1),  # skip slots with no in-radius photon
        )
        visible = cand_ok & (occ_far & ~occ_near).reshape(c, kk)

        pdir = dir_s[top_idx]
        fac = jnp.maximum(0.0, jnp.sum(nrm[:, None, :] * (-pdir), axis=-1))
        flux = jnp.sum(
            (visible * fac)[..., None] * color_s[top_idx], axis=1
        )
        knn_drop = jnp.maximum(jnp.sum(in_r, axis=-1) - k, 0)
        return flux, jnp.sum(visible, axis=-1), jnp.sum(cell_drop + knn_drop)

    flux, count, overflow = jax.lax.map(
        one_chunk, (loc_c, nrm_c, rad_c, val_c)
    )
    flux = flux.reshape(-1, 3)[:r_total]
    count = count.reshape(-1)[:r_total]
    if return_overflow:
        return flux, count, jnp.sum(overflow)
    return flux, count


def surface_gather(
    scene: Scene,
    photons: Photons,
    hp_loc: jnp.ndarray,  # (R, 3)
    hp_normal: jnp.ndarray,  # (R, 3)
    hp_radius: jnp.ndarray,  # (R,)
    hp_valid: jnp.ndarray,  # (R,)
    k_nearest: int = 16,
    return_overflow: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """Surface photon gather with per-photon visibility re-check
    (_traverse_bvh_surface_photon, bvh_traversal_photon.h:108-205).

    `return_overflow=True` adds a scalar int32: total in-radius photons
    beyond the `k_nearest` cap across all pixels ("no silent caps" — the
    reference visits EVERY in-radius photon; a large count means early
    passes are dropping flux and k_nearest should be raised).

    For each hit point, the K nearest in-radius photons are visibility-tested
    with a ray toward each photon's previous location; the photon counts iff
    the closest geometry hit lies at-or-beyond that location (`:151` uses a
    strict `rec.t > len` compare, which is a razor-edge float comparison on
    the unoccluded case t == len — this implementation adds a relative
    tolerance so the verdict is fp-order-stable; the reference's own
    commented-out variant at `:148-150` shows the same intent).  K bounds the
    per-pixel work to keep the op static-shape; in-radius photons beyond the
    K nearest are dropped (the reference is unbounded here).
    """
    g = scene.geom
    sphot = photons.valid & photons.on_surface  # (P,)
    d2 = jnp.sum(
        (photons.pos[None, :, :] - hp_loc[:, None, :]) ** 2, axis=-1
    )  # (R, P)
    in_r = sphot[None, :] & hp_valid[:, None] & bounding_sphere.is_inside_sq(
        hp_loc[:, None, :], hp_radius[:, None], photons.pos[None, :, :], d2=d2
    )
    key_val = jax.lax.stop_gradient(jnp.where(in_r, -d2, -jnp.inf))
    k = min(k_nearest, photons.pos.shape[0])
    top_val, top_idx = jax.lax.top_k(key_val, k)  # (R, K)
    cand_ok = jnp.isfinite(top_val)

    # visibility rays toward each candidate's prev location
    prev = photons.prev[top_idx]  # (R, K, 3)
    ray_vec = prev - hp_loc[:, None, :]
    ray_len = linalg.length(ray_vec)
    ray_dir = linalg.normalize(ray_vec, SMALL_EPS)
    r, kk = ray_dir.shape[:2]
    # any-hit window query: visible ⇔ some hit exists AND none before the
    # photon's prev location — `geom_hit && rec.t > len`
    # (bvh_traversal_photon.h:151) without paying closest-hit refinement
    occ_near, occ_far = trace.occluded_window(
        g,
        jnp.broadcast_to(hp_loc[:, None, :], (r, kk, 3)).reshape(-1, 3),
        ray_dir.reshape(-1, 3),
        (ray_len * (1.0 - 1e-3)).reshape(-1),
        live=cand_ok.reshape(-1),  # skip slots with no in-radius photon
    )
    visible = cand_ok & (occ_far & ~occ_near).reshape(r, kk)

    pdir = photons.direction[top_idx]  # (R, K, 3)
    fac = jnp.maximum(
        0.0, jnp.sum(hp_normal[:, None, :] * (-pdir), axis=-1)
    )
    flux = jnp.sum(
        (visible * fac)[..., None] * photons.color[top_idx], axis=1
    )
    count = jnp.sum(visible, axis=-1)
    if return_overflow:
        overflow = jnp.sum(jnp.maximum(jnp.sum(in_r, axis=-1) - k, 0))
        return flux, count, overflow.astype(jnp.int32)
    return flux, count


# ---------------------------------------------------------------------------
# eye pass
# ---------------------------------------------------------------------------

@pytree_dataclass
class HitPoints:
    """Per-pixel SPPM state (PPMHitPoint, ppm_hit_point.h:9-45)."""

    loc: jnp.ndarray  # (R, 3) inf = invalid
    normal: jnp.ndarray  # (R, 3)
    filter: jnp.ndarray  # (R, 3)
    direct: jnp.ndarray  # (R, 3) accumulated direct radiance
    indirect: jnp.ndarray  # (R, 3) accumulated photon radiance
    tmp_lm: jnp.ndarray  # (R, 3) this pass's volume gather
    surface_radius: jnp.ndarray  # (R,)
    volume_radius: jnp.ndarray  # (R,)
    valid: jnp.ndarray  # (R,) diffuse hit found


def _direct_radiance_chain(
    scene: Scene,
    diff_pt, diff_nrm, diff_uv, diff_mat, diff_coming,
    filter_base,  # (R, 3) filter_lag at the diffuse hit
    stack_ids, stack_len,
    in_medium, medium,
    enable,  # (R,)
    key,
    max_steps: int = 8,
):
    """_compute_direct_radiance (ray_tracing_pass.h:19-142): light-sample the
    diffuse ref (hittable weight 1), then follow a forced-refraction chain
    through transparent geometry accumulating transmittance, adding emission
    at diffuse hits; clamp to <= 1 per channel."""
    table = scene.materials
    g = scene.geom
    r = diff_mat.shape[0]

    emittance = filter_base * table.emission_color(diff_mat, diff_uv)

    # re-sample the diffuse bounce like check_next_path did, then redirect
    ref = materials.sample_bsdf(
        table, diff_mat, diff_pt, diff_coming, diff_nrm, diff_uv,
        stack_ids, stack_len, jax.random.fold_in(key, 0),
    )
    lt = scene.light_tree
    pivot = jnp.where(ref.diffuse[..., None], diff_nrm, ref.perfect_dir)
    if lt.dense:
        node_pdf = lights_mod.leaf_node_pdfs(lt, diff_pt, pivot)
        leaf = lights_mod.pick_light_dense(
            lt, node_pdf, jax.random.fold_in(key, 1)
        )
    else:
        leaf = lights_mod.pick_light(lt, diff_pt, pivot, jax.random.fold_in(key, 1))
    u1 = jax.random.uniform(jax.random.fold_in(key, 2), (r,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 3), (r,))
    target = lights_mod.sample_point_on_light(lt, leaf, u1, u2)
    new_dir = linalg.normalize(target - diff_pt, SMALL_EPS)
    refilter = ref.reflected | ref.refracted
    filt_redir = sampling.phong_filter(ref.k, ref.n, pivot, new_dir)
    ref_filter = jnp.where(refilter[..., None], filt_redir, ref.filter)

    if lt.dense:
        hittable = lights_mod.hittable_pdf_sum(
            lt, diff_pt, new_dir, pivot, node_pdf=node_pdf
        )
    else:
        hittable = lights_mod.hittable_pdf_sum_sparse(lt, diff_pt, new_dir, pivot)
    scat = sampling.scattering_pdf(
        diff_nrm, new_dir, ref.diffuse, diff_coming, ref.refracted
    )
    factor = scat / jnp.pi / jnp.where(hittable != 0, hittable, 1.0)
    factor = jnp.where(hittable != 0, factor, 0.0)

    state = dict(
        o=diff_pt, d=new_dir,
        filt=filter_base * ref_filter,
        stack_ids=stack_ids, stack_len=stack_len,
        prev_in_medium=in_medium, prev_medium=medium,
        in_medium=in_medium, medium=medium,
        prev_pt=diff_pt,
        direct=jnp.zeros((r, 3)),
        live=enable,
    )

    def body(i, st):
        t, slot, bary, hit = trace.closest_hit(
            g, st["o"], st["d"], live=st["live"]
        )
        live = st["live"] & hit
        pt, uv, nrm, mat = interpolate_hit(g, table, slot, bary)
        ref2 = materials.sample_bsdf(
            table, mat, pt, st["d"], nrm, uv,
            st["stack_ids"], st["stack_len"],
            jax.random.fold_in(key, 10 + i), force_refract=True,
        )
        stack_ids2, stack_len2 = materials.stack_rearrange(
            st["stack_ids"], st["stack_len"], mat,
            ref2.false_hit, ref2.entering, ref2.refracted, live,
        )
        in_m, med = check_entering_medium(
            table, ref2, st["in_medium"], st["medium"]
        )
        in_m = jnp.where(live, in_m, st["in_medium"])
        med = jnp.where(live, med, st["medium"])

        seg_l = linalg.length(pt - st["prev_pt"])
        tr = transmittance(table, st["prev_medium"], seg_l)
        apply_tr = live & ~ref2.false_hit & st["prev_in_medium"]
        filt = st["filt"] * jnp.where(apply_tr[..., None], tr[..., None], 1.0)
        filt = jnp.where(live[..., None], filt * ref2.filter_2, filt)

        add = live & ~ref2.false_hit & ref2.diffuse
        emit = table.emission_color(mat, uv)
        direct = st["direct"] + jnp.where(
            add[..., None],
            filt * jnp.clip(factor, 0.0, 0.999999)[..., None] * emit,
            0.0,
        )

        stop = live & (~ref2.refracted | ref2.bent)
        upd = live & ~ref2.false_hit
        return dict(
            o=jnp.where(live[..., None], pt, st["o"]),
            d=jnp.where(live[..., None], ref2.dir, st["d"]),
            filt=filt,
            stack_ids=stack_ids2, stack_len=stack_len2,
            prev_in_medium=jnp.where(upd, in_m, st["prev_in_medium"]),
            prev_medium=jnp.where(upd, med, st["prev_medium"]),
            in_medium=in_m, medium=med,
            prev_pt=jnp.where(upd[..., None], pt, st["prev_pt"]),
            direct=direct,
            live=live & ~stop,
        )

    st = jax.lax.fori_loop(0, max_steps, body, state)
    out = st["direct"] + jnp.where(enable[..., None], emittance, 0.0)
    return jnp.minimum(out, 1.0)


def eye_pass(
    scene: Scene,
    camera,
    key: jax.Array,
    pix_i: jnp.ndarray,  # (R,) pixel row + offset
    pix_j: jnp.ndarray,  # (R,) pixel col + offset
    volume_photons: Photons | None,
    volume_radius: jnp.ndarray,  # (R,)
    init: bool,
    max_bounce: int = 64,
    stack_size: int = MATERIAL_STACK_SIZE,
    differentiable: bool = False,
    max_segments: int = 8,
    volume_grid: bool = False,
    vol_steps: int | None = None,
    vol_k_per_cell: int = 8,
    return_stats: bool = False,
    compact_min: int | None = None,
):
    """One eye trace per pixel to the first diffuse hit
    (_get_hit_point_details, ray_tracing_pass.h:171-392).

    Returns (loc, normal, filter, direct_radiance, tmp_lm, valid); with
    `return_stats=True` a 7th element: a dict of capacity-overflow counters
    ("no silent caps") — `segments_dropped` (medium segments lost to the
    `max_segments` cap) and `beam_steps_dropped` (grid-gather sample points
    lost to the step bound; 0 on the dense gather, which has no step loop).

    Volume gather: instead of the reference's in-walk cylinder traversal
    per medium segment (ray_tracing_pass.h:262-286) — which on TPU would
    materialize an O(R x P) pair matrix on EVERY walk step — the walk
    RECORDS up to `max_segments` (origin, dir, len, medium, throughput)
    tuples per ray, and one gather over the recorded segments runs after
    the loop (`volume_gather_segments_dense`, or the hash-grid form with
    `volume_grid=True`).  Contributions are linear in the per-segment
    radiance, so the sum is identical; rays with more than `max_segments`
    medium segments drop the excess (the reference caps its own collection
    lists at 400).

    `differentiable=True` runs the bounce loop as a bounded rematerialized
    scan (same outputs — every update is masked) so the recorded filter /
    direct radiance / volume gather are reverse-differentiable w.r.t. the
    material table.

    Straggler compaction (while path, batches >= `compact_min` rays,
    default GPT_TPU_EYE_COMPACT_MIN=65536): most rays reach a diffuse hit
    in a few bounces, but a handful of TIR/glass chains can stay live to
    the 64-bounce cap, and every `while_loop` step costs the FULL batch
    width.  Once the live count fits in a `r // 8` sub-batch, the
    survivors are compacted (top_k on the live mask), iterated at 1/8th
    width, and scattered back.  Same estimator, different RNG stream for
    post-compaction bounces (`jax.random.uniform(key, shape)` is
    position-indexed) — the same class of deviation as the per-shard key
    folds in the distributed renders.  Below `compact_min` (all CPU tests,
    golden fixtures) the single full-width loop runs, byte-identical to
    r03 behavior.
    """
    table = scene.materials
    g = scene.geom
    r = pix_i.shape[0]
    record_segments = (volume_photons is not None) and (not init)

    o, d = camera.generate_rays(
        pix_i, pix_j,
        jax.random.uniform(jax.random.fold_in(key, 0), (r,)),
        jax.random.uniform(jax.random.fold_in(key, 1), (r,)),
    )
    stack_ids, stack_len = init_material_stack(
        scene, o, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (r, 3)),
        jax.random.fold_in(key, 2), stack_size,
    )
    # _set_init_ref + medium check at the camera (ray_tracing_pass.h:226-236)
    hp0, _ = materials.find_highest_prioritised(table, stack_ids, stack_len)
    in_medium0 = extinction_coef(table, hp0) > SMALL_EPS
    medium0 = jnp.where(in_medium0, hp0, -1)

    state = dict(
        o=o, d=d,
        filt=jnp.ones((r, 3)), filt_lag=jnp.ones((r, 3)),
        stack_ids=stack_ids, stack_len=stack_len,
        in_medium=in_medium0, medium=medium0,
        prev_in_medium=in_medium0, prev_medium=medium0,
        prev_pt=o,
        sg_start=jnp.zeros((r, max_segments, 3)),
        sg_dir=jnp.zeros((r, max_segments, 3)),
        sg_len=jnp.zeros((r, max_segments)),
        sg_med=jnp.full((r, max_segments), -1, jnp.int32),
        sg_filt=jnp.zeros((r, max_segments, 3)),
        sg_cnt=jnp.zeros((r,), jnp.int32),
        sg_lost=jnp.zeros((r,), jnp.int32),
        live=jnp.ones((r,), bool),
        found=jnp.zeros((r,), bool),
        # recorded diffuse-hit info
        h_pt=jnp.full((r, 3), jnp.inf), h_nrm=jnp.zeros((r, 3)),
        h_uv=jnp.zeros((r, 2)), h_mat=jnp.zeros((r,), jnp.int32),
        h_coming=d, h_filt_lag=jnp.ones((r, 3)),
        h_stack_ids=stack_ids, h_stack_len=stack_len,
        h_in_medium=in_medium0, h_medium=medium0,
        step=jnp.int32(0),
    )

    def cond(st):
        return jnp.any(st["live"]) & (st["step"] < max_bounce)

    def body(st):
        bkey = jax.random.fold_in(key, 50 + st["step"])
        t, slot, bary, hit = trace.closest_hit(
            g, st["o"], st["d"], live=st["live"]
        )
        live = st["live"] & hit
        pt, uv, nrm, mat = interpolate_hit(g, table, slot, bary)
        ref = materials.sample_bsdf(
            table, mat, pt, st["d"], nrm, uv,
            st["stack_ids"], st["stack_len"], jax.random.fold_in(bkey, 0),
        )
        stack_ids2, stack_len2 = materials.stack_rearrange(
            st["stack_ids"], st["stack_len"], mat,
            ref.false_hit, ref.entering, ref.refracted, live,
        )
        in_m, med = check_entering_medium(
            table, ref, st["in_medium"], st["medium"]
        )
        in_m = jnp.where(live, in_m, st["in_medium"])
        med = jnp.where(live, med, st["medium"])

        # record the medium segment (gathered after the loop) + apply the
        # segment transmittance
        seg_vec = pt - st["prev_pt"]
        seg_l = linalg.length(seg_vec)
        seg_dir = linalg.normalize(seg_vec, SMALL_EPS)
        seg_on = live & ~ref.false_hit & st["prev_in_medium"]
        sg = {k: st[k] for k in
              ("sg_start", "sg_dir", "sg_len", "sg_med", "sg_filt", "sg_cnt",
               "sg_lost")}
        if record_segments:
            can = seg_on & (st["sg_cnt"] < max_segments)
            slot = (
                jnp.arange(max_segments, dtype=jnp.int32)[None, :]
                == st["sg_cnt"][:, None]
            ) & can[:, None]
            sg = dict(
                sg_start=jnp.where(
                    slot[..., None], st["prev_pt"][:, None, :], st["sg_start"]
                ),
                sg_dir=jnp.where(
                    slot[..., None], seg_dir[:, None, :], st["sg_dir"]
                ),
                sg_len=jnp.where(slot, seg_l[:, None], st["sg_len"]),
                sg_med=jnp.where(
                    slot, st["prev_medium"][:, None], st["sg_med"]
                ),
                sg_filt=jnp.where(
                    slot[..., None], st["filt"][:, None, :], st["sg_filt"]
                ),
                sg_cnt=st["sg_cnt"] + can.astype(jnp.int32),
                sg_lost=st["sg_lost"] + (seg_on & ~can).astype(jnp.int32),
            )
        tr = transmittance(table, st["prev_medium"], seg_l)
        filt = st["filt"] * jnp.where(
            (seg_on & jnp.bool_(not init))[..., None], tr[..., None], 1.0
        )

        nf = live & ~ref.false_hit
        filt_lag = jnp.where(nf[..., None], filt, st["filt_lag"])
        filt = jnp.where(nf[..., None], filt * ref.filter_2, filt)

        # first diffuse hit -> record and stop (ray_tracing_pass.h:299-379)
        found_now = live & ref.diffuse & ~st["found"]
        h = lambda new, old: jnp.where(found_now[..., None], new, old) \
            if new.ndim == 2 else jnp.where(found_now, new, old)

        upd = live & ~ref.false_hit
        return dict(
            o=jnp.where(live[..., None], pt, st["o"]),
            d=jnp.where(live[..., None], ref.dir, st["d"]),
            filt=filt, filt_lag=filt_lag,
            stack_ids=stack_ids2, stack_len=stack_len2,
            in_medium=in_m, medium=med,
            prev_in_medium=jnp.where(upd, in_m, st["prev_in_medium"]),
            prev_medium=jnp.where(upd, med, st["prev_medium"]),
            prev_pt=jnp.where(upd[..., None], pt, st["prev_pt"]),
            **sg,
            live=live & ~found_now,
            found=st["found"] | found_now,
            h_pt=h(pt, st["h_pt"]), h_nrm=h(nrm, st["h_nrm"]),
            h_uv=h(uv, st["h_uv"]), h_mat=h(mat, st["h_mat"]),
            h_coming=h(st["d"], st["h_coming"]),
            h_filt_lag=h(filt_lag, st["h_filt_lag"]),
            h_stack_ids=jnp.where(
                found_now[..., None], stack_ids2, st["h_stack_ids"]
            ),
            h_stack_len=h(stack_len2, st["h_stack_len"]),
            h_in_medium=h(in_m, st["h_in_medium"]),
            h_medium=h(med, st["h_medium"]),
            step=st["step"] + 1,
        )

    if differentiable:
        ckpt_body = jax.checkpoint(body)
        st, _ = jax.lax.scan(
            lambda s, _: (ckpt_body(s), None), state, None, length=max_bounce
        )
    else:
        cmin = EYE_COMPACT_MIN if compact_min is None else compact_min
        if cmin and r >= cmin:
            # multi-stage: each stage runs while the live count exceeds the
            # NEXT stage's width, then top_k-compacts the survivors and
            # recurses at 1/8 width (floor 1024).  The long TIR/glass tail
            # (a handful of rays alive to the 64-bounce cap) thus iterates
            # at ~1k width instead of r//8 — each while step costs the full
            # batch width, so the tail was most of the eye pass's steps.
            widths = []
            wcur = r
            while max(1024, wcur // 8) < wcur:
                wcur = max(1024, wcur // 8)
                widths.append(wcur)
                if wcur == 1024:
                    break

            def staged(st, width_list):
                if not width_list:
                    return jax.lax.while_loop(cond, body, st)
                cw = width_list[0]

                def cond_stage(s):
                    return cond(s) & (jnp.sum(s["live"]) > cw)

                st = jax.lax.while_loop(cond_stage, body, st)
                # all live rays fit: cond_stage guarantees live <= cw here
                _, idx = jax.lax.top_k(st["live"].astype(jnp.int32), cw)
                sub = {
                    k: (v if jnp.ndim(v) == 0 else v[idx])
                    for k, v in st.items()
                }
                sub = staged(sub, width_list[1:])
                return {
                    k: (
                        sub[k] if jnp.ndim(v) == 0
                        else v.at[idx].set(sub[k], unique_indices=True)
                    )
                    for k, v in st.items()
                }

            st = staged(state, widths)
        else:
            st = jax.lax.while_loop(cond, body, state)

    # gather the recorded medium segments (see docstring)
    tmp_lm = jnp.zeros((r, 3))
    seg_valid = None
    if record_segments:
        seg_valid = (
            jnp.arange(max_segments, dtype=jnp.int32)[None, :]
            < st["sg_cnt"][:, None]
        )
        if volume_grid:
            gather_fn = functools.partial(
                volume_gather_segments_grid, static_steps=vol_steps,
                k_per_cell=vol_k_per_cell,
            )
        else:
            gather_fn = volume_gather_segments_dense
        tmp_lm = gather_fn(
            table, volume_photons, st["sg_start"], st["sg_dir"],
            st["sg_len"], st["sg_med"], st["sg_filt"], seg_valid,
            volume_radius,
        )

    # the recorded hit-point filter includes the diffuse filter_2 (= kd):
    # ray_tracing_pass.h:292-297 then :585-587 stores `filter`
    kd_at_hit = table.diffuse_color(st["h_mat"], st["h_uv"])
    h_filter = st["h_filt_lag"] * kd_at_hit

    direct = jnp.zeros((r, 3))
    if scene.light_tree is not None:
        direct = _direct_radiance_chain(
            scene,
            st["h_pt"], st["h_nrm"], st["h_uv"], st["h_mat"], st["h_coming"],
            st["h_filt_lag"],
            st["h_stack_ids"], st["h_stack_len"],
            st["h_in_medium"], st["h_medium"],
            st["found"], jax.random.fold_in(key, 90),
        )
        direct = jnp.where(st["found"][..., None], direct, 0.0)

    loc = jnp.where(st["found"][..., None], st["h_pt"], jnp.inf)
    outs = (loc, st["h_nrm"], h_filter, direct, tmp_lm, st["found"])
    if not return_stats:
        return outs
    steps_dropped = jnp.zeros((), jnp.int32)
    if record_segments and volume_grid:
        # same spacing formula as volume_gather_segments_grid; count the
        # sample points beyond the step bound (lost beam-gather tail)
        bound = vol_steps if vol_steps is not None else 512
        r_used = jnp.max(jnp.where(seg_valid.any(axis=1), volume_radius, 0.0))
        spacing = jnp.maximum(r_used, 1e-12)
        needed = jnp.ceil(st["sg_len"] / spacing) + 1
        steps_dropped = jnp.sum(
            jnp.where(seg_valid, jnp.maximum(needed - bound, 0.0), 0.0)
        ).astype(jnp.int32)
    stats = {
        "segments_dropped": jnp.sum(st["sg_lost"]),
        "beam_steps_dropped": steps_dropped,
    }
    return outs + (stats,)


# ---------------------------------------------------------------------------
# initial-radius helper (ray_tracing_pass.h:394-450, :542-583)
# ---------------------------------------------------------------------------

def initial_radius(
    eye_fn,
    scene: Scene,
    camera,
    key_init: jax.Array,
    pix_i: jnp.ndarray,
    pix_j: jnp.ndarray,
    loc: jnp.ndarray,  # (R, 3) main init-pass hit locations
    valid: jnp.ndarray,  # (R,)
    radius_scale,
):
    """Initial SPPM gather radius: 4 corner rays per pixel, radius = min
    pairwise distance among the 5 hit points * scaling factor; invalid
    pixels get the average valid radius."""
    r = pix_i.shape[0]
    vol_r = jnp.full((r,), jnp.inf)
    corner_locs = []
    offsets = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)]
    for c, (oi, oj) in enumerate(offsets):
        outs = eye_fn(
            scene, camera, jax.random.fold_in(key_init, 1 + c),
            pix_i + oi, pix_j + oj, None, vol_r, init=True,
        )
        cl, cv = outs[0], outs[5]  # robust to an extra stats element
        corner_locs.append(jnp.where(cv[..., None], cl, jnp.inf))

    radius = jnp.full((r,), jnp.inf)
    pts = [jnp.where(valid[..., None], loc, jnp.inf)] + corner_locs
    for a in range(len(pts)):
        for b in range(a + 1, len(pts)):
            dist = linalg.length(pts[a] - pts[b])
            ok = jnp.isfinite(dist) & (dist > 0)
            radius = jnp.where(ok & (dist < radius), dist, radius)
    radius = radius * radius_scale
    finite = jnp.isfinite(radius)
    avg = jnp.sum(jnp.where(finite, radius, 0.0)) / jnp.maximum(
        jnp.sum(finite), 1
    )
    return jnp.where(finite, radius, avg)


# ---------------------------------------------------------------------------
# differentiable SPPM (BASELINE config 5: emitter optimization THROUGH the
# photon mapper — the reference driver main.cu:1489-1869 is forward-only)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "n_photons", "num_pass", "max_bounce",
        "eye_bounce", "stack_size", "gather_volume", "k_nearest",
        "gather_grid", "k_per_cell", "vol_steps", "photon_pass_fn",
        "pixel_sharding",
    ),
)
def render_sppm_differentiable(
    scene: Scene,
    camera,
    key: jax.Array,
    width: int,
    height: int,
    n_photons: int,
    num_pass: int,
    max_bounce: int = 16,
    eye_bounce: int = 16,
    alpha: float = 0.7,
    radius_scale: float = 1.0,
    stack_size: int = MATERIAL_STACK_SIZE,
    gather_volume: bool = False,
    k_nearest: int = 16,
    gather_grid: bool | None = None,
    k_per_cell: int = 8,
    vol_steps: int = 64,
    photon_pass_fn=None,
    pixel_sharding=None,
) -> jnp.ndarray:
    """Fully jitted, reverse-differentiable SPPM render: one functional
    `lax.scan` over passes whose carried `HitPoints` radiance is
    differentiable w.r.t. the material table (notably `ke`: photon emission
    colors flow through `leaf_energies`'s energy normalization, the direct
    chain flows through `emission_color`).

    Same estimator as `render_sppm` with two deliberate deviations:

    * the init pass contributes geometry + initial radius ONLY (its direct-
      radiance sample is dropped, so the direct estimator averages
      `num_pass` instead of `num_pass + 1` iid samples — same expectation);
    * the init/corner traces run on a `stop_gradient` copy of the scene
      (the gather radius is geometry-only, and the traces stay as cheap
      non-differentiable while_loops).

    Scale: `gather_grid` (None = auto by the same `pixels * photons > 2^24`
    rule as the forward `render_sppm`) switches the surface gather — and,
    with `gather_volume=True`, the recorded-segment beam gather — to the
    hash-grid forms, so the differentiable loop runs at the real neon-sign
    scale (256^2+ pixels, >=16k photons/pass) without the O(R*P) pair
    matrix inside the rematerialized scan.  The grid's candidate topology
    (cell sort, 27-cell lookup, top-k pick) sits under `stop_gradient`;
    contributions stay differentiable — the same trick the Pallas
    traversal uses (ops/pallas_trace.py `closest_hit_pallas`).  The volume
    grid's step loop uses the static `vol_steps` bound (segments needing
    more sample points lose their tail; see volume_gather_segments_grid).

    Scale-out hooks mirror `render_sppm`'s (the BASELINE north star composes
    them with differentiation: "parameter gradients all-reduced over ICI"
    THROUGH the photon mapper): `photon_pass_fn` swaps in the mesh-sharded
    photon tracer (must accept the same signature incl. `differentiable`),
    `pixel_sharding` (a NamedSharding) pins the per-pixel wavefront to the
    mesh so eye pass + gathers partition under GSPMD while grads of the
    replicated material table arrive all-reduced.

    Returns (H, W, 3) linear radiance.
    """
    import dataclasses

    h, w = height, width
    r = w * h
    if gather_grid is None:
        gather_grid = r * n_photons > (1 << 24)
    ii, jj = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    pix_i = ii.reshape(-1)
    pix_j = jj.reshape(-1)
    if pixel_sharding is not None:
        pix_i = jax.lax.with_sharding_constraint(pix_i, pixel_sharding)
        pix_j = jax.lax.with_sharding_constraint(pix_j, pixel_sharding)

    eye_fn = functools.partial(
        eye_pass, max_bounce=eye_bounce, stack_size=stack_size,
        volume_grid=gather_grid and gather_volume, vol_steps=vol_steps,
        vol_k_per_cell=k_per_cell,
    )

    # geometry-only init pass + corner radius on the detached scene
    sg_scene = jax.tree.map(jax.lax.stop_gradient, scene)
    sg_camera = jax.tree.map(jax.lax.stop_gradient, camera)
    key_init = jax.random.fold_in(key, 0)
    vol_r0 = jnp.full((r,), jnp.inf)
    loc, nrm, filt, _, _, valid = eye_fn(
        sg_scene, sg_camera, jax.random.fold_in(key_init, 0),
        pix_i + 0.5, pix_j + 0.5, None, vol_r0, init=True,
    )
    radius = initial_radius(
        eye_fn, sg_scene, sg_camera, key_init, pix_i, pix_j, loc, valid,
        radius_scale,
    )

    hp0 = HitPoints(
        loc=jnp.where(valid[..., None], loc, jnp.inf),
        normal=nrm,
        filter=filt,
        direct=jnp.zeros((r, 3)),
        indirect=jnp.zeros((r, 3)),
        tmp_lm=jnp.zeros((r, 3)),
        surface_radius=radius,
        volume_radius=2.0 * radius,
        valid=valid,
    )

    def one_pass(hp: HitPoints, it):
        pkey = jax.random.fold_in(key, 1000 + it)
        pp = photon_pass if photon_pass_fn is None else photon_pass_fn
        photons = pp(
            scene, pkey, n_photons=n_photons, max_bounce=max_bounce,
            stack_size=stack_size, differentiable=True,
        )
        u_i = jax.random.uniform(jax.random.fold_in(pkey, 2), (r,))
        u_j = jax.random.uniform(jax.random.fold_in(pkey, 3), (r,))
        loc, nrm, filt, direct, tmp_lm, valid = eye_fn(
            scene, camera, jax.random.fold_in(pkey, 1),
            pix_i + u_i, pix_j + u_j,
            photons if gather_volume else None, hp.volume_radius,
            init=False, differentiable=True,
        )
        hp = dataclasses.replace(
            hp,
            loc=jnp.where(valid[..., None], loc, jnp.inf),
            normal=nrm,
            filter=filt,
            direct=hp.direct + direct,
            tmp_lm=tmp_lm,
            valid=valid,
        )
        if gather_grid:
            flux, _ = surface_gather_grid(
                scene, photons, hp.loc, hp.normal, hp.surface_radius,
                hp.valid, k_nearest=k_nearest, k_per_cell=k_per_cell,
            )
        else:
            flux, _ = surface_gather(
                scene, photons, hp.loc, hp.normal, hp.surface_radius,
                hp.valid, k_nearest=k_nearest,
            )
        iteration = (it + 1).astype(jnp.float32)
        shrink = jnp.where(
            iteration >= 2.0,
            jnp.sqrt((iteration + alpha) / (iteration + 1.0)),
            1.0,
        )
        shrink_v = jnp.where(
            iteration >= 2.0,
            jnp.power((iteration + alpha) / (iteration + 1.0), 1.0 / 3.0),
            1.0,
        )
        surf_contrib = linalg.de_nan(
            hp.filter * flux
            / (n_photons * jnp.pi * (hp.surface_radius[..., None] ** 2))
        )
        vol_contrib = linalg.de_nan(hp.tmp_lm / n_photons)
        hp = dataclasses.replace(
            hp,
            indirect=hp.indirect + surf_contrib + vol_contrib,
            surface_radius=hp.surface_radius * shrink,
            volume_radius=hp.volume_radius * shrink_v,
            tmp_lm=jnp.zeros_like(hp.tmp_lm),
        )
        return hp, None

    hp, _ = jax.lax.scan(
        jax.checkpoint(one_pass), hp0, jnp.arange(num_pass)
    )
    img = (hp.direct + hp.indirect) / num_pass
    return linalg.de_nan(img).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def render_sppm(
    scene: Scene, camera, cfg, key, output_prefix: str | None = None,
    photon_pass_fn=None,
    n_photons_override: int | None = None,
    pixel_sharding=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
) -> "np.ndarray":
    """Full SPPM render (main.cu:1213-1869 SPPM branch).  Returns (H, W, 3)
    combined (direct + indirect) linear radiance.

    With `output_prefix` set, emits the reference's debug/progress artifacts:
    a hit-point splat after the init pass (main.cu:1256-1270 `_hit_point.ppm`)
    and, every `cfg.ppm_image_output_iteration` passes, direct / indirect /
    combined images plus surface- and volume-photon splats
    (main.cu:1830-1867, :1310-1382).

    Scale-out hooks (parallel/sppm_shard.py): `photon_pass_fn` swaps in the
    mesh-sharded photon tracer, `pixel_sharding` (a NamedSharding) shards the
    per-pixel arrays so the eye pass + gathers partition over chips.

    Durability (SURVEY.md §5: the reference has NO checkpointing — SPPM
    state lives only in device memory): with `checkpoint_dir`, the per-pixel
    accumulation state (flux, radii, pass index) is orbax-saved every
    `checkpoint_every` passes and the render resumes from the latest
    checkpoint after a restart."""
    import numpy as np

    w, h = cfg.image_width, cfg.image_height
    n_pix = w * h
    ii, jj = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    pix_i = ii.reshape(-1)
    pix_j = jj.reshape(-1)
    r = n_pix
    if pixel_sharding is not None:
        # pad the flattened pixel batch to a mesh-size multiple so odd
        # resolutions shard evenly; the tail rays trace pixel (0, 0) and are
        # sliced off before the final reshape
        n_dev = pixel_sharding.mesh.size
        pad = (-n_pix) % n_dev
        if pad:
            pix_i = jnp.concatenate([pix_i, jnp.zeros((pad,), pix_i.dtype)])
            pix_j = jnp.concatenate([pix_j, jnp.zeros((pad,), pix_j.dtype)])
            r = n_pix + pad
        pix_i = jax.device_put(pix_i, pixel_sharding)
        pix_j = jax.device_put(pix_j, pixel_sharding)

    max_bounce = cfg.ppm_max_bounce
    n_phot = int(n_photons_override or cfg.ppm_num_photon_per_pass)
    alpha = cfg.ppm_alpha
    if photon_pass_fn is None:
        photon_pass_fn = photon_pass

    # dense recorded-segment gather for tiny workloads; hash-grid beams once
    # the (segments x photons) product would dominate
    use_vol_grid = r * n_phot > (1 << 24)
    # "no silent caps": overflow counters are ALWAYS collected (cheap
    # scalars riding the pass outputs) and summarized once at end of
    # render; GPT_TPU_CAP_STATS=1 additionally logs them per pass.  The
    # reference's gather is unbounded (bvh_traversal_photon.h:108-205), so
    # with GPT_TPU_AUTO_CAPS (default on) a pass that drops more than 1%%
    # of its in-radius candidates re-runs its gather with doubled
    # k_nearest/k_per_cell until the drop is negligible — truncation bias
    # is corrected, not merely reported.
    cap_stats = os.environ.get("GPT_TPU_CAP_STATS", "0") != "0"
    auto_caps = os.environ.get("GPT_TPU_AUTO_CAPS", "1") != "0"
    eye_jit = jax.jit(
        functools.partial(
            eye_pass, max_bounce=64, stack_size=cfg.max_stack,
            volume_grid=use_vol_grid, return_stats=True,
        ),
        static_argnames=("init",),
    )

    # ---- checkpoint/resume (orbax; SURVEY.md §5) ---------------------------
    import dataclasses

    # run fingerprint saved with every checkpoint: restoring a checkpoint
    # from a different scene/key/config silently blends foreign state into
    # this run, so mismatches refuse loudly instead
    try:
        key_fp = jnp.asarray(jax.random.key_data(key), jnp.uint32).reshape(-1)
    except TypeError:  # raw uint32 key array
        key_fp = jnp.asarray(key, jnp.uint32).reshape(-1)
    run_meta = {
        "key_fp": key_fp,
        "num_pixels": jnp.int32(n_pix),
        "n_phot": jnp.int32(n_phot),
        "max_bounce": jnp.int32(max_bounce),
        "alpha": jnp.float32(alpha),
        # ppm_num_pass deliberately excluded: resuming with a larger pass
        # target is the legitimate "extend the run" workflow
    }

    mngr = None
    start_pass = 0
    resumed_hp = None
    if checkpoint_dir is not None:
        import numpy as _np
        import orbax.checkpoint as ocp

        mngr = ocp.CheckpointManager(
            checkpoint_dir, options=ocp.CheckpointManagerOptions(max_to_keep=2)
        )
        latest = mngr.latest_step()
        if latest is not None:
            restored = mngr.restore(latest)
            saved_meta = restored.get("meta")
            if saved_meta is None:
                raise ValueError(
                    f"checkpoint at {checkpoint_dir} has no run metadata; "
                    "refusing to resume (pre-metadata checkpoint or foreign "
                    "artifact — delete the directory to start fresh)"
                )
            for k, want in run_meta.items():
                got = saved_meta.get(k)
                if got is None or not _np.array_equal(
                    _np.asarray(got), _np.asarray(want)
                ):
                    raise ValueError(
                        f"checkpoint at {checkpoint_dir} was written by a "
                        f"different run (field {k!r}: saved={got} != "
                        f"current={want}); refusing to resume"
                    )
            resumed_hp = HitPoints(
                **{k: jnp.asarray(v) for k, v in restored["hit_points"].items()}
            )
            start_pass = int(latest) + 1

    # ---- init pass: main + 4 corner traces -> initial radius --------------
    key_init = jax.random.fold_in(key, 0)
    vol_r = jnp.full((r,), jnp.inf)
    if resumed_hp is not None:
        loc = nrm = filt = direct = valid = None  # init pass skipped on resume
    else:
        loc, nrm, filt, direct, _, valid = eye_jit(
            scene, camera, jax.random.fold_in(key_init, 0),
            pix_i + 0.5, pix_j + 0.5, None, vol_r, init=True,
        )[:6]
    if resumed_hp is not None:
        hp = resumed_hp
    else:
        radius = initial_radius(
            eye_jit, scene, camera, key_init, pix_i, pix_j, loc, valid,
            cfg.ppm_radius_scaling_factor,
        )

        hp = HitPoints(
            loc=loc,
            normal=nrm,
            filter=filt,
            direct=direct,
            indirect=jnp.zeros((r, 3)),
            tmp_lm=jnp.zeros((r, 3)),
            surface_radius=radius,
            volume_radius=2.0 * radius,
            valid=valid,
        )

    if output_prefix is not None:
        from gpu_pathtracer_tpu.render.splat import splat_points
        from gpu_pathtracer_tpu.utils.image import save_ppm

        save_ppm(
            np.asarray(
                splat_points(camera, hp.loc, hp.filter, w, h, hp.valid)
            ),
            f"{output_prefix}_hit_point.ppm",
        )

    # dense all-pairs for tiny workloads; hash grid once pixels*photons is
    # big enough that the O(R*P) distance matrix dominates (BASELINE.json:
    # hash-grid radiance estimation)
    use_surf_grid = r * n_phot > (1 << 24)
    _gather_cache = {}

    def make_gather(kn: int, kpc: int):
        if (kn, kpc) not in _gather_cache:
            if use_surf_grid:
                _gather_cache[(kn, kpc)] = jax.jit(functools.partial(
                    surface_gather_grid, k_nearest=kn, k_per_cell=kpc,
                    return_overflow=True,
                ))
            else:
                _gather_cache[(kn, kpc)] = jax.jit(functools.partial(
                    surface_gather, k_nearest=kn, return_overflow=True,
                ))
        return _gather_cache[(kn, kpc)]

    k_nearest_cur = int(os.environ.get("GPT_TPU_K_NEAREST", "16"))
    k_per_cell_cur = int(os.environ.get("GPT_TPU_K_PER_CELL", "8"))
    # the dense gather's k_nearest cannot exceed the photon count
    k_nearest_max = int(os.environ.get("GPT_TPU_AUTO_CAPS_MAX", "256"))

    @jax.jit
    def update(hp: HitPoints, flux, iteration):
        shrink = jnp.where(
            iteration >= 2,
            jnp.sqrt((iteration + alpha) / (iteration + 1.0)),
            1.0,
        )
        shrink_v = jnp.where(
            iteration >= 2,
            jnp.power((iteration + alpha) / (iteration + 1.0), 1.0 / 3.0),
            1.0,
        )
        surf_contrib = linalg.de_nan(
            hp.filter * flux / (
                n_phot * jnp.pi * (hp.surface_radius[..., None] ** 2)
            )
        )
        vol_contrib = linalg.de_nan(hp.tmp_lm / n_phot)
        import dataclasses

        return dataclasses.replace(
            hp,
            indirect=hp.indirect + surf_contrib + vol_contrib,
            surface_radius=hp.surface_radius * shrink,
            volume_radius=hp.volume_radius * shrink_v,
            tmp_lm=jnp.zeros_like(hp.tmp_lm),
        )

    def _save_checkpoint(it, hp):
        if mngr is None:
            return
        import orbax.checkpoint as ocp

        tree = {
            "hit_points": {
                f.name: getattr(hp, f.name) for f in dataclasses.fields(hp)
            },
            "meta": run_meta,
        }
        mngr.save(it, args=ocp.args.StandardSave(tree))

    num_pass = cfg.ppm_num_pass
    # medium-free scenes skip the recorded-segment machinery entirely: with
    # volume_photons=None the eye pass's per-bounce segment-slot updates
    # (7 arrays x (R, max_segments) of where-writes) drop out of the loop,
    # which is pure HBM traffic when no material has an extinction
    # coefficient (tmp_lm is identically 0 either way)
    has_medium = bool(
        np.any(
            np.asarray(scene.materials.scattering_coef)
            + np.asarray(scene.materials.absorption_coef)
            > 0
        )
    )
    _cap_totals = {
        "gather_candidates_dropped": 0,
        "segments_dropped": 0,
        "beam_steps_dropped": 0,
    }
    for it in range(start_pass, num_pass):
        pkey = jax.random.fold_in(key, 1000 + it)
        photons = photon_pass_fn(
            scene, pkey, n_photons=n_phot, max_bounce=max_bounce,
            stack_size=cfg.max_stack,
        )
        eye_outs = eye_jit(
            scene, camera, jax.random.fold_in(pkey, 1),
            pix_i
            + jax.random.uniform(jax.random.fold_in(pkey, 2), (r,)),
            pix_j
            + jax.random.uniform(jax.random.fold_in(pkey, 3), (r,)),
            photons if has_medium else None, hp.volume_radius, init=False,
        )
        loc, nrm, filt, direct, tmp_lm, valid = eye_outs[:6]
        hp = dataclasses.replace(
            hp,
            loc=jnp.where(valid[..., None], loc, jnp.inf),
            normal=nrm,
            filter=filt,
            direct=hp.direct + direct,
            tmp_lm=tmp_lm,
            valid=valid,
        )
        gather_outs = make_gather(k_nearest_cur, k_per_cell_cur)(
            scene, photons, hp.loc, hp.normal, hp.surface_radius, hp.valid
        )
        # auto-raise: re-gather THIS pass with doubled caps while more than
        # 1%% of in-radius candidates were dropped (each raise costs one
        # jit compile; radii only shrink, so raises concentrate in the
        # first passes — exactly where a silent cap would bias the most)
        dropped = int(gather_outs[2])
        kept = float(jnp.sum(gather_outs[1]))
        while (
            auto_caps
            and dropped > 0.01 * (dropped + kept)
            and k_nearest_cur < min(k_nearest_max, n_phot)
        ):
            k_nearest_cur = min(k_nearest_cur * 2, k_nearest_max, n_phot)
            k_per_cell_cur = min(k_per_cell_cur * 2, k_nearest_max)
            gather_outs = make_gather(k_nearest_cur, k_per_cell_cur)(
                scene, photons, hp.loc, hp.normal, hp.surface_radius,
                hp.valid,
            )
            dropped = int(gather_outs[2])
            kept = float(jnp.sum(gather_outs[1]))
        flux = gather_outs[0]
        hp = update(hp, flux, jnp.float32(it + 1))
        es = eye_outs[6]
        _cap_totals["gather_candidates_dropped"] += dropped
        _cap_totals["segments_dropped"] += int(es["segments_dropped"])
        _cap_totals["beam_steps_dropped"] += int(es["beam_steps_dropped"])
        if cap_stats:
            print(
                f"[capstats] pass {it + 1}: "
                f"gather_candidates_dropped={dropped} "
                f"(k_nearest={k_nearest_cur}) "
                f"segments_dropped={int(es['segments_dropped'])} "
                f"beam_steps_dropped={int(es['beam_steps_dropped'])}"
            )
        if (it + 1) % max(checkpoint_every, 1) == 0 or it + 1 == num_pass:
            _save_checkpoint(it, hp)

        every = max(int(cfg.ppm_image_output_iteration), 1)
        if output_prefix is not None and (
            (it + 1) % every == 0 or it + 1 == num_pass
        ):
            from gpu_pathtracer_tpu.render.splat import splat_points
            from gpu_pathtracer_tpu.utils.image import save_ppm

            passes = it + 1
            direct_img = np.asarray(
                linalg.de_nan(hp.direct / passes).reshape(h, w, 3)
            )
            indirect_img = np.asarray(
                linalg.de_nan(hp.indirect / passes).reshape(h, w, 3)
            )
            save_ppm(direct_img, f"{output_prefix}_direct.ppm")
            save_ppm(indirect_img, f"{output_prefix}_indirect.ppm")
            save_ppm(direct_img + indirect_img, f"{output_prefix}.ppm")
            surf = photons.valid & photons.on_surface
            save_ppm(
                np.asarray(
                    splat_points(camera, photons.pos, photons.color, w, h, surf)
                ),
                f"{output_prefix}_surface_photon.ppm",
            )
            save_ppm(
                np.asarray(
                    splat_points(
                        camera, photons.pos, photons.color, w, h,
                        photons.valid & ~photons.on_surface,
                    )
                ),
                f"{output_prefix}_volume_photon.ppm",
            )

    if mngr is not None:
        mngr.wait_until_finished()
    print(
        "[capstats] render totals: "
        + " ".join(f"{k}={v}" for k, v in _cap_totals.items())
        + f" (final k_nearest={k_nearest_cur})",
        flush=True,
    )
    img = (hp.direct + hp.indirect) / num_pass
    return np.asarray(linalg.de_nan(img)[:n_pix].reshape(h, w, 3))
