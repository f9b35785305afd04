"""Modified-Phong BSDF sampling with nested-dielectric priority stacks.

TPU-native re-derivation of the reference's material system
(`src/model/material/material.h`, `src/render/material_list_operations.h`):

* The reference's per-MTL ``Material`` objects become ONE structure-of-arrays
  `MaterialTable`; a ray's "current media" pointer list becomes a fixed-size
  int32 id stack (`MATERIAL_STACK_SIZE` slots) carried through the bounce
  loop — id -1 plays the role of ``nullptr`` (vacuum), -2 marks empty slots.
* ``check_next_path`` (material.h:536-651) becomes the branch-free, batched
  `sample_bsdf`: the false-hit / refraction / opaque(diffuse-vs-specular)
  branches are all computed and blended with ``where`` masks, so the op maps
  onto the VPU with no divergence.

All randomness comes in as explicit uniforms derived by the caller from
counter-based keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.constants import (
    MAX_PHONG_N_S,
    SMALL_EPS,
    VACUUM_IOR,
    VACUUM_PRIORITY,
)
from gpu_pathtracer_tpu.ops import linalg, sampling, texture
from gpu_pathtracer_tpu.pytree import pytree_dataclass

# Stack slot sentinels.
NULL_MAT = -1  # "nullptr" — the vacuum pseudo-material (a legal stack entry)
EMPTY_SLOT = -2  # unused slot


@pytree_dataclass
class MaterialTable:
    """SoA of every MTL material (reference Material fields, material.h:41-114).

    ``n_s`` holds +inf for the perfect-mirror limit (constructor rule
    ``n_s >= MAX_PHONG_N_S && t_r > 0`` -> INFINITY, material.h:457-460).
    """

    kd: jnp.ndarray  # (M, 3)
    ks: jnp.ndarray  # (M, 3)
    ke: jnp.ndarray  # (M, 3)
    tf: jnp.ndarray  # (M, 3) transmission
    n_s: jnp.ndarray  # (M,)
    n_i: jnp.ndarray  # (M,)
    t_r: jnp.ndarray  # (M,)
    bm: jnp.ndarray  # (M,) bump multiplier
    path_length: jnp.ndarray  # (M,) > 0 => sub-surface scattering
    scattering_coef: jnp.ndarray  # (M,)
    absorption_coef: jnp.ndarray  # (M,)
    g: jnp.ndarray  # (M,) Henyey-Greenstein asymmetry
    priority: jnp.ndarray  # (M,) int32 nested-dielectric priority
    tex_slot: jnp.ndarray  # (M, 5) int32: diffuse/specular/emission/n_s/bump
    atlas: texture.Atlas

    @staticmethod
    def from_host(mats, atlas_np) -> "MaterialTable":
        """Build from utils.obj_io.HostMaterials + TextureAtlas."""
        n_s = jnp.asarray(mats.n_s)
        t_r = jnp.asarray(mats.t_r)
        n_s = jnp.where((n_s >= MAX_PHONG_N_S) & (t_r > 0), jnp.inf, n_s)
        return MaterialTable(
            kd=jnp.asarray(mats.kd),
            ks=jnp.asarray(mats.ks),
            ke=jnp.asarray(mats.ke),
            tf=jnp.asarray(mats.tf),
            n_s=n_s,
            n_i=jnp.asarray(mats.n_i),
            t_r=t_r,
            bm=jnp.asarray(mats.bm),
            path_length=jnp.asarray(mats.path_length),
            scattering_coef=jnp.asarray(mats.scattering_coef),
            absorption_coef=jnp.asarray(mats.absorption_coef),
            g=jnp.asarray(mats.g),
            priority=jnp.asarray(mats.priority, jnp.int32),
            tex_slot=jnp.asarray(mats.tex_slot, jnp.int32),
            atlas=texture.Atlas(
                rgb=jnp.asarray(atlas_np.rgb),
                offsets=jnp.asarray(atlas_np.offsets),
                heights=jnp.asarray(atlas_np.heights),
                widths=jnp.asarray(atlas_np.widths),
            ),
        )

    # -- per-id accessors (id -1 => vacuum defaults) --------------------

    def get_priority(self, mat_id: jnp.ndarray) -> jnp.ndarray:
        """material.h:130-136: nullptr -> 9999999."""
        safe = jnp.maximum(mat_id, 0)
        return jnp.where(mat_id < 0, VACUUM_PRIORITY, self.priority[safe])

    def get_ior(self, mat_id: jnp.ndarray) -> jnp.ndarray:
        """material.h:138-144: nullptr -> 1.0."""
        safe = jnp.maximum(mat_id, 0)
        return jnp.where(mat_id < 0, VACUUM_IOR, self.n_i[safe])

    # -- textured channels (material.h:673-727) --------------------------

    def _tex(self, mat_id, channel: int, uv, filt):
        safe = jnp.maximum(mat_id, 0)
        slot = self.tex_slot[safe, channel]
        return texture.lookup(self.atlas, slot, uv) * filt

    def diffuse_color(self, mat_id, uv):
        return self._tex(mat_id, 0, uv, self.kd[jnp.maximum(mat_id, 0)])

    def specular_color(self, mat_id, uv):
        return self._tex(mat_id, 1, uv, self.ks[jnp.maximum(mat_id, 0)])

    def emission_color(self, mat_id, uv):
        return self._tex(mat_id, 2, uv, self.ke[jnp.maximum(mat_id, 0)])

    def phong_exponent(self, mat_id, uv):
        """material.h:712-727: |n_s/sqrt(3) * tex_rgb|; +inf passes through.

        The norm is epsilon-guarded: at v == 0 (mirror rows where filt is
        forced to 0, or n_s == 0) sqrt's backward is 0/0, and the NaN would
        leak THROUGH the jnp.where into the texture-atlas gradient
        (0 * NaN = NaN) even though those rows' outputs are overridden —
        atlas texels are optimizable parameters (optim.py `atlas_rgb`)."""
        safe = jnp.maximum(mat_id, 0)
        n_s = self.n_s[safe]
        filt = jnp.where(jnp.isinf(n_s), 0.0, n_s)[..., None] / jnp.sqrt(3.0)
        v = self._tex(mat_id, 3, uv, filt)
        len_v = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 1e-30))
        return jnp.where(jnp.isinf(n_s), jnp.inf, len_v)

    def bump_vector(self, mat_id, uv):
        """2*bm*(tex - 0.5); zero when the bump image is < 2x2
        (material.h:690-702)."""
        if self.atlas.rgb.shape[0] <= 1:  # no real images -> never bumped
            return jnp.zeros(mat_id.shape + (3,), self.atlas.rgb.dtype)
        safe = jnp.maximum(mat_id, 0)
        slot = self.tex_slot[safe, 4]
        has = (self.atlas.heights[slot] >= 2) & (self.atlas.widths[slot] >= 2)
        tex = texture.lookup(self.atlas, slot, uv)
        bump = 2.0 * self.bm[safe][..., None] * (tex - 0.5)
        return jnp.where(has[..., None], bump, 0.0)

    def transmission_k(self, mat_id):
        """k = Tf * t_r, 1 for nullptr (vacuum filters nothing)."""
        safe = jnp.maximum(mat_id, 0)
        k = self.tf[safe] * self.t_r[safe][..., None]
        return jnp.where((mat_id < 0)[..., None], 1.0, k)


# ---------------------------------------------------------------------------
# Nested-dielectric id stack (material_list_operations.h:9-58)
# ---------------------------------------------------------------------------

def stack_init(batch_shape, size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fresh stacks pre-loaded with one nullptr entry (pathtracing.h:107)."""
    ids = jnp.full(batch_shape + (size,), EMPTY_SLOT, jnp.int32)
    ids = ids.at[..., 0].set(NULL_MAT)
    return ids, jnp.ones(batch_shape, jnp.int32)


def stack_add(ids, length, mat_id, enable):
    """Append mat_id unless already present (add_new_material).

    `enable` masks the update per ray.  Full stacks drop the push (the
    reference would overflow its 400-slot array instead)."""
    size = ids.shape[-1]
    slots = jnp.arange(size, dtype=jnp.int32)
    valid = slots < length[..., None]
    present = jnp.any(valid & (ids == mat_id[..., None]), axis=-1)
    do = enable & ~present & (length < size)
    new_ids = jnp.where(
        do[..., None] & (slots == length[..., None]), mat_id[..., None], ids
    )
    return new_ids, length + do.astype(jnp.int32)


def stack_remove(ids, length, mat_id, enable):
    """Remove the LAST occurrence of mat_id and compact (remove_a_material:
    scans top-down for the match, shifts the tail left)."""
    size = ids.shape[-1]
    slots = jnp.arange(size, dtype=jnp.int32)
    valid = slots < length[..., None]
    match = valid & (ids == mat_id[..., None])
    # last matching slot, -1 if none
    sel = jnp.max(jnp.where(match, slots, -1), axis=-1)
    found = (sel >= 0) & enable
    shifted = jnp.concatenate(
        [ids[..., 1:], jnp.full(ids.shape[:-1] + (1,), EMPTY_SLOT, jnp.int32)],
        axis=-1,
    )
    new_ids = jnp.where(found[..., None] & (slots >= sel[..., None]), shifted, ids)
    new_len = length - found.astype(jnp.int32)
    new_ids = jnp.where(
        found[..., None] & (slots >= new_len[..., None]), EMPTY_SLOT, new_ids
    )
    return new_ids, new_len


def stack_rearrange(ids, length, mat_id, false_hit, entering, refracted, enable):
    """rearrange_material_list (material_list_operations.h:43-58)."""
    push = enable & ((false_hit & entering) | (~false_hit & refracted & entering))
    pop = enable & ((false_hit & ~entering) | (~false_hit & refracted & ~entering))
    ids, length = stack_add(ids, length, mat_id, push)
    ids, length = stack_remove(ids, length, mat_id, pop)
    return ids, length


def find_highest_prioritised(table: MaterialTable, ids, length):
    """(highest, second-highest)-priority material ids on the stack.

    Faithful to find_highest_prioritised_materials (material.h:157-197):
    lowest priority VALUE wins; scanning goes top-down with strict '<', so
    ties resolve to the highest slot index; the second must be strictly
    lower-priority than the first and strictly higher than nullptr.
    """
    size = ids.shape[-1]
    slots = jnp.arange(size, dtype=jnp.int32)
    valid = slots < length[..., None]
    pri = jnp.where(valid, table.get_priority(ids), VACUUM_PRIORITY + 1)
    # strict '<' scanning from high idx => among equal pri the highest idx
    # wins.  The winner is read back with masked REDUCTIONS, not argmin +
    # take_along_axis: a minor-axis take_along_axis lowers to an XLA gather,
    # and these three ran every bounce for every ray (a measurable slice of
    # the forward wavefront); key is unique per slot, so selecting by
    # key == min(key) is exact.
    key = pri * (size + 1) + (size - 1 - slots)
    min_key = jnp.min(key, axis=-1)
    hp_pri = min_key // (size + 1)
    sel = key == min_key[..., None]
    hp_id = jnp.where(
        hp_pri >= VACUUM_PRIORITY,
        NULL_MAT,
        jnp.sum(jnp.where(sel, ids, 0), axis=-1),
    )
    eligible = valid & (pri > hp_pri[..., None]) & (pri < VACUUM_PRIORITY)
    key2 = jnp.where(eligible, key, jnp.int32(2**31 - 1))
    min_key2 = jnp.min(key2, axis=-1)
    any2 = jnp.any(eligible, axis=-1)
    sel2 = key2 == min_key2[..., None]
    shp_id = jnp.where(
        any2,
        jnp.sum(jnp.where(sel2 & eligible, ids, 0), axis=-1),
        NULL_MAT,
    )
    return hp_id, shp_id


# ---------------------------------------------------------------------------
# BSDF sampling (check_next_path, material.h:536-651)
# ---------------------------------------------------------------------------

@pytree_dataclass
class ReflectionRecord:
    """Batched reflection_record (material.h:116-123)."""

    origin: jnp.ndarray  # (..., 3) hit point = next ray origin
    dir: jnp.ndarray  # (..., 3) sampled next direction
    k: jnp.ndarray  # (..., 3)
    filter: jnp.ndarray  # (..., 3)
    filter_2: jnp.ndarray  # (..., 3)
    perfect_dir: jnp.ndarray  # (..., 3)
    pdf: jnp.ndarray  # (...,)
    n: jnp.ndarray  # (...,) effective Phong exponent (inf = mirror)
    diffuse: jnp.ndarray  # (...,) bool
    reflected: jnp.ndarray
    refracted: jnp.ndarray
    false_hit: jnp.ndarray
    entering: jnp.ndarray
    bent: jnp.ndarray
    sss: jnp.ndarray
    next_mat: jnp.ndarray  # (...,) int32


def _snell_out_dir(v_in, normal, cos1, sin_ratio, sign):
    """Bend v_in across the interface: parallel/perpendicular decomposition
    (material.h:293-308 entering with sign=-1, :357-371 exiting with sign=+1).
    Grazing/degenerate bends fall back to +/-normal like the reference."""
    sin1 = linalg.safe_sqrt(1.0 - cos1 * cos1)
    # entering (sign=-1): v_in_perp = -cos1*n; exiting (sign=+1): +cos1*n
    v_perp = sign[..., None] * cos1[..., None] * normal
    v_par = v_in - v_perp
    sin2 = sin_ratio * sin1
    cos2 = linalg.safe_sqrt(1.0 - sin2 * sin2)
    tan2 = sin2 / jnp.maximum(cos2, 1e-20)
    straight = jnp.abs(tan2) <= SMALL_EPS
    inv_tan = jnp.where(straight, 0.0, 1.0 / jnp.maximum(tan2, SMALL_EPS))
    par_len = linalg.length(v_par, keepdims=True)
    v_out = linalg.normalize(
        v_par + sign[..., None] * inv_tan[..., None] * par_len * normal, SMALL_EPS
    )
    return jnp.where(straight[..., None], sign[..., None] * normal, v_out)


def sample_bsdf(
    table: MaterialTable,
    mat_id: jnp.ndarray,  # (R,) int32 hit material
    hit_point: jnp.ndarray,  # (R, 3)
    v_in: jnp.ndarray,  # (R, 3) incoming (unit) direction
    normal: jnp.ndarray,  # (R, 3) shading normal (bump applied)
    uv: jnp.ndarray,  # (R, 2)
    stack_ids: jnp.ndarray,  # (R, S)
    stack_len: jnp.ndarray,  # (R,)
    key: jax.Array,
    force_refract: bool | jnp.ndarray = False,
) -> ReflectionRecord:
    """Batched, branch-free check_next_path (material.h:536-651).

    One fused op: false-hit test -> refraction (Schlick + Snell + TIR with
    the nested-dielectric stack) -> diffuse/specular pick; every ray
    evaluates all paths and blends by mask.
    """
    r_shape = mat_id.shape
    u_choice = jax.random.uniform(jax.random.fold_in(key, 0), r_shape)
    u_pick = jax.random.uniform(jax.random.fold_in(key, 1), r_shape)
    u_lobe1 = jax.random.uniform(jax.random.fold_in(key, 2), r_shape)
    u_lobe2 = jax.random.uniform(jax.random.fold_in(key, 3), r_shape)
    force_refract = jnp.broadcast_to(jnp.asarray(force_refract, bool), r_shape)

    hp_id, shp_id = find_highest_prioritised(table, stack_ids, stack_len)
    hp_pri = table.get_priority(hp_id)
    this_pri = table.get_priority(mat_id)
    false_hit = this_pri > hp_pri

    n_i = table.n_i[jnp.maximum(mat_id, 0)]
    t_r = table.t_r[jnp.maximum(mat_id, 0)]
    transparent = t_r > 0
    n_s_local = table.phong_exponent(mat_id, uv)

    d_in_n = linalg.dot(v_in, normal)
    entering_geom = d_in_n <= 0

    # ---- refraction branch (material.h:259-409) ------------------------
    hp_ior = table.get_ior(hp_id)
    shp_ior = table.get_ior(shp_id)

    # entering face
    cos1_in = -d_in_n
    rp_in = sampling.schlick_reflectance(cos1_in, hp_ior, n_i)
    refract_in = (u_choice >= rp_in) | force_refract
    v_refr_in = _snell_out_dir(
        v_in, normal, cos1_in, hp_ior / n_i, -jnp.ones(r_shape)
    )
    v_refl_in = linalg.normalize(linalg.reflect(v_in, normal), SMALL_EPS)

    # exiting face
    cos1_out = d_in_n
    sin1_out = linalg.safe_sqrt(1.0 - cos1_out * cos1_out)
    sin1_max = shp_ior / n_i
    rp_out = sampling.schlick_reflectance(cos1_out, n_i, shp_ior)
    reflect_out = ((sin1_out >= sin1_max) | (u_choice <= rp_out)) & ~force_refract
    v_refr_out = _snell_out_dir(
        v_in, normal, cos1_out, n_i / shp_ior, jnp.ones(r_shape)
    )
    v_refl_out = linalg.normalize(linalg.reflect(v_in, -normal), SMALL_EPS)

    refracted_t = jnp.where(entering_geom, refract_in, ~reflect_out)
    v_out_t = jnp.where(
        entering_geom[..., None],
        jnp.where(refract_in[..., None], v_refr_in, v_refl_in),
        jnp.where(reflect_out[..., None], v_refl_out, v_refr_out),
    )
    entering_t = entering_geom & refract_in  # material.h:315/329/354/378
    next_t = jnp.where(
        entering_geom,
        jnp.where(refract_in, mat_id, hp_id),
        jnp.where(reflect_out, mat_id, shp_id),
    )
    bent_t = refracted_t & jnp.where(
        entering_geom,
        jnp.abs(hp_ior - n_i) > SMALL_EPS,
        jnp.abs(shp_ior - n_i) > SMALL_EPS,
    )

    dir_t = sampling.generate_direction(
        v_out_t, normal, jnp.ones(r_shape, jnp.int32), n_s_local, u_lobe1, u_lobe2
    )
    k_t = table.tf[jnp.maximum(mat_id, 0)] * t_r[..., None]
    filt_t = sampling.phong_filter(k_t, n_s_local, v_out_t, dir_t)
    filt2_t = sampling.phong_filter_2(k_t, n_s_local, v_out_t, dir_t)
    # second interface factor when passing into a different medium
    # (material.h:391-397)
    has_next2 = (next_t >= 0) & (next_t != mat_id)
    k2 = table.transmission_k(next_t)
    n_s2 = table.phong_exponent(next_t, uv)
    k_t = jnp.where(has_next2[..., None], k_t * k2, k_t)
    filt_t = jnp.where(
        has_next2[..., None],
        filt_t * sampling.phong_filter(k2, n_s2, v_out_t, dir_t),
        filt_t,
    )
    filt2_t = jnp.where(
        has_next2[..., None],
        filt2_t * sampling.phong_filter_2(k2, n_s2, v_out_t, dir_t),
        filt2_t,
    )

    # ---- opaque branch (material.h:586-648) -----------------------------
    kd_tex = table.diffuse_color(mat_id, uv)
    ks_tex = table.specular_color(mat_id, uv)
    kd_len = linalg.length(kd_tex)
    ks_len = linalg.length(ks_tex)
    denom = kd_len + ks_len
    # kd=ks=0 (typical pure emitters): the reference computes factor = 0/0 =
    # NaN and `random > NaN` is false, which lands in the SPECULAR branch
    # (material.h:598-602) — reproduced via spec_prob = 1.
    spec_prob = jnp.where(denom > 0, ks_len / jnp.maximum(denom, 1e-20), 1.0)
    choose_spec = u_pick <= spec_prob

    dir_diff = sampling.generate_direction(
        jnp.zeros_like(v_in),
        normal,
        jnp.zeros(r_shape, jnp.int32),
        jnp.ones(r_shape),
        u_lobe1,
        u_lobe2,
    )
    refl_dir = linalg.normalize(linalg.reflect(v_in, normal), SMALL_EPS)
    dir_spec = sampling.generate_direction(
        refl_dir, normal, jnp.ones(r_shape, jnp.int32), n_s_local, u_lobe1, u_lobe2
    )
    filt_spec = sampling.phong_filter(ks_tex, n_s_local, refl_dir, dir_spec)
    filt2_spec = sampling.phong_filter_2(ks_tex, n_s_local, refl_dir, dir_spec)

    dir_o = jnp.where(choose_spec[..., None], dir_spec, dir_diff)
    filt_o = jnp.where(choose_spec[..., None], filt_spec, kd_tex)
    filt2_o = jnp.where(choose_spec[..., None], filt2_spec, kd_tex)
    k_o = jnp.where(choose_spec[..., None], ks_tex, kd_tex)
    n_o = jnp.where(choose_spec, n_s_local, 1.0)
    sss_o = ~choose_spec & (table.path_length[jnp.maximum(mat_id, 0)] > 0)

    # ---- blend the three paths ------------------------------------------
    use_refr = ~false_hit & transparent
    use_opaque = ~false_hit & ~transparent

    direction = jnp.where(
        false_hit[..., None],
        v_in,
        jnp.where(use_refr[..., None], dir_t, dir_o),
    )
    perfect = jnp.where(
        use_refr[..., None],
        v_out_t,
        jnp.where(choose_spec[..., None], refl_dir, normal),
    )
    filt = jnp.where(
        false_hit[..., None],
        1.0,
        jnp.where(use_refr[..., None], filt_t, filt_o),
    )
    filt2 = jnp.where(
        false_hit[..., None],
        1.0,
        jnp.where(use_refr[..., None], filt2_t, filt2_o),
    )
    k = jnp.where(
        false_hit[..., None], 1.0, jnp.where(use_refr[..., None], k_t, k_o)
    )
    n_eff = jnp.where(false_hit, 1.0, jnp.where(use_refr, n_s_local, n_o))
    diffuse = use_opaque & ~choose_spec
    reflected = jnp.where(
        use_refr, ~refracted_t, use_opaque & choose_spec
    )
    refracted = false_hit | (use_refr & refracted_t)
    entering = jnp.where(false_hit, entering_geom, use_refr & entering_t)
    bent = use_refr & bent_t
    sss = use_opaque & sss_o
    next_mat = jnp.where(
        false_hit, hp_id, jnp.where(use_refr, next_t, hp_id)
    )

    # pdf = sampling_pdf_2 * pi / scattering_pdf (material.h:399-406, 641-648)
    samp_pdf = sampling.sampling_pdf_2(
        normal, direction, diffuse, n_eff, v_in, perfect, refracted & ~false_hit
    )
    scat_pdf = sampling.scattering_pdf(
        normal, direction, diffuse, v_in, refracted & ~false_hit
    )
    pdf = samp_pdf * jnp.pi / jnp.where(scat_pdf != 0, scat_pdf, 1.0)
    pdf = jnp.where(false_hit, 1.0, pdf)

    return ReflectionRecord(
        origin=hit_point,
        dir=direction,
        k=k,
        filter=filt,
        filter_2=filt2,
        perfect_dir=perfect,
        pdf=pdf,
        n=n_eff,
        diffuse=diffuse,
        reflected=reflected,
        refracted=refracted,
        false_hit=false_hit,
        entering=entering,
        bent=bent,
        sss=sss,
        next_mat=next_mat,
    )
