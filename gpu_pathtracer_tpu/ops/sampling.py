"""Samplers, PDFs and BRDF weighting filters.

Re-derives every sampling routine of the reference's `src/util/vector_util.h`
as pure, batched, branch-free JAX functions.  All samplers take explicit
uniform random numbers (counter-based RNG discipline — the caller derives
them from `jax.random` keys folded over (pixel, sample, bounce, pass)), so
they are deterministic, shard-invariant and reusable inside Pallas kernels.

Conventions: directions are unit (..., 3) arrays; local-frame samplers return
vectors in a frame whose +z is the "main" axis, to be rotated with
`linalg.to_world`.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_pathtracer_tpu.constants import MAX_PHONG_N_S, SMALL_EPS
from gpu_pathtracer_tpu.ops import linalg

_PI = jnp.pi


def n_s_too_large(n: jnp.ndarray) -> jnp.ndarray:
    """Mirror-limit test for the Phong exponent (vector_util.h:48-50)."""
    n = jnp.asarray(n)
    return (jnp.abs(n - MAX_PHONG_N_S) < SMALL_EPS) | (n >= MAX_PHONG_N_S)


def silverman_biweight(x: jnp.ndarray) -> jnp.ndarray:
    """Silverman biweight kernel 3/pi (1-x^2)^2 (vector_util.h:52)."""
    t = 1.0 - x * x
    return (3.0 / _PI) * t * t


# ---------------------------------------------------------------------------
# Henyey-Greenstein phase function
# ---------------------------------------------------------------------------

def henyey_greenstein_pdf(g: jnp.ndarray, dir_1: jnp.ndarray, dir_2: jnp.ndarray) -> jnp.ndarray:
    """HG phase function value between two directions (vector_util.h:56-63)."""
    cos_theta = linalg.dot(linalg.normalize(dir_1, SMALL_EPS), linalg.normalize(dir_2, SMALL_EPS))
    cos_theta = jnp.where(jnp.isnan(cos_theta), 0.0, cos_theta)
    denom = linalg.safe_pow(jnp.maximum(1.0 + g * g - 2.0 * g * cos_theta, 1e-6), 1.5)
    return (1.0 / (4.0 * _PI)) * (1.0 - g * g) / denom


def henyey_greenstein_cos_theta(g: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF sample of the HG scattering angle (vector_util.h:65-73).

    Reproduced faithfully including the reference's sign quirk: it uses
    -1/|2g| where the textbook inversion uses +1/(2g), so for g > 0 the
    sampled distribution is HG(-g) (mean cos(theta) = -|g|).
    """
    iso = 1.0 - 2.0 * u
    g_safe = jnp.where(jnp.abs(g) < SMALL_EPS, 1.0, g)
    frac = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u)
    aniso = (-1.0 / jnp.abs(2.0 * g_safe)) * (1.0 + g_safe * g_safe - frac * frac)
    return jnp.where(jnp.abs(g) < SMALL_EPS, iso, aniso)


# ---------------------------------------------------------------------------
# Local-frame direction samplers (frame: +z = main axis)
# ---------------------------------------------------------------------------

def sample_hemisphere_cos(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample, pdf = cos(theta)/pi
    (vector_util.h:274-288)."""
    z = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    phi = 2.0 * _PI * u1
    r = jnp.sqrt(jnp.maximum(u2, 0.0))
    v = jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, z], axis=-1)
    return linalg.normalize(v, SMALL_EPS)


def sample_hemisphere_ref(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """The reference's "uniform hemisphere" sampler (vector_util.h:264-272).

    NOTE: it draws sin(theta) uniformly (NOT solid-angle-uniform); reproduced
    faithfully because photon emission in the SPPM pass depends on it.
    """
    sin_theta = u1
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - sin_theta * sin_theta, 0.0))
    phi = u2 * 2.0 * _PI
    v = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    return linalg.normalize(v, SMALL_EPS)


def sample_phong_lobe(n: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """(n+1)-power cosine lobe about +z (vector_util.h:248-262);
    mirror-limit exponents return exactly +z."""
    n_arr = jnp.asarray(n)
    mirror = n_s_too_large(n_arr)
    n_safe = jnp.where(mirror, 1.0, n_arr)
    r1 = jnp.maximum(u1, 1e-12)
    z = jnp.power(r1, 1.0 / (n_safe + 1.0))
    s = jnp.sqrt(jnp.maximum(1.0 - jnp.power(r1, 2.0 / (n_safe + 1.0)), 0.0))
    phi = 2.0 * _PI * u2
    v = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
    v = linalg.normalize(v, SMALL_EPS)
    mirror_v = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], v.dtype), v.shape)
    return jnp.where(mirror[..., None], mirror_v, v)


def sample_unit_circle(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Point on the unit circle rim in the z=0 plane (vector_util.h:290-300).

    The reference's thin-lens "disk" sampler actually samples the rim with a
    sign flip from the second uniform; reproduced faithfully for DoF parity.
    """
    sin_theta = 2.0 * u1 - 1.0
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - sin_theta * sin_theta, 0.0))
    cos_theta = jnp.where(u2 <= 0.5, -cos_theta, cos_theta)
    v = jnp.stack([cos_theta, sin_theta, jnp.zeros_like(sin_theta)], axis=-1)
    return linalg.normalize(v, SMALL_EPS)


# ---------------------------------------------------------------------------
# PDFs
# ---------------------------------------------------------------------------

def diffuse_sampling_pdf(normal: jnp.ndarray, out_dir: jnp.ndarray) -> jnp.ndarray:
    """cos(theta)/pi clamped at 0 (vector_util.h:201-205)."""
    return jnp.maximum(0.0, linalg.dot(normal, out_dir) / _PI)


def _same_side(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    return ((d1 >= 0) & (d2 >= 0)) | ((d1 <= 0) & (d2 <= 0))


def _opposite_side(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    return ((d1 >= 0) & (d2 <= 0)) | ((d1 <= 0) & (d2 >= 0))


def specular_sampling_pdf(
    in_dir: jnp.ndarray,
    out_dir: jnp.ndarray,
    normal: jnp.ndarray,
    perfect_out: jnp.ndarray,
    n: jnp.ndarray,
    refracted: jnp.ndarray,
) -> jnp.ndarray:
    """Phong-lobe solid-angle pdf (n+1) cos^n / 2pi with hemisphere gating
    (vector_util.h:75-121): reflections require in/out on opposite sides of
    the surface, refractions on the same side; mirror limit -> MAX_N_S/2pi."""
    d1 = linalg.dot(in_dir, normal)
    d2 = linalg.dot(normal, out_dir)
    valid = jnp.where(refracted, _same_side(d1, d2), _opposite_side(d1, d2))
    mirror = n_s_too_large(n)
    n_safe = jnp.where(mirror, 1.0, n)
    cos_a = jnp.maximum(0.0, linalg.dot(perfect_out, out_dir))
    lobe = (n_safe + 1.0) * linalg.safe_pow(cos_a, n_safe) / (2.0 * _PI)
    pdf = jnp.where(mirror, MAX_PHONG_N_S / (2.0 * _PI), lobe)
    return jnp.where(valid, pdf, 0.0)


def specular_sampling_pdf_2(
    in_dir: jnp.ndarray,
    out_dir: jnp.ndarray,
    normal: jnp.ndarray,
    perfect_out: jnp.ndarray,
    n: jnp.ndarray,
    refracted: jnp.ndarray,
) -> jnp.ndarray:
    """Unnormalized variant cos^n / 2pi (vector_util.h:123-159);
    mirror limit -> 1/2pi."""
    d1 = linalg.dot(in_dir, normal)
    d2 = linalg.dot(normal, out_dir)
    valid = jnp.where(refracted, _same_side(d1, d2), _opposite_side(d1, d2))
    mirror = n_s_too_large(n)
    n_safe = jnp.where(mirror, 1.0, n)
    cos_a = jnp.maximum(0.0, linalg.dot(perfect_out, out_dir))
    lobe = linalg.safe_pow(cos_a, n_safe) / (2.0 * _PI)
    pdf = jnp.where(mirror, 1.0 / (2.0 * _PI), lobe)
    return jnp.where(valid, pdf, 0.0)


def scattering_pdf(
    normal: jnp.ndarray,
    next_dir: jnp.ndarray,
    diffuse: jnp.ndarray,
    coming_dir: jnp.ndarray,
    refracted: jnp.ndarray,
) -> jnp.ndarray:
    """The reference's "scattering pdf" (vector_util.h:161-175): cos term for
    diffuse, 0/1 side-consistency indicator for specular lobes."""
    diff_val = jnp.maximum(0.0, linalg.dot(normal, next_dir))
    d1 = linalg.dot(coming_dir, normal)
    d2 = linalg.dot(next_dir, normal)
    spec_ok = jnp.where(refracted, _same_side(d1, d2), _opposite_side(d1, d2))
    return jnp.where(diffuse, diff_val, spec_ok.astype(diff_val.dtype))


def sampling_pdf_2(
    normal: jnp.ndarray,
    next_dir: jnp.ndarray,
    diffuse: jnp.ndarray,
    n: jnp.ndarray,
    coming_dir: jnp.ndarray,
    perfect_next_dir: jnp.ndarray,
    refracted: jnp.ndarray,
) -> jnp.ndarray:
    """Mixture dispatcher (vector_util.h:177-189)."""
    return jnp.where(
        diffuse,
        diffuse_sampling_pdf(normal, next_dir),
        specular_sampling_pdf_2(coming_dir, next_dir, normal, perfect_next_dir, n, refracted),
    )


def schlick_reflectance(cos_theta: jnp.ndarray, n_1: jnp.ndarray, n_2: jnp.ndarray) -> jnp.ndarray:
    """Schlick Fresnel approximation (vector_util.h:207-212)."""
    r0 = jnp.square((n_1 - n_2) / (n_1 + n_2))
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return r0 + (1.0 - r0) * m * m * m * m * m


# ---------------------------------------------------------------------------
# Modified-Phong BRDF weighting filters
# ---------------------------------------------------------------------------

def phong_filter(
    k: jnp.ndarray, n: jnp.ndarray, ideal_dir: jnp.ndarray, out_dir: jnp.ndarray
) -> jnp.ndarray:
    """k (n+2)/2 cos^n weighting (vector_util.h:218-228); mirror limit ->
    k * MAX_N_S / 2 (cancelled downstream by the matching pdf)."""
    mirror = n_s_too_large(n)
    n_safe = jnp.where(mirror, 1.0, n)
    cos_a = jnp.maximum(0.0, linalg.dot(ideal_dir, out_dir, keepdims=True))
    w = (n_safe[..., None] + 2.0) * linalg.safe_pow(cos_a, n_safe[..., None]) / 2.0
    w = jnp.where(mirror[..., None], MAX_PHONG_N_S / 2.0, w)
    return k * w


def phong_filter_2(
    k: jnp.ndarray, n: jnp.ndarray, ideal_dir: jnp.ndarray, out_dir: jnp.ndarray
) -> jnp.ndarray:
    """Unnormalized k cos^n variant (vector_util.h:230-246);
    mirror limit -> k."""
    mirror = n_s_too_large(n)
    n_safe = jnp.where(mirror, 1.0, n)
    cos_a = jnp.maximum(0.0, linalg.dot(ideal_dir, out_dir, keepdims=True))
    w = linalg.safe_pow(cos_a, n_safe[..., None])
    w = jnp.where(mirror[..., None], 1.0, w)
    return k * w


# ---------------------------------------------------------------------------
# World-frame ray direction generation (reference: ray_operations.h:17-36)
# ---------------------------------------------------------------------------

def generate_direction(
    main_dir: jnp.ndarray,
    normal: jnp.ndarray,
    mode: jnp.ndarray,
    n: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
) -> jnp.ndarray:
    """Sample an outgoing world-space direction.

    mode 0: cosine hemisphere about `normal`;
    mode 1: Phong lobe about `main_dir`;
    mode 2: reference-"uniform" hemisphere about `normal`.
    Branch-free over batched `mode`.
    """
    mode = jnp.asarray(mode)
    local_cos = sample_hemisphere_cos(u1, u2)
    local_phong = sample_phong_lobe(n, u1, u2)
    local_uni = sample_hemisphere_ref(u1, u2)
    local = jnp.where(
        (mode == 0)[..., None],
        local_cos,
        jnp.where((mode == 1)[..., None], local_phong, local_uni),
    )
    axis = jnp.where((mode == 1)[..., None], main_dir, normal)
    x, y, z = linalg.onb_from_z(axis)
    return linalg.to_world(x, y, z, local)
