"""Vector math on batched (..., 3) arrays.

TPU-native re-derivation of the reference's math core
(`src/model/vector_and_matrix/vec3.h`, `src/model/cartesian_system.h`):
everything is vectorized over arbitrary leading batch axes and branch-free
(jnp.where instead of control flow) so it fuses under jit and inside Pallas.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_pathtracer_tpu.constants import SMALL_EPS


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Batched 3-vector dot product over the last axis."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3-vector cross product (explicit — avoids jnp.cross overhead)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def length(v: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=keepdims))


def normalize(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Unit vector; with eps > 0 degenerate inputs map to 0 instead of NaN."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    if eps > 0.0:
        inv = jnp.where(n2 > eps * eps, 1.0 / jnp.sqrt(jnp.maximum(n2, eps * eps)), 0.0)
        return v * inv
    return v / jnp.sqrt(n2)


def de_nan(v: jnp.ndarray) -> jnp.ndarray:
    """NaN/Inf scrub to zero (reference: vec3::de_nan, vec3.h:216)."""
    return jnp.where(jnp.isfinite(v), v, 0.0)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror v about plane with normal n (reference: vector_util.h:214)."""
    return v - 2.0 * dot(v, n, keepdims=True) * n


def onb_from_z(z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Orthonormal basis (x, y, z) from a z axis.

    Branch-free version of the reference's dominant-component construction
    (cartesian_system.h:27-42): pick the more stable of two candidate
    tangents depending on |z.x| vs |z.y|.
    """
    zu = normalize(z)
    zx, zy, zz = zu[..., 0], zu[..., 1], zu[..., 2]
    use_x = jnp.abs(zx) > jnp.abs(zy)
    inv_a = 1.0 / jnp.sqrt(jnp.where(use_x, zx * zx + zz * zz, zy * zy + zz * zz))
    x = jnp.where(
        use_x[..., None],
        jnp.stack([zz, jnp.zeros_like(zx), -zx], axis=-1),
        jnp.stack([jnp.zeros_like(zx), -zz, zy], axis=-1),
    ) * inv_a[..., None]
    y = normalize(cross(zu, x))
    return x, y, zu


def onb_from_z_tangent(
    z: jnp.ndarray, x_draft: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ONB from z axis plus a tangent draft (cartesian_system.h:44-53)."""
    zu = normalize(z)
    xd = normalize(x_draft)
    y = normalize(cross(zu, xd))
    x = normalize(cross(y, zu))
    return x, y, zu


def to_world(
    x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Rotate local-frame vector v into world frame and renormalize
    (cartesian_system.h:55-67 renormalizes its output)."""
    w = v[..., 0:1] * x + v[..., 1:2] * y + v[..., 2:3] * z
    return normalize(w)


def rodrigues_rotate(v: jnp.ndarray, axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation of v about unit axis by angle (vec3.h:71)."""
    k = normalize(axis)
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    return v * c + cross(k, v) * s + k * dot(k, v, keepdims=True) * (1.0 - c)


def mat3_from_rows(r0: jnp.ndarray, r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """3x3 matrix as a (..., 3, 3) array from its rows (Mat3, mat3.h:11)."""
    return jnp.stack([r0, r1, r2], axis=-2)


def mat3_vec(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Mat-vec product — the only Mat3 operation the reference uses
    (mat3.h:43): (..., 3, 3) @ (..., 3) -> (..., 3)."""
    return jnp.sum(m * v[..., None, :], axis=-1)


def max_dimension(v: jnp.ndarray) -> jnp.ndarray:
    """Index of the largest-magnitude component (vec3.h:180 usage in hit)."""
    return jnp.argmax(jnp.abs(v), axis=-1)


def safe_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > SMALL_EPS * SMALL_EPS, 1.0 / jnp.sqrt(jnp.maximum(x, 1e-30)), 0.0)


_TINY = 1e-12


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a finite gradient at x == 0 (sqrt'(0) = inf would turn any
    zero cotangent into NaN via 0*inf in the backward pass)."""
    return jnp.where(x > _TINY, jnp.sqrt(jnp.maximum(x, _TINY)), 0.0)


def safe_pow(base: jnp.ndarray, exp: jnp.ndarray) -> jnp.ndarray:
    """pow(base, exp) for base >= 0 with NaN-free gradients at base == 0.

    jnp.power's backward at base == 0 yields inf (d/dbase, exp < 1) and
    NaN (d/dexp = pow * log(0)); either poisons reverse-mode through the
    whole graph even under zero cotangents.  Matches pow semantics at 0:
    0^0 = 1, 0^e = 0 (e > 0).
    """
    exp = jnp.asarray(exp)
    out = jnp.power(jnp.maximum(base, _TINY), exp)
    at_zero = jnp.where(jnp.equal(exp, 0.0), jnp.ones_like(out), jnp.zeros_like(out))
    return jnp.where(base > _TINY, out, at_zero)
