"""Unit + statistical tests for ops.sampling / ops.linalg.

The reference ships no tests (SURVEY.md §4); these derive expected values
from the closed-form math that `src/util/vector_util.h` implements.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_pathtracer_tpu.constants import MAX_PHONG_N_S
from gpu_pathtracer_tpu.ops import linalg, sampling

KEY = jax.random.PRNGKey(1984)
N = 200_000


def _uniforms(key, n=N, m=2):
    u = jax.random.uniform(key, (n, m))
    return [u[:, i] for i in range(m)]


class TestLinalg:
    def test_onb_orthonormal(self):
        z = jax.random.normal(KEY, (1000, 3))
        x, y, zu = linalg.onb_from_z(z)
        np.testing.assert_allclose(linalg.dot(x, y), 0.0, atol=1e-5)
        np.testing.assert_allclose(linalg.dot(x, zu), 0.0, atol=1e-5)
        np.testing.assert_allclose(linalg.length(x), 1.0, atol=1e-5)
        # right-handed: cross(x, y) == z
        np.testing.assert_allclose(
            np.asarray(linalg.cross(x, y)), np.asarray(zu), atol=1e-5
        )

    def test_onb_tangent(self):
        z = jnp.array([[0.0, 0.0, 1.0]])
        t = jnp.array([[1.0, 1.0, 0.0]])
        x, y, zu = linalg.onb_from_z_tangent(z, t)
        np.testing.assert_allclose(linalg.dot(x, zu), 0.0, atol=1e-6)
        np.testing.assert_allclose(x[0, 2], 0.0, atol=1e-6)

    def test_reflect(self):
        v = jnp.array([[1.0, -1.0, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        np.testing.assert_allclose(
            np.asarray(linalg.reflect(v, n)), [[1.0, 1.0, 0.0]], atol=1e-6
        )

    def test_de_nan(self):
        v = jnp.array([jnp.nan, jnp.inf, 1.0])
        np.testing.assert_allclose(np.asarray(linalg.de_nan(v)), [0.0, 0.0, 1.0])

    def test_rodrigues(self):
        v = jnp.array([[1.0, 0.0, 0.0]])
        axis = jnp.array([[0.0, 0.0, 1.0]])
        out = linalg.rodrigues_rotate(v, axis, jnp.array([jnp.pi / 2]))
        np.testing.assert_allclose(np.asarray(out), [[0.0, 1.0, 0.0]], atol=1e-6)


class TestSamplers:
    def test_cosine_hemisphere_moments(self):
        u1, u2 = _uniforms(KEY)
        d = sampling.sample_hemisphere_cos(u1, u2)
        assert np.all(np.asarray(d[:, 2]) >= 0)
        # E[cos(theta)] under cos-weighted pdf = 2/3
        np.testing.assert_allclose(np.mean(np.asarray(d[:, 2])), 2.0 / 3.0, atol=5e-3)
        np.testing.assert_allclose(np.mean(np.asarray(d[:, 0])), 0.0, atol=5e-3)

    def test_phong_lobe_moments(self):
        n = 10.0
        u1, u2 = _uniforms(KEY)
        d = sampling.sample_phong_lobe(n, u1, u2)
        # E[cos theta] for pdf (n+1)cos^n/2pi over hemisphere = (n+1)/(n+2)
        np.testing.assert_allclose(
            np.mean(np.asarray(d[:, 2])), (n + 1) / (n + 2), atol=5e-3
        )

    def test_phong_mirror_limit(self):
        u1, u2 = _uniforms(KEY, n=16)
        d = sampling.sample_phong_lobe(jnp.full(16, MAX_PHONG_N_S), u1, u2)
        np.testing.assert_allclose(np.asarray(d), np.tile([0, 0, 1.0], (16, 1)))

    def test_hemisphere_ref_in_upper_half(self):
        u1, u2 = _uniforms(KEY)
        d = sampling.sample_hemisphere_ref(u1, u2)
        assert np.all(np.asarray(d[:, 2]) >= -1e-6)
        np.testing.assert_allclose(np.asarray(linalg.length(d)), 1.0, atol=1e-5)

    def test_unit_circle(self):
        u1, u2 = _uniforms(KEY)
        d = sampling.sample_unit_circle(u1, u2)
        np.testing.assert_allclose(np.asarray(linalg.length(d)), 1.0, atol=1e-5)
        assert np.all(np.asarray(d[:, 2]) == 0)
        # sign flip produces both half-circles
        assert np.mean(np.asarray(d[:, 0]) > 0) == pytest.approx(0.5, abs=0.01)

    def test_hg_inverse_cdf_reference_sign_quirk(self):
        # The reference inversion uses -1/|2g| (vector_util.h:70), so the
        # sampled mean cos(theta) is -|g| for either sign of g.
        u = jax.random.uniform(KEY, (N,))
        for g in (0.6, -0.6):
            ct = sampling.henyey_greenstein_cos_theta(g, u)
            assert np.all(np.abs(np.asarray(ct)) <= 1.0 + 1e-5)
            np.testing.assert_allclose(np.mean(np.asarray(ct)), -abs(g), atol=5e-3)

    def test_hg_isotropic(self):
        u = jax.random.uniform(KEY, (N,))
        ct = sampling.henyey_greenstein_cos_theta(0.0, u)
        np.testing.assert_allclose(np.mean(np.asarray(ct)), 0.0, atol=5e-3)

    def test_hg_pdf_normalization(self):
        # integrate over sphere by MC: E_uniform[pdf] * 4pi == 1
        g = 0.4
        d1 = jnp.array([0.0, 0.0, 1.0])
        d2 = jax.random.normal(KEY, (N, 3))
        d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
        vals = sampling.henyey_greenstein_pdf(g, jnp.broadcast_to(d1, (N, 3)), d2)
        np.testing.assert_allclose(np.mean(np.asarray(vals)) * 4 * np.pi, 1.0, atol=2e-2)


class TestPdfs:
    def test_diffuse_pdf(self):
        n = jnp.array([[0.0, 0.0, 1.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        np.testing.assert_allclose(
            np.asarray(sampling.diffuse_sampling_pdf(n, d)), 1.0 / np.pi, atol=1e-6
        )

    def test_specular_pdf_normalized(self):
        # MC-integrate the phong pdf over the sphere: should be ~1
        n_exp = 8.0
        normal = jnp.array([0.0, 0.0, 1.0])
        perfect = jnp.array([0.0, 0.0, 1.0])
        in_dir = jnp.array([0.0, 0.0, -1.0])
        d = jax.random.normal(KEY, (N, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pdf = sampling.specular_sampling_pdf(
            jnp.broadcast_to(in_dir, (N, 3)),
            d,
            jnp.broadcast_to(normal, (N, 3)),
            jnp.broadcast_to(perfect, (N, 3)),
            jnp.full((N,), n_exp),
            jnp.zeros((N,), bool),
        )
        np.testing.assert_allclose(np.mean(np.asarray(pdf)) * 4 * np.pi, 1.0, atol=2e-2)

    def test_specular_pdf_side_gating(self):
        normal = jnp.array([[0.0, 0.0, 1.0]])
        perfect = jnp.array([[0.0, 0.0, 1.0]])
        in_dir = jnp.array([[0.0, 0.0, -1.0]])
        below = jnp.array([[0.0, 0.0, -1.0]])
        # reflection with out below surface -> 0
        pdf = sampling.specular_sampling_pdf(
            in_dir, below, normal, perfect, jnp.array([8.0]), jnp.array([False])
        )
        assert float(pdf[0]) == 0.0
        # refraction with out below surface (same side as in) -> nonzero gate
        pdf_r = sampling.specular_sampling_pdf(
            in_dir, below, normal, -normal, jnp.array([8.0]), jnp.array([True])
        )
        assert float(pdf_r[0]) > 0.0

    def test_schlick(self):
        # normal incidence air->glass: r0 = ((1-1.5)/(2.5))^2 = 0.04
        r = sampling.schlick_reflectance(jnp.array(1.0), 1.0, 1.5)
        np.testing.assert_allclose(float(r), 0.04, atol=1e-6)
        # grazing -> 1
        r = sampling.schlick_reflectance(jnp.array(0.0), 1.0, 1.5)
        np.testing.assert_allclose(float(r), 1.0, atol=1e-6)

    def test_phong_filter_energy_identity(self):
        """filter * (scattering/(pi*pdf)) == k*(n+2)/(n+1) for any sample."""
        n_exp = jnp.array([32.0])
        k = jnp.array([[0.8, 0.6, 0.4]])
        ideal = linalg.normalize(jnp.array([[0.3, 0.2, 0.9]]))
        out = linalg.normalize(jnp.array([[0.25, 0.25, 0.93]]))
        f = sampling.phong_filter(k, n_exp, ideal, out)
        normal = jnp.array([[0.0, 0.0, 1.0]])
        in_dir = jnp.array([[0.0, 0.0, -1.0]])
        pdf = sampling.specular_sampling_pdf(in_dir, out, normal, ideal, n_exp, jnp.array([False]))
        factor = 1.0 / (np.pi * np.asarray(pdf))
        np.testing.assert_allclose(
            np.asarray(f) * factor[..., None],
            np.asarray(k) * (32.0 + 2) / (32.0 + 1),
            rtol=1e-5,
        )

    def test_mirror_filter_pdf_cancellation(self):
        k = jnp.array([[1.0, 1.0, 1.0]])
        n_exp = jnp.array([MAX_PHONG_N_S])
        ideal = jnp.array([[0.0, 0.0, 1.0]])
        f = sampling.phong_filter(k, n_exp, ideal, ideal)
        normal = jnp.array([[0.0, 0.0, 1.0]])
        in_dir = jnp.array([[0.0, 0.0, -1.0]])
        pdf = sampling.specular_sampling_pdf(in_dir, ideal, normal, ideal, n_exp, jnp.array([False]))
        np.testing.assert_allclose(
            np.asarray(f)[0] / (np.pi * np.asarray(pdf)[0]), [1.0, 1.0, 1.0], rtol=1e-5
        )

    def test_silverman_normalization(self):
        # 2D kernel: integral over unit disk of 3/pi (1-r^2)^2 r dr dtheta = 1
        r = jnp.sqrt(jax.random.uniform(KEY, (N,)))
        vals = sampling.silverman_biweight(r)
        np.testing.assert_allclose(np.mean(np.asarray(vals)) * np.pi, 1.0, atol=1e-2)


class TestGenerateDirection:
    def test_modes(self):
        key = KEY
        u1 = jax.random.uniform(key, (4096,))
        u2 = jax.random.uniform(jax.random.fold_in(key, 1), (4096,))
        normal = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (4096, 3))
        main = jnp.broadcast_to(linalg.normalize(jnp.array([1.0, 1.0, 0.0])), (4096, 3))
        d0 = sampling.generate_direction(main, normal, jnp.zeros(4096, jnp.int32), 1.0, u1, u2)
        assert np.all(np.asarray(linalg.dot(d0, normal)) >= -1e-5)
        d1 = sampling.generate_direction(main, normal, jnp.ones(4096, jnp.int32), 1000.0, u1, u2)
        # tight lobe about main dir
        assert np.mean(np.asarray(linalg.dot(d1, main))) > 0.99

    def test_grad_flows_through_phong_filter(self):
        def loss(k):
            f = sampling.phong_filter(
                k, jnp.array([8.0]), jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[0.0, 0.1, 0.995]])
            )
            return jnp.sum(f)

        g = jax.grad(loss)(jnp.ones((1, 3)))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.all(np.asarray(g) > 0)


def test_mat3_vec():
    """Mat3 mat-vec (mat3.h:43): rotation matrix row form vs direct."""
    from gpu_pathtracer_tpu.ops import linalg

    m = linalg.mat3_from_rows(
        jnp.array([0.0, -1.0, 0.0]),
        jnp.array([1.0, 0.0, 0.0]),
        jnp.array([0.0, 0.0, 1.0]),
    )
    v = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(linalg.mat3_vec(m, v)), [-2.0, 1.0, 3.0], atol=1e-7
    )
    # batched
    mb = jnp.broadcast_to(m, (5, 3, 3))
    vb = jnp.broadcast_to(v, (5, 3))
    np.testing.assert_allclose(
        np.asarray(linalg.mat3_vec(mb, vb)),
        np.tile([-2.0, 1.0, 3.0], (5, 1)), atol=1e-7,
    )
