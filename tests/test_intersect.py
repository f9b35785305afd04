"""Watertight triangle intersection tests (vs. naive Möller-Trumbore)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpu_pathtracer_tpu.ops import intersect

KEY = jax.random.PRNGKey(3)


def _moller_trumbore_np(o, d, v0, v1, v2):
    e1, e2 = v1 - v0, v2 - v0
    p = np.cross(d, e2)
    det = np.dot(e1, p)
    if abs(det) < 1e-12:
        return None
    inv = 1.0 / det
    s = o - v0
    u = np.dot(s, p) * inv
    if u < 0 or u > 1:
        return None
    q = np.cross(s, e1)
    v = np.dot(d, q) * inv
    if v < 0 or u + v > 1:
        return None
    t = np.dot(e2, q) * inv
    return t if t > 1e-5 else None


class TestIntersect:
    def test_simple_hit(self):
        tri = jnp.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
        o = jnp.array([[0.2, 0.2, 1.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        tol = intersect.triangle_tolerance(tri)
        t, bary, hit = intersect.intersect_tris(o, d, tri[None], tol[None], jnp.inf)
        assert bool(hit[0, 0])
        np.testing.assert_allclose(float(t[0, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bary[0, 0]), [0.6, 0.2, 0.2], atol=1e-5)

    def test_miss_outside(self):
        tri = jnp.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
        o = jnp.array([[0.9, 0.9, 1.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        tol = intersect.triangle_tolerance(tri)
        _, _, hit = intersect.intersect_tris(o, d, tri[None], tol[None], jnp.inf)
        assert not bool(hit[0, 0])

    def test_matches_moller_trumbore_random(self):
        n_rays, n_tris = 200, 32
        k1, k2, k3 = jax.random.split(KEY, 3)
        tris = jax.random.uniform(k1, (n_tris, 3, 3), minval=-1, maxval=1)
        o = jax.random.uniform(k2, (n_rays, 3), minval=-2, maxval=2)
        d = jax.random.normal(k3, (n_rays, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        tol = intersect.triangle_tolerance(tris)
        t, idx, bary, hit = intersect.closest_hit_brute(o, d, tris, tol)

        o_np, d_np, tris_np = map(np.asarray, (o, d, tris))
        for r in range(n_rays):
            best_t, best_i = np.inf, -1
            for i in range(n_tris):
                ti = _moller_trumbore_np(o_np[r], d_np[r], *tris_np[i])
                if ti is not None and ti < best_t:
                    best_t, best_i = ti, i
            if best_i >= 0 and bool(hit[r]):
                np.testing.assert_allclose(float(t[r]), best_t, rtol=1e-3)
            # watertight vs naive may differ only at exact edges; tolerate
            # disagreement only when the naive t is near an edge
            if best_i >= 0:
                assert bool(hit[r]) or min(
                    abs(u) for u in (0,)
                ) is not None  # never trip: naive hit implies our hit below
                assert bool(hit[r])

    def test_edge_is_watertight(self):
        # two triangles sharing edge x in [0,1] at y=0.5: a ray through the
        # shared edge must hit at least one of them
        tris = jnp.array(
            [
                [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.5, 0.0]],
                [[0.0, 0.0, 0.0], [1.0, 0.5, 0.0], [0.0, 0.5, 0.0]],
            ]
        )
        # rays exactly through the shared edge (0,0,0)-(1,0.5,0)
        s = jnp.linspace(0.05, 0.95, 7)
        o = jnp.stack([s, 0.5 * s, jnp.ones_like(s)], axis=-1)
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (7, 3))
        tol = intersect.triangle_tolerance(tris)
        _, _, hit = intersect.intersect_tris(o, d, tris[None], tol[None], jnp.inf)
        assert bool(jnp.all(jnp.any(hit, axis=-1))), np.asarray(hit)

    def test_vertex_is_watertight(self):
        tris = jnp.array(
            [
                [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.5, 1.0, 0.0]],
            ]
        )
        o = jnp.array([[0.5, 1.0, 1.0]])  # exactly through apex vertex
        d = jnp.array([[0.0, 0.0, -1.0]])
        tol = intersect.triangle_tolerance(tris)
        _, _, hit = intersect.intersect_tris(o, d, tris[None], tol[None], jnp.inf)
        assert bool(jnp.any(hit))

    def test_t_max_respected(self):
        tri = jnp.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
        o = jnp.array([[0.2, 0.2, 1.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        tol = intersect.triangle_tolerance(tri)
        _, _, hit = intersect.intersect_tris(o, d, tri[None], tol[None], 0.5)
        assert not bool(hit[0, 0])

    def test_differentiable_wrt_vertices(self):
        def f(tris):
            o = jnp.array([[0.2, 0.2, 1.0]])
            d = jnp.array([[0.0, 0.0, -1.0]])
            tol = intersect.triangle_tolerance(tris)
            t, _, _, _ = intersect.closest_hit_brute(o, d, tris, tol)
            return jnp.sum(t)

        tris = jnp.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0.0]]])
        g = jax.grad(f)(tris)
        assert np.all(np.isfinite(np.asarray(g)))
        # moving the triangle plane towards the ray origin (z+) reduces t by 1
        np.testing.assert_allclose(float(g.sum()), -1.0, atol=1e-4)

    def test_area_and_tolerance(self):
        tri = jnp.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
        np.testing.assert_allclose(float(intersect.triangle_area(tri)[0]), 0.5, rtol=1e-5)
        np.testing.assert_allclose(float(intersect.triangle_tolerance(tri)[0]), 1e-5)
        small = tri * 1e-4
        np.testing.assert_allclose(
            float(intersect.triangle_tolerance(small)[0]), 1e-4 / 100, rtol=1e-4
        )
