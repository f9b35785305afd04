"""ops/bounding_sphere vs a direct transcription of the reference's
arithmetic (src/model/grid/bounding_sphere.h, bounding_box.h:278-312)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpu_pathtracer_tpu.ops import bounding_sphere as bs


def ref_union(c1, r1, c2, r2):
    """Line-for-line NumPy transcription of compute_bs_union
    (bounding_sphere.h:72-95)."""
    u = c2 - c1
    u = u / np.linalg.norm(u)
    p1 = c1 - r1 * u
    p2 = c1 + r1 * u
    p3 = c2 - r2 * u
    p4 = c2 + r2 * u
    t_min = -min(np.linalg.norm(p1 - c1), np.linalg.norm(p3 - c1))
    t_max = max(np.linalg.norm(p2 - c1), np.linalg.norm(p4 - c1))
    r = (-t_min + t_max) / 2
    center = (c1 + t_min * u + c1 + t_max * u) / 2
    return center, r


def test_is_inside_matches_distance():
    rng = np.random.default_rng(0)
    c = rng.standard_normal((64, 3)).astype(np.float32)
    r = rng.uniform(0.1, 2.0, (64,)).astype(np.float32)
    p = rng.standard_normal((64, 3)).astype(np.float32)
    got = np.asarray(bs.is_inside(jnp.asarray(c), jnp.asarray(r), jnp.asarray(p)))
    want = np.linalg.norm(p - c, axis=-1) <= r
    np.testing.assert_array_equal(got, want)
    # squared form agrees away from ulp edges
    got_sq = np.asarray(
        bs.is_inside_sq(jnp.asarray(c), jnp.asarray(r), jnp.asarray(p))
    )
    np.testing.assert_array_equal(got_sq, want)


def test_is_inside_disc_gates_on_normal():
    """bounding_sphere.h:58-69: also requires |dot(p - c, n)| <= 0.1 r."""
    c = jnp.zeros((3,))
    n = jnp.array([0.0, 0.0, 1.0])
    r = jnp.asarray(1.0)
    on_plane = jnp.array([0.5, 0.0, 0.05])  # inside sphere, |z| <= 0.1
    off_plane = jnp.array([0.5, 0.0, 0.5])  # inside sphere, |z| > 0.1
    outside = jnp.array([2.0, 0.0, 0.0])
    assert bool(bs.is_inside_disc(c, r, on_plane, n))
    assert not bool(bs.is_inside_disc(c, r, off_plane, n))
    assert not bool(bs.is_inside_disc(c, r, outside, n))
    # plain is_inside accepts both in-sphere points
    assert bool(bs.is_inside(c, r, off_plane))


def test_sphere_union_matches_reference_arithmetic():
    rng = np.random.default_rng(1)
    for _ in range(50):
        c1 = rng.standard_normal(3).astype(np.float32)
        c2 = rng.standard_normal(3).astype(np.float32)
        r1 = np.float32(rng.uniform(0.05, 1.5))
        r2 = np.float32(rng.uniform(0.05, 1.5))
        want_c, want_r = ref_union(c1, r1, c2, r2)
        got_c, got_r = bs.sphere_union(
            jnp.asarray(c1), jnp.asarray(r1), jnp.asarray(c2), jnp.asarray(r2)
        )
        np.testing.assert_allclose(np.asarray(got_c), want_c, atol=1e-5)
        np.testing.assert_allclose(float(got_r), want_r, atol=1e-5)


def test_sphere_union_disjoint_contains_both():
    """For disjoint spheres the reference construction IS the exact hull:
    every point of both spheres lies in the union sphere."""
    rng = np.random.default_rng(2)
    for _ in range(20):
        c1 = rng.standard_normal(3).astype(np.float32)
        c2 = c1 + rng.standard_normal(3).astype(np.float32) * 4.0
        r1 = np.float32(rng.uniform(0.05, 0.5))
        r2 = np.float32(rng.uniform(0.05, 0.5))
        if np.linalg.norm(c2 - c1) <= r1 + r2:
            continue
        uc, ur = bs.sphere_union(
            jnp.asarray(c1), jnp.asarray(r1), jnp.asarray(c2), jnp.asarray(r2)
        )
        uc, ur = np.asarray(uc), float(ur)
        assert np.linalg.norm(c1 - uc) + r1 <= ur + 1e-4
        assert np.linalg.norm(c2 - uc) + r2 <= ur + 1e-4


def test_sphere_union_coincident_centers_fallback():
    c = jnp.array([1.0, 2.0, 3.0])
    uc, ur = bs.sphere_union(c, jnp.asarray(0.5), c, jnp.asarray(1.5))
    assert np.isfinite(np.asarray(uc)).all() and np.isfinite(float(ur))
    np.testing.assert_allclose(np.asarray(uc), np.asarray(c))
    assert float(ur) == 1.5


def test_sphere_box_intersect_reference_semantics():
    """bounding_box.h:278-312 — per-axis expansion, NOT the exact
    closest-point test: a sphere just outside a corner (inside the expanded
    box, outside the true Minkowski sum) must still report True."""
    lo = jnp.zeros((3,))
    hi = jnp.ones((3,))
    # clear hit
    assert bool(bs.sphere_box_intersect(lo, hi, jnp.array([0.5, 0.5, 0.5]),
                                        jnp.asarray(0.1)))
    # clear miss along one axis
    assert not bool(bs.sphere_box_intersect(lo, hi, jnp.array([2.0, 0.5, 0.5]),
                                            jnp.asarray(0.5)))
    # corner case: center at (1+d, 1+d, 1+d) with d = 0.08, r = 0.1:
    # per-axis distance 0.58 <= 0.5 + 0.1 -> reference True, even though the
    # true corner distance 0.1386 > r
    d = 0.08
    c = jnp.array([1.0 + d, 1.0 + d, 1.0 + d])
    assert bool(bs.sphere_box_intersect(lo, hi, c, jnp.asarray(0.1)))
    assert np.sqrt(3 * d * d) > 0.1  # confirms it IS the conservative case


def test_batched_broadcasting():
    """(R, S) gather-shaped broadcasting, the actual consumption pattern
    in render/sss.py and render/sppm.py."""
    rng = np.random.default_rng(3)
    centers = jnp.asarray(rng.standard_normal((8, 1, 3)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(0.5, 1.0, (8, 1)).astype(np.float32))
    pts = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32))
    out = bs.is_inside(centers, radii, pts)
    assert out.shape == (8, 16)
    out2 = bs.is_inside_sq(centers, radii, pts)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
