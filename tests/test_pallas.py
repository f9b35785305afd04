"""Pallas closest-hit kernel vs the dense XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_pathtracer_tpu.ops import intersect, pallas_trace, trace


def _random_tris(key, n, lo=-2.0, hi=2.0):
    base = jax.random.uniform(key, (n, 1, 3), minval=lo, maxval=hi)
    edge = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2, 3), minval=-0.7, maxval=0.7)
    tris = jnp.concatenate([base, base + edge], axis=1)
    return tris


@pytest.mark.parametrize("n,r", [(50, 64), (700, 256), (1300, 512)])
def test_pallas_matches_dense(n, r):
    key = jax.random.key(n + r)
    tris = _random_tris(key, n)
    tol = intersect.triangle_tolerance(tris)
    valid = jnp.ones((n,), bool)

    o = jax.random.uniform(jax.random.fold_in(key, 2), (r, 3), minval=-3, maxval=3)
    d = jax.random.normal(jax.random.fold_in(key, 3), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    t_ref, slot_ref, _, hit_ref = trace.closest_hit_dense(tris, tol, valid, o, d)

    cols, aabb = pallas_trace.pack_tri_cols(tris, tol, valid)
    t_p, slot_p, hit_p = pallas_trace.closest_hit_pallas(
        cols, aabb, o, d, interpret=True
    )

    np.testing.assert_array_equal(np.asarray(hit_ref), np.asarray(hit_p))
    np.testing.assert_array_equal(np.asarray(slot_ref), np.asarray(slot_p))
    h = np.asarray(hit_ref)
    np.testing.assert_allclose(
        np.asarray(t_ref)[h], np.asarray(t_p)[h], rtol=1e-5, atol=1e-6
    )


def test_pallas_t_max_and_padding():
    key = jax.random.key(7)
    n, r = 130, 100  # both non-multiples of the block sizes
    tris = _random_tris(key, n)
    tol = intersect.triangle_tolerance(tris)
    valid = jnp.ones((n,), bool).at[5].set(False)

    o = jnp.zeros((r, 3))
    d = jax.random.normal(jax.random.fold_in(key, 1), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jax.random.uniform(jax.random.fold_in(key, 2), (r,), minval=0.5, maxval=4.0)

    t_ref, slot_ref, _, hit_ref = trace.closest_hit_dense(tris, tol, valid, o, d, t_max)
    cols, aabb = pallas_trace.pack_tri_cols(tris, tol, valid)
    t_p, slot_p, hit_p = pallas_trace.closest_hit_pallas(
        cols, aabb, o, d, t_max, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(hit_ref), np.asarray(hit_p))
    np.testing.assert_array_equal(np.asarray(slot_ref), np.asarray(slot_p))


def test_pallas_sorted_live_mask(monkeypatch):
    """closest_hit_pallas_sorted with a live mask: live rays match the dense
    oracle, dead rays (t-budget -1, sorted into dead blocks) return miss."""
    from types import SimpleNamespace

    monkeypatch.setattr(trace, "RAY_SORT_MIN", 64)
    key = jax.random.key(11)
    n, r = 1300, 384
    tris = _random_tris(key, n)
    tol = intersect.triangle_tolerance(tris)
    valid = jnp.ones((n,), bool)
    cols, aabb = pallas_trace.pack_tri_cols(tris, tol, valid)
    g = SimpleNamespace(
        p=tris, tol=tol, valid=valid, tri_cols=cols, tile_aabb=aabb
    )

    o = jax.random.uniform(jax.random.fold_in(key, 2), (r, 3), minval=-3, maxval=3)
    d = jax.random.normal(jax.random.fold_in(key, 3), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    live = jax.random.bernoulli(jax.random.fold_in(key, 4), 0.6, (r,))

    t_ref, slot_ref, _, hit_ref = trace.closest_hit_dense(tris, tol, valid, o, d)
    t_s, slot_s, hit_s = trace.closest_hit_pallas_sorted(g, o, d, live=live)

    lv = np.asarray(live)
    np.testing.assert_array_equal(np.asarray(hit_ref)[lv], np.asarray(hit_s)[lv])
    np.testing.assert_array_equal(np.asarray(slot_ref)[lv], np.asarray(slot_s)[lv])
    np.testing.assert_allclose(
        np.asarray(t_ref)[lv & np.asarray(hit_ref)],
        np.asarray(t_s)[lv & np.asarray(hit_ref)],
        rtol=1e-5, atol=1e-6,
    )
    assert not np.asarray(hit_s)[~lv].any()
    assert (np.asarray(slot_s)[~lv] == -1).all()

    # without a mask the sorted path must equal the dense oracle exactly
    t_a, slot_a, hit_a = trace.closest_hit_pallas_sorted(g, o, d)
    np.testing.assert_array_equal(np.asarray(hit_ref), np.asarray(hit_a))
    np.testing.assert_array_equal(np.asarray(slot_ref), np.asarray(slot_a))


def test_mxu_prefilter_bit_identical():
    """GPT_TPU_MXU path: the MXU edge-test prefilter must be bit-identical
    to the unfiltered big-path kernel (the margin provably never culls a
    pair the exact Woop test would accept — pack_edge_cols docstring)."""
    key = jax.random.key(3)
    n, r = 1300, 384
    tris = _random_tris(key, n)
    tol = intersect.triangle_tolerance(tris)
    valid = jnp.ones((n,), bool).at[17].set(False)
    o = jax.random.uniform(jax.random.fold_in(key, 2), (r, 3), minval=-3, maxval=3)
    d = jax.random.normal(jax.random.fold_in(key, 3), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.where(jnp.arange(r) % 3 == 0, 2.0, jnp.inf)

    cols, aabb = pallas_trace.pack_tri_cols(tris, tol, valid)
    ecols = pallas_trace.pack_edge_cols(tris, valid)
    assert ecols.shape == (cols.shape[0], 16, 3 * cols.shape[2])
    t0, s0, h0 = pallas_trace.closest_hit_pallas(
        cols, aabb, o, d, t_max, interpret=True, big=True
    )
    t1, s1, h1 = pallas_trace.closest_hit_pallas(
        cols, aabb, o, d, t_max, interpret=True, big=True, edge_cols=ecols
    )
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


@pytest.mark.parametrize("n,r,big", [(700, 256, False), (1300, 300, True)])
def test_anyhit_window_matches_closest_derived(n, r, big):
    """The any-hit window bits must equal the bits derived from the dense
    closest hit: ∃ hit with t < near ⇔ closest t < near (same for <= far)."""
    key = jax.random.key(100 + n + r)
    tris = _random_tris(key, n)
    tol = intersect.triangle_tolerance(tris)
    valid = jnp.ones((n,), bool)

    o = jax.random.uniform(jax.random.fold_in(key, 2), (r, 3), minval=-3, maxval=3)
    d = jax.random.normal(jax.random.fold_in(key, 3), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_near = jax.random.uniform(jax.random.fold_in(key, 4), (r,), minval=0.2, maxval=5.0)

    t_ref, _, _, hit_ref = trace.closest_hit_dense(tris, tol, valid, o, d)
    occ_near_ref = np.asarray(hit_ref & (t_ref < t_near))
    occ_far_ref = np.asarray(hit_ref)  # t_far=inf: far bit == any hit at all

    cols, aabb = pallas_trace.pack_tri_cols(tris, tol, valid)
    occ_near, occ_far = pallas_trace.occluded_window_pallas(
        cols, aabb, o, d, t_near, interpret=True, big=big
    )
    np.testing.assert_array_equal(occ_near_ref, np.asarray(occ_near))
    np.testing.assert_array_equal(occ_far_ref, np.asarray(occ_far))


def test_occluded_window_dispatch_live_mask():
    """trace.occluded_window fallback path: live=False rays report no hits;
    live rays match the closest-hit-derived bits."""
    from types import SimpleNamespace

    key = jax.random.key(21)
    n, r = 900, 512
    tris = _random_tris(key, n)
    tol = intersect.triangle_tolerance(tris)
    valid = jnp.ones((n,), bool)
    cols, aabb = pallas_trace.pack_tri_cols(tris, tol, valid)
    g = SimpleNamespace(p=tris, tol=tol, valid=valid, tri_cols=cols, tile_aabb=aabb)

    o = jax.random.uniform(jax.random.fold_in(key, 2), (r, 3), minval=-3, maxval=3)
    d = jax.random.normal(jax.random.fold_in(key, 3), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_near = jax.random.uniform(jax.random.fold_in(key, 4), (r,), minval=0.2, maxval=5.0)
    live = jax.random.bernoulli(jax.random.fold_in(key, 5), 0.7, (r,))

    occ_n, occ_f = trace.occluded_window(g, o, d, t_near, live=live)
    t_ref, _, _, hit_ref = trace.closest_hit_dense(tris, tol, valid, o, d)
    lv = np.asarray(live)
    np.testing.assert_array_equal(
        np.asarray(hit_ref & (t_ref < t_near))[lv], np.asarray(occ_n)[lv]
    )
    np.testing.assert_array_equal(np.asarray(hit_ref)[lv], np.asarray(occ_f)[lv])
    assert not np.asarray(occ_n)[~lv].any()
    assert not np.asarray(occ_f)[~lv].any()
