"""LBVH structural invariants + traversal equivalence vs. brute force.

Generalizes the reference's `check` validation kernel (bvh_building.h:187)
into real asserts: topology, containment, threaded-DFS coverage; then
cross-checks traversal against the all-pairs intersector.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_pathtracer_tpu.ops import bvh as bvh_mod
from gpu_pathtracer_tpu.ops import intersect
from gpu_pathtracer_tpu.utils import obj_io, testscenes

KEY = jax.random.PRNGKey(11)


def _random_tris(key, n, spread=2.0):
    centers = jax.random.uniform(key, (n, 1, 3), minval=-spread, maxval=spread)
    offsets = jax.random.normal(jax.random.fold_in(key, 1), (n, 3, 3)) * 0.1
    return centers + offsets


def _build(tris, leaf_size=4):
    lo = jnp.min(tris, axis=1)
    hi = jnp.max(tris, axis=1)
    tol = intersect.triangle_tolerance(tris)[:, None]
    b = bvh_mod.build_bvh(lo - tol, hi + tol, leaf_size=leaf_size)
    # leaf-sorted triangle blocks (pad rows become degenerate/far)
    slot = np.asarray(b.order)
    tris_sorted = np.where(
        (slot >= 0)[:, None, None],
        np.asarray(tris)[np.maximum(slot, 0)],
        np.full((1, 3, 3), 1e30, np.float32),
    )
    tol_sorted = np.where(slot >= 0, np.asarray(intersect.triangle_tolerance(jnp.asarray(tris_sorted))), 0.0)
    return b, jnp.asarray(tris_sorted), jnp.asarray(tol_sorted)


class TestBuildInvariants:
    @pytest.mark.parametrize("n", [1, 2, 3, 5, 17, 64, 257])
    def test_topology(self, n):
        tris = _random_tris(KEY, n)
        b, _, _ = _build(tris)
        m = b.num_leaves
        assert m == -(-n // 4)
        order = np.asarray(b.order)
        # order is a permutation of 0..n-1 plus -1 padding
        assert sorted(o for o in order if o >= 0) == list(range(n))
        if m == 1:
            return
        left = np.asarray(b.left)[: m - 1]
        parent = np.asarray(b.parent)
        # every non-root node has exactly one parent
        counts = np.zeros(2 * m - 1, int)
        for i in range(m - 1):
            # reconstruct right child: it is the node whose parent is i and
            # which is not left[i]
            kids = np.where(parent == i)[0]
            assert len(kids) == 2, f"internal {i} has {len(kids)} children"
            counts[kids] += 1
        assert counts[0] == 0  # root
        assert np.all(counts[1:] == 1)

    @pytest.mark.parametrize("n", [5, 64, 257])
    def test_aabb_containment(self, n):
        tris = _random_tris(KEY, n)
        b, _, _ = _build(tris)
        m = b.num_leaves
        amin, amax = np.asarray(b.aabb_min), np.asarray(b.aabb_max)
        parent = np.asarray(b.parent)
        for node in range(1, 2 * m - 1):
            p = parent[node]
            assert np.all(amin[p] <= amin[node] + 1e-6)
            assert np.all(amax[p] >= amax[node] - 1e-6)

    @pytest.mark.parametrize("n", [2, 5, 64, 257])
    def test_threaded_dfs_visits_every_leaf_once(self, n):
        tris = _random_tris(KEY, n)
        b, _, _ = _build(tris)
        m = b.num_leaves
        left = np.asarray(b.left)
        escape = np.asarray(b.escape)
        seen = []
        cur, steps = 0, 0
        while cur != -1 and steps < 10 * m:
            if cur >= m - 1:
                seen.append(cur - (m - 1))
                cur = escape[cur]
            else:
                cur = left[cur]
            steps += 1
        assert sorted(seen) == list(range(m))

    def test_duplicate_morton_codes(self):
        # all-identical centroids: degenerate Morton codes must still build
        tris = jnp.broadcast_to(
            jnp.array([[[0.0, 0, 0], [1e-3, 0, 0], [0, 1e-3, 0]]]), (33, 3, 3)
        )
        b, _, _ = _build(tris)
        m = b.num_leaves
        left = np.asarray(b.left)
        escape = np.asarray(b.escape)
        seen, cur, steps = [], 0, 0
        while cur != -1 and steps < 10 * m:
            if cur >= m - 1:
                seen.append(cur)
            cur = left[cur] if cur < m - 1 else escape[cur]
            steps += 1
        assert len(seen) == m


class TestTraversal:
    @pytest.mark.parametrize("n,leaf_size", [(7, 1), (64, 4), (257, 4), (300, 8)])
    def test_matches_brute_force(self, n, leaf_size):
        tris = _random_tris(KEY, n)
        b, tris_sorted, tol_sorted = _build(tris, leaf_size)
        k1, k2 = jax.random.split(jax.random.fold_in(KEY, n))
        o = jax.random.uniform(k1, (128, 3), minval=-3, maxval=3)
        d = jax.random.normal(k2, (128, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        t_b, slot, bary_b, hit_b = bvh_mod.traverse_closest(
            b, tris_sorted, tol_sorted, o, d
        )
        tol = intersect.triangle_tolerance(tris)
        t_ref, idx_ref, bary_ref, hit_ref = intersect.closest_hit_brute(o, d, tris, tol)

        np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(hit_ref))
        hb = np.asarray(hit_b)
        np.testing.assert_allclose(
            np.asarray(t_b)[hb], np.asarray(t_ref)[hb], rtol=1e-5
        )
        # hit the same primitive (map slot -> original row)
        order = np.asarray(b.order)
        np.testing.assert_array_equal(
            order[np.asarray(slot)[hb]], np.asarray(idx_ref)[hb]
        )

    def test_cornell_scene(self, tmp_path):
        objfn, _ = testscenes.make_cornell_box(tmp_path, spheres=True, sphere_subdiv=1)
        scene = obj_io.load_scene(tmp_path, objfn)
        tris = jnp.asarray(scene.tri_p)
        b, tris_sorted, tol_sorted = _build(tris)
        o = jnp.broadcast_to(jnp.array([0.5, 0.5, 2.4]), (64, 3)).astype(jnp.float32)
        key = jax.random.fold_in(KEY, 99)
        d = jax.random.normal(key, (64, 3))
        d = d.at[:, 2].set(-jnp.abs(d[:, 2]) - 0.2)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        t_b, slot, _, hit_b = bvh_mod.traverse_closest(b, tris_sorted, tol_sorted, o, d)
        tol = intersect.triangle_tolerance(tris)
        t_ref, idx_ref, _, hit_ref = intersect.closest_hit_brute(o, d, tris, tol)
        np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(hit_ref))
        hb = np.asarray(hit_b)
        np.testing.assert_allclose(np.asarray(t_b)[hb], np.asarray(t_ref)[hb], rtol=1e-5)

    def test_any_hit_matches_closest(self):
        tris = _random_tris(KEY, 100)
        b, tris_sorted, tol_sorted = _build(tris)
        k1, k2 = jax.random.split(jax.random.fold_in(KEY, 5))
        o = jax.random.uniform(k1, (64, 3), minval=-3, maxval=3)
        d = jax.random.normal(k2, (64, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        t_b, _, _, hit_b = bvh_mod.traverse_closest(b, tris_sorted, tol_sorted, o, d)
        occ = bvh_mod.traverse_any(
            b, tris_sorted, tol_sorted, o, d, jnp.full((64,), jnp.inf)
        )
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(hit_b))
        # with t_max below the closest hit, no occlusion
        t_short = jnp.where(hit_b, t_b * 0.9, 1e-3)
        occ2 = bvh_mod.traverse_any(b, tris_sorted, tol_sorted, o, d, t_short)
        assert not np.any(np.asarray(occ2))

    def test_jit_build_and_traverse(self):
        tris = _random_tris(KEY, 64)

        @jax.jit
        def run(tris, o, d):
            lo, hi = jnp.min(tris, axis=1), jnp.max(tris, axis=1)
            tol3 = intersect.triangle_tolerance(tris)[:, None]
            b = bvh_mod.build_bvh(lo - tol3, hi + tol3, leaf_size=4)
            slot = jnp.maximum(b.order, 0)
            tris_sorted = jnp.where(
                (b.order >= 0)[:, None, None], tris[slot], 1e30
            )
            tol_sorted = intersect.triangle_tolerance(tris_sorted)
            return bvh_mod.traverse_closest(b, tris_sorted, tol_sorted, o, d)

        o = jnp.zeros((8, 3))
        d = jax.random.normal(KEY, (8, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        t, slot, bary, hit = run(tris, o, d)
        assert t.shape == (8,)
