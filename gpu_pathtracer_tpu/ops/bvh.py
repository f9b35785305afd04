"""LBVH: Karras-2012 radix-tree build + threaded (stackless) layout.

TPU-native re-design of the reference's LBVH subsystem
(`src/model/bvh/bvh_building.h`, `src/util/bvh_util.h`):

* `thrust::stable_sort` -> `jax.lax.sort_key_val` over Morton codes;
* per-internal-node range/split search (bvh_building.h:88-185) -> vmapped
  doubling + binary search using only int32 ops;
* the reference's benign-race bottom-up AABB fit with `initialized` flags
  (bvh_building.h:221-262) -> a deterministic fixed-point sweep: every pass
  recomputes all internal AABBs from their children; after `height` passes
  the tree has converged;
* pointer-chasing traversal -> a *threaded* BVH: each node stores an
  `escape` (miss) link so traversal is a single `while_loop` with one int of
  control state per ray — no per-ray stack, which is what makes it map onto
  a vector machine.  Internal hit -> left child; miss (or leaf) -> escape.

Leaves cover `leaf_size` consecutive Morton-sorted primitives, so leaf
tests are contiguous vector loads of a few triangles.

Node indexing: one unified array of 2M-1 nodes for M leaves; internal
nodes are 0..M-2 (0 = root), leaf k is node (M-1)+k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.ops import morton
from gpu_pathtracer_tpu.pytree import pytree_dataclass


@pytree_dataclass(meta=("num_leaves", "leaf_size"))
class BVH:
    # unified node arrays, size 2M-1
    aabb_min: jnp.ndarray  # (2M-1, 3)
    aabb_max: jnp.ndarray  # (2M-1, 3)
    escape: jnp.ndarray  # (2M-1,) int32: next node on miss; -1 ends traversal
    left: jnp.ndarray  # (2M-1,) int32: next node on hit (leaf: == escape)
    parent: jnp.ndarray  # (2M-1,) int32 (-1 for root); used by light-tree pdf
    order: jnp.ndarray  # (M * leaf_size,) int32 original prim index, -1 = pad
    num_leaves: int = 1
    leaf_size: int = 4

    @property
    def num_internal(self) -> int:
        return self.num_leaves - 1

    def leaf_node_id(self, leaf_idx):
        return leaf_idx + self.num_leaves - 1


def _karras_topology(codes: jnp.ndarray, n: int):
    """Left/right children of the N-1 internal radix-tree nodes.

    Children are unified node ids (internal i -> i, leaf k -> (N-1)+k).
    Vectorized form of set_node_relationship (bvh_building.h:88-185).
    """
    if n == 1:
        return (jnp.zeros((0,), jnp.int32),) * 3

    delta = functools.partial(morton.lcp, codes, n=n)
    i = jnp.arange(n - 1, dtype=jnp.int32)

    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(i, i - d)

    # upper bound for the range length by doubling
    def dbl_body(_, l_max):
        cond = delta(i, i + l_max * d) > delta_min
        return jnp.where(cond, l_max * 2, l_max)

    n_steps = max(int(n - 1).bit_length() + 1, 1)
    l_max = jax.lax.fori_loop(0, n_steps, dbl_body, jnp.full_like(i, 2))

    # binary search for the exact range end
    def bin_body(k, carry):
        l, t = carry
        t = jnp.maximum(t // 2, 0)
        take = (t > 0) & (delta(i, i + (l + t) * d) > delta_min)
        return jnp.where(take, l + t, l), t

    l, _ = jax.lax.fori_loop(
        0, n_steps + 1, bin_body, (jnp.zeros_like(i), l_max)
    )
    j = i + l * d
    delta_node = delta(i, j)

    # binary search for the split position
    def split_cond(carry):
        return jnp.any(carry[1] > 0)

    def split_scan(carry):
        s, t = carry
        t_new = jnp.maximum((t + 1) // 2, 1)
        take = delta(i, i + (s + t_new) * d) > delta_node
        s = jnp.where(take, s + t_new, s)
        t_next = jnp.where(t_new == 1, 0, t_new)
        return s, t_next

    s, _ = jax.lax.while_loop(split_cond, split_scan, (jnp.zeros_like(i), l))
    gamma = i + s * d + jnp.minimum(d, 0)

    leaf_base = n - 1
    left_is_leaf = jnp.minimum(i, j) == gamma
    right_is_leaf = jnp.maximum(i, j) == gamma + 1
    left = jnp.where(left_is_leaf, gamma + leaf_base, gamma)
    right = jnp.where(right_is_leaf, gamma + 1 + leaf_base, gamma + 1)

    parent = jnp.full((2 * n - 1,), -1, jnp.int32)
    parent = parent.at[left].set(i)
    parent = parent.at[right].set(i)
    return left.astype(jnp.int32), right.astype(jnp.int32), parent


def _fixed_point_refit(
    left: jnp.ndarray,
    right: jnp.ndarray,
    leaf_min: jnp.ndarray,
    leaf_max: jnp.ndarray,
    num_internal: int,
):
    """Deterministic bottom-up AABB fit: iterate `min/max of children` until
    convergence (replaces the reference's initialized-flag race protocol,
    bvh_building.h:221-262)."""
    total = num_internal + leaf_min.shape[0]
    big = jnp.float32(3.4e38)
    amin = jnp.concatenate([jnp.full((num_internal, 3), big), leaf_min])
    amax = jnp.concatenate([jnp.full((num_internal, 3), -big), leaf_max])

    def body(carry):
        amin, amax, changed, _ = carry
        new_min = jnp.minimum(amin[left], amin[right])
        new_max = jnp.maximum(amax[left], amax[right])
        upd_min = amin.at[:num_internal].set(new_min)
        upd_max = amax.at[:num_internal].set(new_max)
        changed = jnp.any(upd_min != amin) | jnp.any(upd_max != amax)
        return upd_min, upd_max, changed, 0

    def cond(carry):
        return carry[2]

    if num_internal == 0:
        return amin, amax
    amin, amax, _, _ = jax.lax.while_loop(
        cond, body, (amin, amax, jnp.bool_(True), 0)
    )
    return amin, amax


def _escape_links(
    left: jnp.ndarray, right: jnp.ndarray, parent: jnp.ndarray, total: int
):
    """Threaded-DFS miss links via fixed-point propagation.

    escape(n) = right-sibling if n is a left child, else escape(parent).
    Root's escape is -1.  Converges in `depth` iterations.
    """
    node_ids = jnp.arange(total, dtype=jnp.int32)
    par = parent
    par_safe = jnp.maximum(par, 0)
    is_left = (par >= 0) & (left[par_safe] == node_ids)
    sibling = right[par_safe]

    def body(carry):
        esc, _ = carry
        new = jnp.where(is_left, sibling, jnp.where(par >= 0, esc[par_safe], -1))
        return new, jnp.any(new != esc)

    def cond(carry):
        return carry[1]

    esc0 = jnp.where(is_left, sibling, -1).astype(jnp.int32)
    esc, _ = jax.lax.while_loop(cond, body, (esc0, jnp.bool_(True)))
    return esc


def build_bvh(
    prim_min: jnp.ndarray,  # (N, 3) per-primitive AABB min
    prim_max: jnp.ndarray,  # (N, 3)
    leaf_size: int = 4,
) -> BVH:
    """Build a threaded LBVH over N primitives (jittable; N static).

    Returns the BVH plus the Morton sort order baked into `bvh.order`:
    leaf k owns `order[k*L:(k+1)*L]` (original primitive rows, -1 padded).
    Callers typically reorder their primitive SoA by `order` so leaf tests
    are contiguous loads.
    """
    n = prim_min.shape[0]
    centers = 0.5 * (prim_min + prim_max)
    codes = morton.morton_3d(morton.normalized_centroids(centers))

    order = jnp.arange(n, dtype=jnp.int32)
    codes_sorted, order_sorted = jax.lax.sort_key_val(codes, order)

    # group into leaves of `leaf_size` consecutive sorted prims
    m = -(-n // leaf_size)  # number of leaves
    pad = m * leaf_size - n
    order_padded = jnp.concatenate([order_sorted, jnp.full((pad,), -1, jnp.int32)])
    slot_prim = jnp.maximum(order_padded, 0).reshape(m, leaf_size)
    slot_valid = (order_padded >= 0).reshape(m, leaf_size)

    big = jnp.float32(3.4e38)
    mins = jnp.where(slot_valid[..., None], prim_min[slot_prim], big)
    maxs = jnp.where(slot_valid[..., None], prim_max[slot_prim], -big)
    leaf_min = jnp.min(mins, axis=1)
    leaf_max = jnp.max(maxs, axis=1)

    # leaf group key = Morton code of its first member (+ index tiebreak in lcp)
    leaf_codes = codes_sorted[:: leaf_size][:m]

    if m == 1:
        return BVH(
            aabb_min=leaf_min,
            aabb_max=leaf_max,
            escape=jnp.full((1,), -1, jnp.int32),
            left=jnp.full((1,), -1, jnp.int32),
            parent=jnp.full((1,), -1, jnp.int32),
            order=order_padded,
            num_leaves=1,
            leaf_size=leaf_size,
        )

    left, right, parent = _karras_topology(leaf_codes, m)
    amin, amax = _fixed_point_refit(left, right, leaf_min, leaf_max, m - 1)

    total = 2 * m - 1
    escape = _escape_links(left, right, parent, total)
    # unified hit links: internal -> left child, leaf -> its own escape
    hit_link = jnp.concatenate([left, escape[m - 1 :]])

    return BVH(
        aabb_min=amin,
        aabb_max=amax,
        escape=escape,
        left=hit_link,
        parent=parent,
        order=order_padded,
        num_leaves=m,
        leaf_size=leaf_size,
    )


def ray_box_test(
    o: jnp.ndarray,  # (..., 3)
    inv_d: jnp.ndarray,  # (..., 3)
    box_min: jnp.ndarray,  # (..., 3)
    box_max: jnp.ndarray,  # (..., 3)
    t_max: jnp.ndarray,  # (...)
) -> jnp.ndarray:
    """Slab test against [tolerance-padded] boxes (bounding_box.h:262-276)."""
    t0 = (box_min - o) * inv_d
    t1 = (box_max - o) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tmax >= tmin) & (tmax > 0.0) & (tmin < t_max)


def traverse_closest(
    bvh: BVH,
    tri_p_sorted: jnp.ndarray,  # (M*L, 3, 3) leaf-ordered triangles
    tri_tol_sorted: jnp.ndarray,  # (M*L,)
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3)
    t_max: jnp.ndarray | float = jnp.inf,
    max_steps: int = 100_000,
):
    """Closest-hit traversal for a batch of rays.

    A single `while_loop`: each step every live ray tests one node's AABB
    (and, at leaves, its `leaf_size` triangles) and follows its hit/escape
    thread.  State per ray is (node, best_t, best_slot, best_bary) — tiny,
    so the loop is a pure gather+VPU workload.

    Returns (t, slot, bary, hit); `slot` indexes the *sorted* primitive
    arrays (bvh.order maps back to original rows), -1 on miss.
    """
    from gpu_pathtracer_tpu.ops import intersect as isect

    r = origin.shape[0]
    L = bvh.leaf_size
    m = bvh.num_leaves
    leaf_base = m - 1

    inv_d = 1.0 / jnp.where(jnp.abs(direction) < 1e-20,
                            jnp.where(direction < 0, -1e-20, 1e-20), direction)

    tri_blocks = tri_p_sorted.reshape(m, L, 3, 3)
    tol_blocks = tri_tol_sorted.reshape(m, L)
    valid_blocks = (bvh.order >= 0).reshape(m, L)

    cur0 = jnp.zeros((r,), jnp.int32)
    best_t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    best_slot0 = jnp.full((r,), -1, jnp.int32)
    best_bary0 = jnp.zeros((r, 3), jnp.float32)

    def cond(state):
        cur, _, _, _, steps = state
        return jnp.any(cur >= 0) & (steps < max_steps)

    def body(state):
        cur, best_t, best_slot, best_bary, steps = state
        live = cur >= 0
        node = jnp.maximum(cur, 0)

        bmin = bvh.aabb_min[node]
        bmax = bvh.aabb_max[node]
        box_hit = ray_box_test(origin, inv_d, bmin, bmax, best_t) & live

        is_leaf = node >= leaf_base
        leaf_idx = jnp.clip(node - leaf_base, 0, m - 1)

        # leaf triangle tests (computed for every ray; masked)
        tris = tri_blocks[leaf_idx]  # (R, L, 3, 3)
        tols = tol_blocks[leaf_idx]  # (R, L)
        valid = valid_blocks[leaf_idx] & (box_hit & is_leaf)[:, None]
        t, bary, hit = isect.intersect_tris(origin, direction, tris, tols, best_t)
        hit = hit & valid
        t = jnp.where(hit, t, jnp.inf)
        k = jnp.argmin(t, axis=-1)
        t_best_leaf = jnp.take_along_axis(t, k[:, None], axis=-1)[:, 0]
        bary_best = jnp.take_along_axis(bary, k[:, None, None], axis=-2)[:, 0, :]
        improved = t_best_leaf < best_t
        best_t = jnp.where(improved, t_best_leaf, best_t)
        best_slot = jnp.where(
            improved, leaf_idx * L + k.astype(jnp.int32), best_slot
        )
        best_bary = jnp.where(improved[:, None], bary_best, best_bary)

        nxt = jnp.where(box_hit & ~is_leaf, bvh.left[node], bvh.escape[node])
        cur = jnp.where(live, nxt, cur)
        return cur, best_t, best_slot, best_bary, steps + 1

    _, best_t, best_slot, best_bary, _ = jax.lax.while_loop(
        cond, body, (cur0, best_t0, best_slot0, best_bary0, jnp.int32(0))
    )
    hit = best_slot >= 0
    return jnp.where(hit, best_t, jnp.inf), best_slot, best_bary, hit


def traverse_any(
    bvh: BVH,
    tri_p_sorted: jnp.ndarray,
    tri_tol_sorted: jnp.ndarray,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    t_max: jnp.ndarray,
    exclude_slot: jnp.ndarray | None = None,
    max_steps: int = 100_000,
):
    """Any-hit (shadow) traversal: rays stop at the first accepted hit.

    `exclude_slot` masks one sorted-primitive row per ray (e.g. the emitter
    being sampled) so shadow rays don't self-occlude.
    """
    from gpu_pathtracer_tpu.ops import intersect as isect

    r = origin.shape[0]
    L = bvh.leaf_size
    m = bvh.num_leaves
    leaf_base = m - 1

    inv_d = 1.0 / jnp.where(jnp.abs(direction) < 1e-20,
                            jnp.where(direction < 0, -1e-20, 1e-20), direction)
    tri_blocks = tri_p_sorted.reshape(m, L, 3, 3)
    tol_blocks = tri_tol_sorted.reshape(m, L)
    valid_blocks = (bvh.order >= 0).reshape(m, L)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    def cond(state):
        cur, occluded, steps = state
        return jnp.any((cur >= 0) & ~occluded) & (steps < max_steps)

    def body(state):
        cur, occluded, steps = state
        live = (cur >= 0) & ~occluded
        node = jnp.maximum(cur, 0)
        box_hit = ray_box_test(
            origin, inv_d, bvh.aabb_min[node], bvh.aabb_max[node], t_max_b
        ) & live
        is_leaf = node >= leaf_base
        leaf_idx = jnp.clip(node - leaf_base, 0, m - 1)
        tris = tri_blocks[leaf_idx]
        tols = tol_blocks[leaf_idx]
        valid = valid_blocks[leaf_idx] & (box_hit & is_leaf)[:, None]
        if exclude_slot is not None:
            slots = leaf_idx[:, None] * L + jnp.arange(L)[None, :]
            valid &= slots != exclude_slot[:, None]
        _, _, hit = isect.intersect_tris(origin, direction, tris, tols, t_max_b)
        occluded = occluded | jnp.any(hit & valid, axis=-1)
        nxt = jnp.where(box_hit & ~is_leaf, bvh.left[node], bvh.escape[node])
        cur = jnp.where(live, nxt, cur)
        return cur, occluded, steps + 1

    _, occluded, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((r,), jnp.int32), jnp.zeros((r,), bool), jnp.int32(0))
    )
    return occluded


def validate(bvh: BVH, prim_min=None, prim_max=None, atol: float = 1e-5):
    """Structural invariant check — the library form of the reference's
    post-build `check` kernel (bvh_building.h:187-219), generalized:

    * every internal node has exactly two children whose `parent` points back;
    * every internal AABB contains both child AABBs;
    * leaf AABBs contain their primitives' AABBs (when prim bounds given);
    * `order` is a permutation of the primitive rows plus -1 padding;
    * the root has no parent and ends traversal (`escape == -1`).

    Returns a dict of failure counts (all zero == valid); host-side numpy,
    intended for tests and debugging, not the hot path.
    """
    import numpy as np

    m = bvh.num_leaves
    parent = np.asarray(bvh.parent)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    order = np.asarray(bvh.order)
    fails = {}

    if m == 1:
        fails["root_parent"] = int(parent[0] != -1)
        fails["root_escape"] = int(np.asarray(bvh.escape)[0] != -1)
    else:
        child_count = np.zeros(m - 1, np.int64)
        valid_parent = parent[1:]  # root excluded
        fails["orphan_nonroot"] = int(np.sum(valid_parent < 0))
        np.add.at(child_count, parent[parent >= 0], 1)
        fails["internal_degree"] = int(np.sum(child_count != 2))
        # containment: every non-root node inside its parent's AABB
        has_parent = parent >= 0
        p = parent[has_parent]
        fails["aabb_containment"] = int(
            np.sum(
                np.any(amin[has_parent] < amin[p] - atol, axis=-1)
                | np.any(amax[has_parent] > amax[p] + atol, axis=-1)
            )
        )
        fails["root_parent"] = int(parent[0] != -1)
        fails["root_escape"] = int(np.asarray(bvh.escape)[0] != -1)

    real = order[order >= 0]
    fails["order_permutation"] = int(
        len(real) != len(np.unique(real))
        or (prim_min is not None and len(real) != len(prim_min))
    )
    if prim_min is not None:
        pmin = np.asarray(prim_min)
        pmax = np.asarray(prim_max)
        leaf_base = m - 1 if m > 1 else 0
        leaf_of_slot = np.repeat(np.arange(m), bvh.leaf_size)
        ok = order >= 0
        node = leaf_base + leaf_of_slot[ok]
        rows = order[ok]
        fails["leaf_containment"] = int(
            np.sum(
                np.any(pmin[rows] < amin[node] - atol, axis=-1)
                | np.any(pmax[rows] > amax[node] + atol, axis=-1)
            )
        )
    return fails
