"""Light tree: many-lights importance sampling + MIS mixture pdf.

TPU-native re-derivation of the reference's target-geometry BVH
(`src/model/bvh/bvh_traversal_target.h`, `src/model/bvh/bvh.h:60-114`,
`src/model/material/material_operations.h`):

* emitter enumeration + per-triangle energy 2*pi*avg(Ke)*area
  (triangle.h:112-122, pathtracing_target_geom_operations.h:5-48);
* a binary radix tree over the emitters (same LBVH as geometry) whose nodes
  carry energy sums (bvh_building.h:304-348) — node importance is
  |energy| / dist^2 to the node's AABB center, with the leaf term using the
  *directed* energy toward the shading point (bvh.h:60-96);
* stochastic root-to-leaf descent ∝ importance
  (traverse_bvh_to_pick_a_target, bvh_traversal_target.h:79-112);
* the MIS mixture pdf: hittable_pdf = sum over emitters the ray actually
  hits of node_pdf * dist^2/(|cos|*area)
  (material_operations.h:26-72, triangle.h:95-110).  The reference culls
  that sum with a ray/AABB collection pass; since get_hittable_pdf is zero
  on a miss anyway, evaluating all emitters vectorized gives the identical
  value — the AABB pass was GPU-side culling, not semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.constants import (
    LIGHT_TREE_DENSE_MAX,
    MAX_POTENTIAL_TARGETS,
    SMALL_EPS,
)
from gpu_pathtracer_tpu.ops import bvh as bvh_mod
from gpu_pathtracer_tpu.ops import intersect, linalg
from gpu_pathtracer_tpu.pytree import pytree_dataclass


@pytree_dataclass(meta=("num_lights", "depth", "dense"))
class LightTree:
    tree: bvh_mod.BVH  # leaf_size=1 radix tree over emitters
    node_energy: jnp.ndarray  # (2E-1, 3) energy sums (leaves = emitter energy)
    # leaf payloads in tree order (leaf k <-> sorted slot k):
    tri_p: jnp.ndarray  # (E, 3, 3)
    tri_n: jnp.ndarray  # (E, 3, 3) per-vertex normals
    tri_uv: jnp.ndarray  # (E, 3, 2)
    area: jnp.ndarray  # (E,)
    avg_normal: jnp.ndarray  # (E, 3) normal at barycenter (triangle.h:87)
    centroid: jnp.ndarray  # (E, 3)
    tol: jnp.ndarray  # (E,) watertight-hit tolerance
    geom_slot: jnp.ndarray  # (E,) int32 row in the SORTED scene arrays
    # dense-topology tables (built once, host side) for the matmul-form pdf;
    # only materialized while E <= LIGHT_TREE_DENSE_MAX (`dense` flag) — the
    # (2E-1, E) ancestor matrix is O(E^2) memory and the sparse walk path
    # never touches it
    sib: jnp.ndarray  # (2E-1,) int32 sibling node id (root -> itself)
    anc: jnp.ndarray  # (2E-1, E) f32 1.0 where node lies on root->leaf path
    node_centroid: jnp.ndarray  # (2E-1, 3) leaf centroid (zeros on internals)
    node_avg_normal: jnp.ndarray  # (2E-1, 3)
    node_is_leaf: jnp.ndarray  # (2E-1,) bool
    num_lights: int = 0
    depth: int = 1  # max leaf->root path length (static, for fori_loop pdfs)
    dense: bool = True  # dense tables present; False = sparse-walk regime


def build_light_tree(
    tri_p: jnp.ndarray,  # (E, 3, 3) emitter triangles
    tri_n: jnp.ndarray,  # (E, 3, 3)
    tri_uv: jnp.ndarray,  # (E, 3, 2)
    energy: jnp.ndarray,  # (E, 3) per-emitter 2*pi*avgKe*area
    geom_slot: jnp.ndarray,  # (E,) row of each emitter in the sorted scene SoA
    dense_tables: bool | None = None,
) -> LightTree:
    """Build the light tree (the reference's target LBVH + energy fit).

    `dense_tables` (default: E <= LIGHT_TREE_DENSE_MAX) controls whether the
    O(E^2) ancestor matrix for the matmul-form pdf is materialized; above the
    threshold the integrators use the sparse descent/walk path instead
    (reference behavior, bvh_traversal_target.h:79-112)."""
    e = tri_p.shape[0]
    pmin = jnp.min(tri_p, axis=1)
    pmax = jnp.max(tri_p, axis=1)
    tree = bvh_mod.build_bvh(pmin, pmax, leaf_size=1)
    order = tree.order[:e]  # leaf k holds original emitter order[k]

    tri_p = tri_p[order]
    tri_n = tri_n[order]
    tri_uv = tri_uv[order]
    energy = energy[order]
    geom_slot = geom_slot[order]

    # bottom-up energy sums (compute_node_bounding_cones, bvh_building.h:304)
    num_internal = e - 1
    node_energy = jnp.concatenate(
        [jnp.zeros((num_internal, 3), energy.dtype), energy], axis=0
    )
    if num_internal > 0:
        left = tree.left[:num_internal]  # hit link of internal = left child

        # recover right children: escape of the left child within the subtree
        right = tree.escape[left]

        def body(carry):
            en, _ = carry
            new = en.at[:num_internal].set(en[left] + en[right])
            return new, jnp.any(new != en)

        node_energy, _ = jax.lax.while_loop(
            lambda c: c[1], body, (node_energy, jnp.bool_(True))
        )

    # host-side topology tables: depth, sibling map, and (dense regime only)
    # the root->leaf ancestor incidence matrix that turns the per-leaf pdf
    # walk (get_node_pdf, bvh_traversal_target.h:48-77) into one matmul
    import numpy as np

    if dense_tables is None:
        dense_tables = e <= LIGHT_TREE_DENSE_MAX

    total = 2 * e - 1
    leaf_base = e - 1
    if e > 1:
        parent_np = np.asarray(tree.parent).astype(np.int64)
        left_np = np.asarray(tree.left).astype(np.int64)  # internal: left child
        esc_np = np.asarray(tree.escape).astype(np.int64)
        lchild = left_np[:leaf_base]
        rchild = esc_np[lchild]  # right sibling = left child's escape

        sib_np = np.arange(total, dtype=np.int64)
        sib_np[lchild] = rchild
        sib_np[rchild] = lchild

        anc_np = (
            np.zeros((total, e), np.float32)
            if dense_tables
            else np.zeros((1, 1), np.float32)
        )
        cur = np.arange(e, dtype=np.int64) + leaf_base
        depth = 0
        while True:
            if dense_tables:
                anc_np[cur, np.arange(e)] = 1.0
            depth += 1
            done = cur == 0
            if done.all() or depth > 2 * e + 2:
                break
            cur = np.where(done, cur, parent_np[cur])
    else:
        sib_np = np.zeros((1,), np.int64)
        anc_np = np.ones((1, 1), np.float32)
        depth = 1
        dense_tables = True

    avg_normal = linalg.normalize(jnp.mean(tri_n, axis=1), SMALL_EPS)
    centroid = jnp.mean(tri_p, axis=1)
    zeros_int = jnp.zeros((leaf_base, 3), jnp.float32)
    node_centroid = jnp.concatenate([zeros_int, centroid], axis=0)
    node_avg_normal = jnp.concatenate([zeros_int, avg_normal], axis=0)
    node_is_leaf = jnp.arange(total) >= leaf_base
    return LightTree(
        tree=tree,
        node_energy=node_energy,
        tri_p=tri_p,
        tri_n=tri_n,
        tri_uv=tri_uv,
        area=intersect.triangle_area(tri_p),
        avg_normal=avg_normal,
        centroid=centroid,
        tol=intersect.triangle_tolerance(tri_p),
        geom_slot=geom_slot,
        sib=jnp.asarray(sib_np, jnp.int32),
        anc=jnp.asarray(anc_np),
        node_centroid=node_centroid,
        node_avg_normal=node_avg_normal,
        node_is_leaf=node_is_leaf,
        num_lights=e,
        depth=depth,
        dense=bool(dense_tables),
    )


def cone_union(ax_a, t0_a, te_a, ax_b, t0_b, te_b):
    """Orientation-cone union per Estevez-Kulla (cone_union,
    bounding_cone.h:44-85), vectorized/branch-free over (..., 3) axes.

    Returns (axis, theta_0, theta_e)."""
    swap = t0_b > t0_a
    ax_1 = jnp.where(swap[..., None], ax_b, ax_a)
    ax_2 = jnp.where(swap[..., None], ax_a, ax_b)
    t0_1 = jnp.where(swap, t0_b, t0_a)
    t0_2 = jnp.where(swap, t0_a, t0_b)

    theta_d = jnp.arccos(jnp.clip(linalg.dot(ax_1, ax_2), -1.0, 1.0))
    new_te = jnp.maximum(te_a, te_b)

    contained = jnp.minimum(theta_d + t0_2, jnp.pi) <= t0_1
    t0_open = (t0_1 + theta_d + t0_2) / 2.0
    full = t0_open >= jnp.pi

    rot_axis = linalg.cross(ax_1, ax_2)
    # zero rotation axis == parallel axes.  Same-direction parallels always
    # land in `contained`; the remaining degenerate case is ANTIPODAL axes,
    # where no finite cone about either axis covers both: full sphere.
    degenerate = linalg.length(rot_axis) < 1e-12
    rot_axis = jnp.where(
        degenerate[..., None], jnp.array([1.0, 0.0, 0.0]), rot_axis
    )
    ax_open = linalg.rodrigues_rotate(ax_1, rot_axis, t0_open - t0_1)

    axis = jnp.where((contained | full | degenerate)[..., None], ax_1, ax_open)
    t0 = jnp.where(
        contained,
        t0_1,
        jnp.where(full | (degenerate & ~contained), jnp.pi, t0_open),
    )
    return axis, t0, new_te


def build_node_cones(lt: LightTree):
    """Per-node orientation cones, bottom-up (compute_node_bounding_cones,
    bvh_building.h:304-348): leaf cone = (avg normal, theta_0=0,
    theta_e=pi/2) exactly like Node::assign_object (bvh.h:102-114); internal
    cones are the union of their children's.

    The reference computes these but its importance leaves the cone/
    incidence terms commented out (bvh.h:75-86) — this framework matches
    that behavior, so the cones are a data structure for parity (and for a
    future cone-aware importance), not part of the sampling math.

    Returns (axis (2E-1, 3), theta_0 (2E-1,), theta_e (2E-1,))."""
    e = lt.num_lights
    num_internal = e - 1
    axis = jnp.concatenate(
        [jnp.zeros((num_internal, 3)), lt.avg_normal], axis=0
    )
    t0 = jnp.zeros((2 * e - 1,))
    te = jnp.concatenate(
        [jnp.zeros((num_internal,)), jnp.full((e,), jnp.pi / 2.0)]
    )
    if num_internal == 0:
        return axis, t0, te

    left = lt.tree.left[:num_internal]
    right = lt.tree.escape[left]

    def body(_, carry):
        ax, a0, ae = carry
        ux, u0, ue = cone_union(
            ax[left], a0[left], ae[left], ax[right], a0[right], ae[right]
        )
        return (
            ax.at[:num_internal].set(ux),
            a0.at[:num_internal].set(u0),
            ae.at[:num_internal].set(ue),
        )

    # depth sweeps of recompute-from-children reach the fixed point (the
    # deterministic replacement for the reference's initialized-flag race)
    return jax.lax.fori_loop(0, lt.depth, body, (axis, t0, te))


def leaf_energies(
    lt: LightTree,
    table,
    mat_id_sorted: jnp.ndarray,  # (T,) scene.geom.mat_id (sorted SoA rows)
) -> jnp.ndarray:
    """Per-emitter energy 2*pi*avg(Ke at the 3 vertices)*area
    (Triangle::get_energy, triangle.h:112-122), recomputed DIFFERENTIABLY
    from the live material table.

    `build_scene` bakes the same values into `lt.node_energy` leaves at
    construction; reading them from the table instead lets gradients flow
    from the photon-emission energy CDF normalization back to
    `MaterialTable.ke` — the differentiable-SPPM emitter-optimization path
    (BASELINE config 5)."""
    e = lt.num_lights
    mat = mat_id_sorted[lt.geom_slot]  # (E,)
    ke_verts = table.emission_color(
        jnp.broadcast_to(mat[:, None], (e, 3)), lt.tri_uv
    )  # (E, 3, 3)
    return 2.0 * jnp.pi * jnp.mean(ke_verts, axis=1) * lt.area[:, None]


def _node_importance(
    lt: LightTree, node: jnp.ndarray, point: jnp.ndarray, pivot: jnp.ndarray
) -> jnp.ndarray:
    """Node::compute_importance (bvh.h:60-96): |energy|/dist^2 with the leaf
    using directed energy toward the shading point.

    node (...,) int32 (unified ids), point/pivot (..., 3).
    """
    e = lt.num_lights
    leaf_base = e - 1
    center = 0.5 * (lt.tree.aabb_min[node] + lt.tree.aabb_max[node])
    d = point - center
    dist2 = jnp.maximum(linalg.dot(d, d), 1e-30)

    is_leaf = node >= leaf_base
    leaf = jnp.clip(node - leaf_base, 0, e - 1)
    # compute_directed_energy (triangle.h:84-93)
    dir_to_point = linalg.normalize(point - lt.centroid[leaf], SMALL_EPS)
    fac = jnp.maximum(
        0.0,
        linalg.dot(lt.avg_normal[leaf], dir_to_point)
        * linalg.dot(-dir_to_point, pivot),
    )
    energy = lt.node_energy[node]
    eff = jnp.where(is_leaf[..., None], energy * fac[..., None], energy)
    return linalg.length(eff) / dist2


def pick_light(
    lt: LightTree,
    point: jnp.ndarray,  # (R, 3) shading points
    pivot: jnp.ndarray,  # (R, 3) normal (diffuse) or perfect dir (specular)
    key: jax.Array,
) -> jnp.ndarray:
    """Stochastic root-to-leaf descent ∝ child importance
    (traverse_bvh_to_pick_a_target, bvh_traversal_target.h:79-112).

    Returns (R,) int32 leaf index (tree order).
    """
    e = lt.num_lights
    if e == 1:
        return jnp.zeros(point.shape[:-1], jnp.int32)
    leaf_base = e - 1
    r_shape = point.shape[:-1]

    def cond(state):
        node, _ = state
        return jnp.any(node < leaf_base)

    def body(state):
        node, step = state
        at_internal = node < leaf_base
        safe = jnp.minimum(node, leaf_base - 1)
        left = lt.tree.left[safe]
        right = lt.tree.escape[left]
        imp_l = _node_importance(lt, left, point, pivot)
        imp_r = _node_importance(lt, right, point, pivot)
        total = imp_l + imp_r
        factor = jnp.where(total < 1e-10, 0.5, imp_l / jnp.maximum(total, 1e-30))
        u = jax.random.uniform(jax.random.fold_in(key, step), r_shape)
        nxt = jnp.where(u < factor, left, right)
        return jnp.where(at_internal, nxt, node), step + 1

    node, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros(r_shape, jnp.int32), jnp.int32(0))
    )
    return node - leaf_base


def pick_light_dense(
    lt: LightTree,
    node_pdf: jnp.ndarray,  # (R, E) leaf selection pdfs (leaf_node_pdfs)
    key: jax.Array,
) -> jnp.ndarray:
    """Sample a leaf from its exact selection distribution by inverse-CDF.

    The stochastic root-to-leaf descent (`pick_light`) selects leaf k with
    probability = product of branch probabilities = `leaf_node_pdfs[k]`, so
    sampling that categorical directly is the same distribution — without a
    per-ray tree walk (sequential gather steps are the slowest construct on
    TPU; one cumsum over a dense (R, E) array is vector work).
    """
    cdf = jnp.cumsum(node_pdf, axis=-1)
    total = cdf[..., -1:]
    u = jax.random.uniform(key, node_pdf.shape[:-1] + (1,))
    pick = jnp.sum(cdf < u * total, axis=-1).astype(jnp.int32)
    return jnp.clip(pick, 0, lt.num_lights - 1)


def sample_point_on_light(
    lt: LightTree, leaf: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray
) -> jnp.ndarray:
    """Uniform point on the chosen emitter: u = 1-sqrt(r1), v = r2*sqrt(r1)
    (Triangle::get_random_point_on_surface, triangle.h:199-224)."""
    s = jnp.sqrt(jnp.maximum(u1, 0.0))
    u = 1.0 - s
    v = u2 * s
    p = lt.tri_p[leaf]
    return (
        u[..., None] * p[..., 0, :]
        + v[..., None] * p[..., 1, :]
        + (1.0 - u - v)[..., None] * p[..., 2, :]
    )


def _importance_tables(lt: LightTree, perm: jnp.ndarray | None = None):
    """Per-node data consumed by the dense importance eval; `perm` gathers
    the sibling-permuted copy (a one-off (T, C) table gather, not per-ray)."""
    centers = 0.5 * (lt.tree.aabb_min + lt.tree.aabb_max)
    energy = lt.node_energy
    centroid = lt.node_centroid
    avg_n = lt.node_avg_normal
    is_leaf = lt.node_is_leaf
    if perm is not None:
        centers = centers[perm]
        energy = energy[perm]
        centroid = centroid[perm]
        avg_n = avg_n[perm]
        is_leaf = is_leaf[perm]
    return centers, energy, centroid, avg_n, is_leaf


def _dense_importance(tables, point, pivot):
    """Node::compute_importance for EVERY node at once: (R, 3) -> (R, T).

    Pure broadcasting — no per-ray gathers (the TPU-hostile construct the
    reference's pointer walk would imply)."""
    centers, energy, centroid, avg_n, is_leaf = tables
    d = point[..., None, :] - centers  # (R, T, 3)
    dist2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-30)
    dtp = linalg.normalize(point[..., None, :] - centroid, SMALL_EPS)
    fac = jnp.maximum(
        0.0,
        linalg.dot(avg_n, dtp) * linalg.dot(-dtp, pivot[..., None, :]),
    )
    eff = jnp.where(is_leaf[..., None], energy * fac[..., None], energy)
    return linalg.length(eff) / dist2


def leaf_node_pdfs(
    lt: LightTree, point: jnp.ndarray, pivot: jnp.ndarray
) -> jnp.ndarray:
    """Per-leaf selection pdf = product of branch probabilities root->leaf
    (get_node_pdf, bvh_traversal_target.h:48-77), for ALL leaves at once.

    Dense matmul form: branch ratio of every node against its sibling is
    computed with two broadcast importance evals (the sibling side uses
    permuted tables built at construction), and the per-leaf product becomes
    exp(log_ratio @ ancestor_matrix) — one MXU contraction instead of a
    per-ray pointer walk.  point/pivot (R, 3) -> (R, E).  NaN/inf branch
    ratios fall back to 0.5 exactly like the reference.
    """
    e = lt.num_lights
    if e == 1:
        return jnp.ones(point.shape[:-1] + (1,))
    total = 2 * e - 1

    imp = _dense_importance(_importance_tables(lt), point, pivot)
    imp_sib = _dense_importance(_importance_tables(lt, lt.sib), point, pivot)
    ratio = imp / (imp + imp_sib)
    ratio = jnp.where(jnp.isfinite(ratio), ratio, 0.5)
    # the root has no sibling; its "ratio" multiplies every path, so force 1
    is_root = jnp.arange(total) == 0
    ratio = jnp.where(is_root, 1.0, ratio)
    log_pdf = jnp.log(jnp.clip(ratio, 1e-35, 1.0)) @ lt.anc  # (R, E)
    return jnp.exp(log_pdf)


def node_pdf_walk(
    lt: LightTree,
    leaf: jnp.ndarray,  # (..., K) int32 leaf indices (tree order)
    point: jnp.ndarray,  # (..., 3)
    pivot: jnp.ndarray,  # (..., 3)
) -> jnp.ndarray:
    """Selection pdf of the given leaves by the reference's bounded
    leaf->root walk multiplying branch ratios (get_node_pdf,
    bvh_traversal_target.h:48-77).  O(K * depth) per ray — the scalable
    form for the sparse many-lights regime (no (R, E) table).

    The walk is a `fori_loop` over the STATIC tree depth so it is
    reverse-differentiable w.r.t. emitter energies."""
    e = lt.num_lights
    if e == 1:
        return jnp.ones(leaf.shape)
    pt = point[..., None, :]  # (..., 1, 3)
    pv = pivot[..., None, :]

    def body(_, state):
        cur, pdf = state
        live = cur > 0
        safe = jnp.maximum(cur, 0)
        par = lt.tree.parent[safe]
        par_safe = jnp.maximum(par, 0)
        left = lt.tree.left[par_safe]
        right = lt.tree.escape[left]
        sib = jnp.where(left == safe, right, left)
        imp_1 = _node_importance(lt, safe, pt, pv)
        imp_2 = _node_importance(lt, sib, pt, pv)
        ratio = imp_1 / (imp_1 + imp_2)
        ratio = jnp.where(jnp.isfinite(ratio), ratio, 0.5)
        pdf = jnp.where(live, pdf * ratio, pdf)
        return jnp.where(live, par, cur), pdf

    _, pdf = jax.lax.fori_loop(
        0, lt.depth, body,
        (leaf + jnp.int32(e - 1), jnp.ones(leaf.shape)),
    )
    return pdf


def leaf_node_pdfs_walk(
    lt: LightTree, point: jnp.ndarray, pivot: jnp.ndarray
) -> jnp.ndarray:
    """Walk-form pdfs for ALL leaves (cross-check oracle for the matmul-form
    `leaf_node_pdfs`; O(E * depth) per ray — dense-regime sizes only)."""
    e = lt.num_lights
    leaves = jnp.broadcast_to(
        jnp.arange(e, dtype=jnp.int32), point.shape[:-1] + (e,)
    )
    return node_pdf_walk(lt, leaves, point, pivot)


def collect_hit_leaves(
    lt: LightTree,
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3) unit
    max_k: int = MAX_POTENTIAL_TARGETS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Collect up to `max_k` emitter leaves whose AABB the ray stabs, by a
    threaded (stackless) walk of the light BVH (traverse_bvh_target,
    bvh_traversal_target.h:114-184; the reference caps at 400).

    Returns (leaf, ok, dropped): (R, K) int32 leaf indices, validity mask,
    and (R,) int32 count of stabbed leaves DROPPED past the cap ("no silent
    caps": dropped > 0 means the pdf sum computed from this collection is
    biased low for that ray — the reference's own 400-entry cap has the same
    failure mode, just a larger budget, bvh_traversal_target.h:118).  The
    collection is a superset of the emitters the ray actually hits, so
    summing triangle-hit pdfs over it equals the full dense sum whenever
    dropped == 0."""
    e = lt.num_lights
    r = origin.shape[0]
    if e == 1:
        return (
            jnp.zeros((r, 1), jnp.int32),
            jnp.ones((r, 1), bool),
            jnp.zeros((r,), jnp.int32),
        )
    leaf_base = e - 1
    tree = lt.tree
    inv_d = 1.0 / jnp.where(
        jnp.abs(direction) < 1e-20,
        jnp.where(direction < 0, -1e-20, 1e-20),
        direction,
    )
    k_ar = jnp.arange(max_k, dtype=jnp.int32)

    def cond(state):
        cur, _, _, _, steps = state
        return jnp.any(cur >= 0) & (steps < 4 * e)

    def body(state):
        cur, buf, cnt, drop, steps = state
        live = cur >= 0
        node = jnp.maximum(cur, 0)
        box_hit = bvh_mod.ray_box_test(
            origin, inv_d, tree.aabb_min[node], tree.aabb_max[node],
            jnp.full((r,), jnp.inf),
        ) & live
        is_leaf = node >= leaf_base
        stab = box_hit & is_leaf
        take = stab & (cnt < max_k)
        slot = (k_ar[None, :] == cnt[:, None]) & take[:, None]
        buf = jnp.where(slot, (node - leaf_base)[:, None], buf)
        cnt = cnt + take.astype(jnp.int32)
        drop = drop + (stab & ~take).astype(jnp.int32)
        nxt = jnp.where(box_hit & ~is_leaf, tree.left[node], tree.escape[node])
        return jnp.where(live, nxt, cur), buf, cnt, drop, steps + 1

    _, buf, cnt, drop, _ = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.zeros((r,), jnp.int32),
            jnp.zeros((r, max_k), jnp.int32),
            jnp.zeros((r,), jnp.int32),
            jnp.zeros((r,), jnp.int32),
            jnp.int32(0),
        ),
    )
    return buf, k_ar[None, :] < cnt[:, None], drop


def hittable_pdf_sum_sparse(
    lt: LightTree,
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3) unit
    pivot: jnp.ndarray,  # (R, 3)
    max_k: int = MAX_POTENTIAL_TARGETS,
    with_stats: bool = False,
) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
    """`hittable_pdf_sum` without any (R, E) table: AABB-collect candidate
    leaves via the light BVH, intersect only those K triangles, and compute
    their selection pdfs with bounded walks (the reference's exact
    formulation, _recompute_pdf material_operations.h:26-72 over the
    traverse_bvh_target collection).

    `with_stats=True` additionally returns the (R,) int32 count of stabbed
    emitter leaves dropped past `max_k` — a nonzero count flags rays whose
    mixture pdf is biased low (firefly risk on dense emitter panels viewed
    edge-on; raise GPT_TPU_MAX_TARGETS if it shows up)."""
    from gpu_pathtracer_tpu.ops import trace as trace_mod

    cand, ok, dropped = collect_hit_leaves(lt, origin, direction, max_k)
    tri = trace_mod.gather_rows(lt.tri_p, cand)  # (R, K, 3, 3)
    tol = lt.tol[cand]
    t, bary, hit = intersect.intersect_tris(
        origin, direction, tri, tol, jnp.inf
    )  # (R, K), (R, K, 3)
    n_hit = linalg.normalize(
        jnp.sum(bary[..., None] * trace_mod.gather_rows(lt.tri_n, cand), axis=-2),
        SMALL_EPS,
    )
    cos = jnp.abs(linalg.dot(direction[..., None, :], n_hit))
    geom = jnp.where(
        hit & ok,
        (t * t) / jnp.maximum(cos * lt.area[cand], 1e-20),
        0.0,
    )
    node_pdf = node_pdf_walk(lt, cand, origin, pivot)  # (R, K)
    s = jnp.sum(jnp.where(hit & ok, node_pdf * geom, 0.0), axis=-1)
    if with_stats:
        return s, dropped
    return s


def hittable_pdf_sum(
    lt: LightTree,
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3) unit
    pivot: jnp.ndarray,  # (R, 3)
    node_pdf: jnp.ndarray | None = None,  # (R, E) reuse from pick step
) -> jnp.ndarray:
    """sum_i node_pdf_i * geom_pdf_i over every emitter the ray hits
    (_recompute_pdf, material_operations.h:26-72).

    geom_pdf = t^2 / (|cos| * area) at the watertight hit of THAT emitter
    (triangle.h:95-110); zero on a miss, so summing over all emitters equals
    the reference's AABB-culled sum exactly.
    """
    if node_pdf is None:
        node_pdf = leaf_node_pdfs(lt, origin, pivot)  # (R, E)
    t, bary, hit = intersect.intersect_tris(
        origin, direction, lt.tri_p[None], lt.tol[None], jnp.inf
    )  # (R, E), (R, E, 3)
    n_hit = linalg.normalize(
        jnp.sum(bary[..., None] * lt.tri_n[None], axis=-2), SMALL_EPS
    )  # (R, E, 3)
    cos = jnp.abs(linalg.dot(direction[..., None, :], n_hit))
    geom = jnp.where(
        hit,
        (t * t) / jnp.maximum(cos * lt.area[None, :], 1e-20),
        0.0,
    )
    return jnp.sum(node_pdf * geom, axis=-1)
