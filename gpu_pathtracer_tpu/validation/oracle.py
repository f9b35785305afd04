"""Scalar NumPy transcription of the reference renderer's path-tracing
control flow — an INDEPENDENT oracle of reference semantics.

Every golden fixture in this repo validates the wavefront renderer against
its own math; a shared misreading of, say, `check_next_path`'s branch order
would pass every such test.  This module re-derives the estimator DIRECTLY
from the reference CUDA sources, one ray at a time, with the same branch
structure, in plain Python/NumPy — deliberately slow, deliberately
un-vectorized (except the closest-hit inner loop over triangles, which is
numpy-vectorized but semantically the reference's exhaustive
traversal: the BVH visits a superset of nodes and keeps the min-t hit,
triangle.h:343-408 + bvh_traversal.h:12-84).

Transcribed functions (file:line refer to /root/reference/src):

* `_compute_color`            — render/pathtracing.h:86-200
* `check_next_path`           — model/material/material.h:536-651
* `_check_if_false_hit`       — model/material/material.h:230-258
* `_get_false_hit_parameters` — model/material/material.h:510-530
* `_refract`                  — model/material/material.h:259-410
* `change_ref_ray`            — model/material/material_operations.h:87-153
* `_recompute_pdf`            — model/material/material_operations.h:26-73
* `generate_ray`              — model/ray/ray_operations.h:17-36
* `CartesianSystem`           — model/cartesian_system.h:27-42,56-83
* pdf/filter helpers          — util/vector_util.h:48-246
* random unit vectors         — util/vector_util.h:249-296
* material-list operations    — render/material_list_operations.h:9-58
* light-tree pick / pdf       — model/bvh/bvh_traversal_target.h:48-161,
                                model/bvh/bvh.h:60-96 (importance),
                                model/geometry/triangle.h:84-110 (directed
                                energy, hittable pdf), :199-224 (sampling)

Deliberate simplifications (documented, not semantic deviations for the
configurations the oracle is run on):

* No textures: `get_texture_*` return the material constants, which is
  exactly what the reference computes for its 1x1 default textures
  (material.h:652-668 floors uv into a 1x1 image -> texel 0).
* The light tree is a simple balanced binary tree over the emissive
  triangles rather than the reference's Morton LBVH.  Topology changes the
  per-sample mixture pdf but NOT the estimator's expectation (the pick pdf
  and the recomputed mixture pdf use the SAME tree, bvh_traversal_target.h:
  48-77); the oracle-vs-wavefront comparison is statistical, so either
  topology must converge to the same image.
* No SSS / participating media (the oracle covers the PT path;
  `sub_surface_scattering` is false for every material it is given).

RNG: a `numpy.random.Generator` stands in for curand; draws happen at the
same control-flow points and in the same order as the reference's
`curand_uniform` calls.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

# param.h
SMALL_DOUBLE = 1e-10  # /root/reference/src/param.h
MAX_PHONG_N_S = 1e3


# ---------------------------------------------------------------------------
# small vector helpers (vec3 semantics)
# ---------------------------------------------------------------------------

def _unit(v):
    return v / np.linalg.norm(v)


def _de_nan(v):
    # util/vector_util.h de_nan: components that are nan -> 0
    return np.where(np.isnan(v), 0.0, v)


class CartesianSystem:
    """model/cartesian_system.h:27-42 (z-axis constructor) + :56-83."""

    def __init__(self, new_z):
        z = _unit(np.asarray(new_z, np.float64))
        if abs(z[0]) > abs(z[1]):
            x = np.array([z[2], 0.0, -z[0]]) / math.sqrt(z[0] * z[0] + z[2] * z[2])
        else:
            x = np.array([0.0, -z[2], z[1]]) / math.sqrt(z[1] * z[1] + z[2] * z[2])
        y = _unit(np.cross(z, x))
        self.x, self.y, self.z = x, y, z

    def to_world_system(self, v):
        out = v[0] * self.x + v[1] * self.y + v[2] * self.z
        return _unit(out)  # :74 make_unit_vector


# ---------------------------------------------------------------------------
# materials
# ---------------------------------------------------------------------------

@dataclasses.dataclass(eq=False)
class OracleMaterial:
    """Material constants (material.h:413-498 constructor).  eq=False so
    identity comparisons (`material_list[idx] == material`,
    material_list_operations.h:12,26) are pointer-like."""

    diffuse: np.ndarray
    specular: np.ndarray
    emission: np.ndarray
    transmission: np.ndarray
    t_r: float = 0.0
    n_s: float = 1.0
    n_i: float = 1.0
    priority: int = 99999

    def __post_init__(self):
        # material.h:459-462: phong exponent above the cap on a transparent
        # material becomes a perfect mirror (n_s = INFINITY)
        if self.n_s >= MAX_PHONG_N_S and self.t_r > 0:
            self.n_s = math.inf

    def is_transparent(self):
        return self.t_r > 0  # material.h:533-535


def get_material_priority(m):
    return 9999999 if m is None else m.priority  # material.h:130-136


def get_material_refraction_index(m):
    return 1.0 if m is None else m.n_i  # material.h:138-144


def is_material_inside(mlist, m):
    return any(x is m for x in mlist)  # material.h:146-155


def add_new_material(mlist, m):
    # material_list_operations.h:9-17
    if is_material_inside(mlist, m):
        return
    mlist.append(m)


def remove_a_material(mlist, m):
    # material_list_operations.h:19-41 (removes the LAST occurrence)
    for idx in range(len(mlist) - 1, -1, -1):
        if mlist[idx] is m:
            del mlist[idx]
            return


def find_highest_prioritised_materials(mlist):
    # material.h:157-196: lowest priority value wins; ties keep the EARLIEST
    # list entry (strict < while iterating from the back)
    highest = None
    for idx in range(len(mlist) - 1, -1, -1):
        if get_material_priority(mlist[idx]) < get_material_priority(highest):
            highest = mlist[idx]
    second = None
    for idx in range(len(mlist) - 1, -1, -1):
        if (
            get_material_priority(mlist[idx]) < get_material_priority(second)
            and get_material_priority(mlist[idx])
            > get_material_priority(highest)
        ):
            second = mlist[idx]
    return highest, second


# ---------------------------------------------------------------------------
# pdf / filter helpers (util/vector_util.h)
# ---------------------------------------------------------------------------

def n_s_too_large(n):
    return abs(n - MAX_PHONG_N_S) < SMALL_DOUBLE or n >= MAX_PHONG_N_S


def reflect(v, normal):
    return v - 2.0 * np.dot(v, normal) * normal


def compute_phong_filter(k, n, ideal_dir, dir):
    # vector_util.h:219-228
    if n_s_too_large(n):
        return k * MAX_PHONG_N_S / 2.0
    return k * (n + 2.0) * max(0.0, np.dot(ideal_dir, dir)) ** n / 2.0


def compute_schlick_specular(cos_theta, n_1, n_2):
    # vector_util.h:207-212
    r_0 = ((n_1 - n_2) / (n_1 + n_2)) ** 2
    return r_0 + (1 - r_0) * (1 - cos_theta) ** 5


def compute_diffuse_sampling_pdf(normal, reflected_dir):
    # vector_util.h:201-205
    return max(0.0, np.dot(normal, reflected_dir) / math.pi)


def _phong_lobe_pdf_2(perfect_out, out, n):
    if n_s_too_large(n):
        return 1.0 / (2 * math.pi)
    return max(0.0, np.dot(perfect_out, out)) ** n / (2 * math.pi)


def compute_specular_sampling_pdf_2(v_in, out, normal, perfect_out, n, refracted):
    # vector_util.h:123-159 (_2 variants; note the reference's sign
    # conventions: reflection wants in/out on OPPOSITE sides of the normal)
    dot1 = np.dot(v_in, normal)
    dot2 = np.dot(normal, out)
    if refracted:
        same_side = (dot1 >= 0 and dot2 >= 0) or (dot1 <= 0 and dot2 <= 0)
        return _phong_lobe_pdf_2(perfect_out, out, n) if same_side else 0.0
    opposite = (dot1 >= 0 and dot2 <= 0) or (dot1 <= 0 and dot2 >= 0)
    return _phong_lobe_pdf_2(perfect_out, out, n) if opposite else 0.0


def _phong_lobe_pdf(perfect_out, out, n):
    if n_s_too_large(n):
        return MAX_PHONG_N_S / (2 * math.pi)
    return (n + 1.0) * max(0.0, np.dot(perfect_out, out)) ** n / (2 * math.pi)


def compute_specular_sampling_pdf(v_in, out, normal, perfect_out, n, refracted):
    # vector_util.h:75-121
    dot1 = np.dot(v_in, normal)
    dot2 = np.dot(normal, out)
    if refracted:
        same_side = (dot1 >= 0 and dot2 >= 0) or (dot1 <= 0 and dot2 <= 0)
        return _phong_lobe_pdf(perfect_out, out, n) if same_side else 0.0
    opposite = (dot1 >= 0 and dot2 <= 0) or (dot1 <= 0 and dot2 >= 0)
    return _phong_lobe_pdf(perfect_out, out, n) if opposite else 0.0


def compute_scattering_pdf(normal, next_dir, diffuse, coming_dir, refracted):
    # vector_util.h:161-175
    if diffuse:
        return max(0.0, np.dot(normal, next_dir))
    dot1 = np.dot(coming_dir, normal)
    dot2 = np.dot(next_dir, normal)
    ok = (
        (dot1 >= 0 and dot2 <= 0 and not refracted)
        or (dot1 <= 0 and dot2 >= 0 and not refracted)
        or (dot1 >= 0 and dot2 >= 0 and refracted)
        or (dot1 <= 0 and dot2 <= 0 and refracted)
    )
    return float(ok)


def compute_sampling_pdf_2(normal, next_dir, diffuse, n, coming_dir,
                           perfect_next_dir, refracted):
    # vector_util.h:177-188
    if diffuse:
        return compute_diffuse_sampling_pdf(normal, next_dir)
    return compute_specular_sampling_pdf_2(
        coming_dir, next_dir, normal, perfect_next_dir, n, refracted
    )


# ---------------------------------------------------------------------------
# random unit vectors + generate_ray (util/vector_util.h, ray_operations.h)
# ---------------------------------------------------------------------------

def get_random_unit_vector_phong(n, rng):
    # vector_util.h:249-262
    if n_s_too_large(n):
        return np.array([0.0, 0.0, 1.0])
    r1 = rng.random()
    r2 = rng.random()
    x = math.sqrt(1 - r1 ** (2.0 / (n + 1))) * math.cos(2 * math.pi * r2)
    y = math.sqrt(1 - r1 ** (2.0 / (n + 1))) * math.sin(2 * math.pi * r2)
    z = r1 ** (1.0 / (n + 1))
    return _unit(np.array([x, y, z]))


def get_random_unit_vector_hemisphere(rng):
    # vector_util.h:264-272 (NOTE: samples sin_theta uniformly — the
    # reference's quirk, reproduced verbatim)
    sin_theta = rng.random()
    cos_theta = math.sqrt(1 - sin_theta * sin_theta)
    phi = rng.random() * 2 * math.pi
    return _unit(np.array(
        [sin_theta * math.cos(phi), sin_theta * math.sin(phi), cos_theta]
    ))


def get_random_unit_vector_hemisphere_cos_pdf(rng):
    # vector_util.h:274-287
    r1 = rng.random()
    r2 = rng.random()
    z = math.sqrt(1 - r2)
    phi = 2 * math.pi * r1
    return _unit(np.array(
        [math.cos(phi) * math.sqrt(r2), math.sin(phi) * math.sqrt(r2), z]
    ))


@dataclasses.dataclass
class Ray:
    p0: np.ndarray
    dir: np.ndarray  # normalized on construction like ray.h

    def __post_init__(self):
        self.dir = _unit(np.asarray(self.dir, np.float64))


def generate_ray(init_point, main_dir, normal, mode, n, rng):
    # ray_operations.h:17-36
    if mode == 0:
        sys_ = CartesianSystem(normal)
        v3 = get_random_unit_vector_hemisphere_cos_pdf(rng)
    elif mode == 1:
        sys_ = CartesianSystem(main_dir)
        v3 = get_random_unit_vector_phong(n, rng)
    else:
        sys_ = CartesianSystem(normal)
        v3 = get_random_unit_vector_hemisphere(rng)
    return Ray(init_point, sys_.to_world_system(v3))


# ---------------------------------------------------------------------------
# geometry: closest hit (triangle.h:343-408) over a flat triangle list
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class OracleScene:
    p: np.ndarray        # (T, 3, 3) vertices
    n: np.ndarray        # (T, 3, 3) vertex normals
    mats: list           # (T,) OracleMaterial per triangle
    tolerance: np.ndarray  # (T,)
    sky_emission: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )


@dataclasses.dataclass
class HitRecord:
    t: float = 0.0
    point: np.ndarray = None
    normal: np.ndarray = None
    tri: int = -1
    coming_ray: Ray = None


def triangle_tolerance(p):
    """triangle.h tolerance: a scale-relative epsilon.  The oracle uses the
    repo's formula (ops/intersect.triangle_tolerance) — it only gates
    self-intersection, identical in effect for these scenes."""
    ext = np.max(np.abs(p), axis=(1, 2))
    return np.maximum(1e-7, 1e-6 * ext)


def closest_hit(scene: OracleScene, ray: Ray, t_max=np.inf):
    """Exhaustive min-t hit: the scalar equivalent of traverse_bvh
    (bvh_traversal.h:12-84) + Triangle::hit (triangle.h:343-408).  The Woop
    test below is vectorized over triangles but branch-for-branch the
    reference's; the BVH only prunes, so min over all triangles is the same
    answer."""
    p0 = ray.p0
    d = ray.dir
    v = scene.p - p0[None, None, :]  # (T, 3, 3)

    kz = int(np.argmax(np.abs(d)))
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    dp = np.array([d[kx], d[ky], d[kz]])
    vp = v[:, :, [kx, ky, kz]]

    sx = -dp[0] / dp[2]
    sy = -dp[1] / dp[2]
    sz = 1.0 / dp[2]
    x = vp[:, :, 0] + sx * vp[:, :, 2]
    y = vp[:, :, 1] + sy * vp[:, :, 2]
    z = vp[:, :, 2] * sz

    e1 = x[:, 1] * y[:, 2] - y[:, 1] * x[:, 2]
    e2 = x[:, 2] * y[:, 0] - y[:, 2] * x[:, 0]
    e3 = x[:, 0] * y[:, 1] - y[:, 0] * x[:, 1]

    mixed = ((e1 < 0) | (e2 < 0) | (e3 < 0)) & ((e1 > 0) | (e2 > 0) | (e3 > 0))
    det = e1 + e2 + e3
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (e1 * z[:, 0] + e2 * z[:, 1] + e3 * z[:, 2]) / det
    ok = (~mixed) & (det != 0) & (t >= scene.tolerance) & (t <= t_max)
    t = np.where(ok, t, np.inf)
    i = int(np.argmin(t))
    if not np.isfinite(t[i]):
        return False, None
    inv_det = 1.0 / det[i]
    b1, b2, b3 = e1[i] * inv_det, e2[i] * inv_det, e3[i] * inv_det
    rec = HitRecord(
        t=float(t[i]),
        point=b1 * scene.p[i, 0] + b2 * scene.p[i, 1] + b3 * scene.p[i, 2],
        normal=_unit(
            b1 * scene.n[i, 0] + b2 * scene.n[i, 1] + b3 * scene.n[i, 2]
        ),  # triangle.h:404-406 + _get_normal (interpolated, NOT flipped)
        tri=i,
        coming_ray=ray,
    )
    return True, rec


# ---------------------------------------------------------------------------
# light tree (balanced; reference-style importance descent + pdf walk)
# ---------------------------------------------------------------------------

class _LNode:
    __slots__ = ("left", "right", "parent", "is_leaf", "tri", "box_lo",
                 "box_hi", "center", "energy")


def _tri_energy(scene, i):
    # triangle.h:112-130 _compute_energy: avg emission * area * pi
    area = 0.5 * np.linalg.norm(
        np.cross(scene.p[i, 1] - scene.p[i, 0], scene.p[i, 2] - scene.p[i, 0])
    )
    return scene.mats[i].emission * area * math.pi


def build_light_tree(scene: OracleScene):
    """Balanced binary tree over emissive triangles (see module docstring:
    topology-free estimator).  Returns (root, leaves by light index)."""
    lights = [
        i for i in range(scene.p.shape[0])
        if np.any(scene.mats[i].emission > 0)
    ]
    if not lights:
        return None, []

    leaves = []

    def make(idx_list):
        node = _LNode()
        node.parent = None
        if len(idx_list) == 1:
            i = idx_list[0]
            node.is_leaf = True
            node.tri = i
            node.left = node.right = None
            node.box_lo = scene.p[i].min(axis=0)
            node.box_hi = scene.p[i].max(axis=0)
            node.energy = _tri_energy(scene, i)
            leaves.append((i, node))
            return node
        node.is_leaf = False
        node.tri = -1
        mid = len(idx_list) // 2
        node.left = make(idx_list[:mid])
        node.right = make(idx_list[mid:])
        node.left.parent = node
        node.right.parent = node
        node.box_lo = np.minimum(node.left.box_lo, node.right.box_lo)
        node.box_hi = np.maximum(node.left.box_hi, node.right.box_hi)
        node.energy = node.left.energy + node.right.energy
        return node

    root = make(lights)
    for n in [root] + [l for _, l in leaves]:
        pass
    # centers
    def set_center(n):
        n.center = 0.5 * (n.box_lo + n.box_hi)
        if not n.is_leaf:
            set_center(n.left)
            set_center(n.right)
    set_center(root)
    return root, leaves


def _fixed_normal(scene, i):
    # avg vertex normal at barycenter (triangle.h:87 _get_normal(1/3,1/3,1/3))
    return _unit(scene.n[i].mean(axis=0))


def compute_directed_energy(scene, i, point):
    # triangle.h:84-92
    avg_normal = _fixed_normal(scene, i)
    centroid = scene.p[i].mean(axis=0)
    dir = _unit(point - centroid)
    energy = _tri_energy(scene, i)
    # NOTE normal-facing factor uses the SHADING point normal in the
    # reference; compute_importance passes `normal` through — the oracle
    # keeps the same signature
    return energy, avg_normal, dir


def compute_importance(scene, node, point, normal):
    # bvh.h:60-96: cone terms are commented out in the reference; importance
    # is |effective_energy| / dist^2(point, box center)
    dir = point - node.center
    if node.is_leaf:
        energy, avg_normal, d = compute_directed_energy(scene, node.tri, point)
        eff = energy * max(
            0.0, np.dot(avg_normal, d) * np.dot(-d, normal)
        )  # triangle.h:91
    else:
        eff = node.energy
    d2 = float(np.dot(dir, dir))
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(np.linalg.norm(eff)) / d2 if d2 > 0 else math.inf


def traverse_bvh_to_pick_a_target(scene, root, point, normal, rng):
    # bvh_traversal_target.h:79-112
    node = root
    while not node.is_leaf:
        li = compute_importance(scene, node.left, point, normal)
        ri = compute_importance(scene, node.right, point, normal)
        tot = li + ri
        factor = 0.5 if tot < 1e-10 else li / tot
        if rng.random() < factor:
            node = node.left
        else:
            node = node.right
    return node


def get_node_pdf(scene, leaf, point, normal):
    # bvh_traversal_target.h:48-77
    pdf = 1.0
    it = leaf
    while it.parent is not None:
        i1 = compute_importance(scene, it, point, normal)
        other = it.parent.right if it.parent.left is it else it.parent.left
        i2 = compute_importance(scene, other, point, normal)
        tot = i1 + i2
        it_pdf = i1 / tot if tot != 0 else math.nan
        if math.isnan(it_pdf) or math.isinf(it_pdf):
            pdf *= 0.5
        else:
            pdf *= it_pdf
        it = it.parent
    return pdf


def get_random_point_on_surface(scene, i, rng):
    # triangle.h:199-224 (only the point is needed by change_ref_ray)
    r1 = rng.random()
    r2 = rng.random()
    u = 1 - math.sqrt(r1)
    v = r2 * math.sqrt(r1)
    return (
        u * scene.p[i, 0] + v * scene.p[i, 1] + (1 - u - v) * scene.p[i, 2]
    )


def get_hittable_pdf(scene, i, origin, dir):
    # triangle.h:95-110
    dir = _unit(dir)
    sub = OracleScene(
        p=scene.p[i: i + 1], n=scene.n[i: i + 1],
        mats=[scene.mats[i]], tolerance=scene.tolerance[i: i + 1],
    )
    hit, rec = closest_hit(sub, Ray(origin, dir))
    if not hit:
        return 0.0
    area = 0.5 * np.linalg.norm(
        np.cross(scene.p[i, 1] - scene.p[i, 0], scene.p[i, 2] - scene.p[i, 0])
    )
    cosine = abs(np.dot(dir, rec.normal))
    return rec.t * rec.t / (cosine * area)


def _ray_hits_box(ray, lo, hi):
    # bounding_box.h slab test (is_intersection)
    with np.errstate(divide="ignore"):
        inv = 1.0 / np.where(np.abs(ray.dir) < 1e-20, 1e-20, ray.dir)
    ta = (lo - ray.p0) * inv
    tb = (hi - ray.p0) * inv
    tlo = np.max(np.minimum(ta, tb))
    thi = np.min(np.maximum(ta, tb))
    return thi >= tlo and thi > 0


def traverse_bvh_target(root, ray, max_targets=400):
    # bvh_traversal_target.h:114-161: collect leaves whose box the ray hits
    out = []

    def walk(node):
        if len(out) >= max_targets:
            return
        if not _ray_hits_box(ray, node.box_lo, node.box_hi):
            return
        if node.is_leaf:
            out.append(node)
            return
        walk(node.left)
        walk(node.right)

    walk(root)
    return out


# ---------------------------------------------------------------------------
# reflection_record + check_next_path (material.h:536-651)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ReflectionRecord:
    ray: Ray = None
    filter: np.ndarray = None
    pdf: float = 1.0
    false_hit: bool = False
    reflected: bool = False
    refracted: bool = False
    diffuse: bool = False
    entering: bool = False
    bent: bool = False
    next_material: OracleMaterial = None
    perfect_reflection_dir: np.ndarray = None
    n: float = 1.0
    k: np.ndarray = None


def _get_false_hit_parameters(hit_point, v_in, normal, highest):
    # material.h:510-530
    ref = ReflectionRecord()
    ref.false_hit = True
    ref.reflected = False
    ref.refracted = True
    ref.ray = Ray(hit_point, v_in)
    ref.filter = np.ones(3)
    ref.pdf = 1.0
    ref.diffuse = False
    ref.bent = False
    ref.entering = np.dot(v_in, normal) <= 0
    ref.next_material = highest
    return ref


def _refract(mat, ref, hit_point, v_in, normal, highest, second, rng,
             force_refract=False):
    # material.h:259-410
    random_number = rng.random()
    hi_idx = get_material_refraction_index(highest)
    sec_idx = get_material_refraction_index(second)

    k = mat.transmission * mat.t_r
    local_n_s = mat.n_s
    ref.n = local_n_s

    if np.dot(v_in, normal) <= 0:
        cos_theta_1 = np.dot(v_in, -normal)
        reflection_probability = compute_schlick_specular(
            cos_theta_1, hi_idx, mat.n_i
        )
        if random_number >= reflection_probability or force_refract:
            sin_theta_1 = math.sqrt(max(0.0, 1 - cos_theta_1 ** 2))
            v_in_perp = -cos_theta_1 * normal
            v_in_par = v_in - v_in_perp
            sin_theta_2 = hi_idx / mat.n_i * sin_theta_1
            cos_theta_2 = math.sqrt(max(0.0, 1 - sin_theta_2 ** 2))
            tan_theta_2 = sin_theta_2 / cos_theta_2 if cos_theta_2 else math.inf
            if abs(tan_theta_2) > SMALL_DOUBLE:
                v_out = v_in_par + (
                    -1.0 / tan_theta_2 * np.linalg.norm(v_in_par) * normal
                )
                v_out = _unit(v_out)
            else:
                v_out = -normal
            ref.perfect_reflection_dir = v_out
            ref.diffuse = False
            ref.reflected = False
            ref.refracted = True
            ref.false_hit = False
            ref.entering = True
            ref.next_material = mat
            ref.bent = abs(hi_idx - mat.n_i) > SMALL_DOUBLE
        else:
            v_out = _unit(reflect(v_in, normal))
            ref.perfect_reflection_dir = v_out
            ref.diffuse = False
            ref.reflected = True
            ref.refracted = False
            ref.false_hit = False
            ref.entering = False
            ref.next_material = highest
    else:
        sin_theta_1_max = sec_idx / mat.n_i
        cos_theta_1 = np.dot(v_in, normal)
        sin_theta_1 = math.sqrt(max(0.0, 1 - cos_theta_1 ** 2))
        reflection_probability = compute_schlick_specular(
            cos_theta_1, mat.n_i, sec_idx
        )
        if (
            sin_theta_1 >= sin_theta_1_max
            or random_number <= reflection_probability
        ) and not force_refract:
            v_out = _unit(reflect(v_in, -normal))
            ref.perfect_reflection_dir = v_out
            ref.diffuse = False
            ref.reflected = True
            ref.refracted = False
            ref.false_hit = False
            ref.entering = False
            ref.next_material = mat
        else:
            v_in_perp = cos_theta_1 * normal
            v_in_par = v_in - v_in_perp
            sin_theta_2 = mat.n_i / sec_idx * sin_theta_1
            cos_theta_2 = math.sqrt(max(0.0, 1 - sin_theta_2 ** 2))
            tan_theta_2 = sin_theta_2 / cos_theta_2 if cos_theta_2 else math.inf
            if abs(tan_theta_2) > SMALL_DOUBLE:
                v_out = v_in_par + (
                    1.0 / tan_theta_2 * np.linalg.norm(v_in_par) * normal
                )
                v_out = _unit(v_out)
            else:
                v_out = normal
            ref.perfect_reflection_dir = v_out
            ref.diffuse = False
            ref.reflected = False
            ref.refracted = True
            ref.false_hit = False
            ref.entering = False
            ref.next_material = second
            ref.bent = abs(sec_idx - mat.n_i) > SMALL_DOUBLE

    ref.ray = generate_ray(hit_point, v_out, normal, 1, local_n_s, rng)
    ref.k = k
    ref.filter = compute_phong_filter(k, local_n_s, v_out, ref.ray.dir)

    if ref.next_material is not None and ref.next_material is not mat:
        k2 = ref.next_material.transmission * ref.next_material.t_r
        n_s_2 = ref.next_material.n_s
        ref.k = ref.k * k2
        ref.filter = ref.filter * compute_phong_filter(
            k2, n_s_2, v_out, ref.ray.dir
        )

    sampling_pdf = compute_sampling_pdf_2(
        normal, ref.ray.dir, ref.diffuse, ref.n, v_in,
        ref.perfect_reflection_dir, ref.refracted
    )
    scattering_pdf = compute_scattering_pdf(
        normal, ref.ray.dir, ref.diffuse, v_in, ref.refracted
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        # numpy scalar division: 0/0 -> nan, x/0 -> inf (C float semantics)
        ref.pdf = float(
            np.float64(sampling_pdf) * math.pi / np.float64(scattering_pdf)
        )


def check_next_path(mat, coming_ray, hit_point, normal, material_list, rng,
                    force_refract=False):
    """material.h:536-651.  Returns (ref, sss).  material_list is mutated by
    the CALLER (the _compute_color loop), exactly like the reference."""
    ref = ReflectionRecord()
    ref.next_material = None
    v_in = coming_ray.dir

    highest, second = find_highest_prioritised_materials(material_list)
    ref.false_hit = mat.priority > get_material_priority(highest)

    if ref.false_hit:
        ref = _get_false_hit_parameters(hit_point, v_in, normal, highest)
        return ref, False

    if mat.is_transparent():
        _refract(mat, ref, hit_point, v_in, normal, highest, second, rng,
                 force_refract)
        return ref, False

    actual_mat = mat  # the is_transparent() re-check is dead code here
    random_number = rng.random()

    kd_length = np.linalg.norm(actual_mat.diffuse)
    ks_length = np.linalg.norm(actual_mat.specular)
    with np.errstate(invalid="ignore"):
        # numpy scalar: 0/0 -> nan (the reference's pure-emitter quirk)
        factor = float(np.float64(ks_length) / np.float64(kd_length + ks_length))
    local_n_s = actual_mat.n_s

    if random_number > factor:  # NaN compares false -> specular branch
        ref.ray = generate_ray(hit_point, np.zeros(3), normal, 0, 1, rng)
        ref.filter = actual_mat.diffuse.copy()
        ref.diffuse = True
        ref.reflected = False
        ref.refracted = False
        ref.k = ref.filter
        ref.next_material = highest
        ref.n = 1.0
    else:
        reflected_dir = reflect(v_in, normal)
        ref.ray = generate_ray(hit_point, reflected_dir, normal, 1,
                               local_n_s, rng)
        k = actual_mat.specular
        ref.filter = compute_phong_filter(k, local_n_s, reflected_dir,
                                          ref.ray.dir)
        ref.diffuse = False
        ref.reflected = True
        ref.refracted = False
        ref.perfect_reflection_dir = reflected_dir
        ref.n = local_n_s
        ref.k = k
        ref.next_material = highest

    sampling_pdf = compute_sampling_pdf_2(
        normal, ref.ray.dir, ref.diffuse, local_n_s, v_in,
        ref.perfect_reflection_dir, ref.refracted
    )
    scattering_pdf = compute_scattering_pdf(
        normal, ref.ray.dir, ref.diffuse, v_in, ref.refracted
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        # numpy scalar division: 0/0 -> nan, x/0 -> inf (C float semantics)
        ref.pdf = float(
            np.float64(sampling_pdf) * math.pi / np.float64(scattering_pdf)
        )
    return ref, False


# ---------------------------------------------------------------------------
# change_ref_ray + _recompute_pdf (material_operations.h)
# ---------------------------------------------------------------------------

def _recompute_pdf(scene, root, rec, origin, dir, hittable_pdf_weight, ref):
    # material_operations.h:26-73
    if ref.diffuse:
        pivot = rec.normal
    else:
        pivot = ref.perfect_reflection_dir

    dir = _unit(dir)
    ray = Ray(origin, dir)
    hittable_pdf = 0.0
    for leaf in traverse_bvh_target(root, ray):
        node_pdf = get_node_pdf(scene, leaf, origin, pivot)
        hittable_pdf += node_pdf * get_hittable_pdf(
            scene, leaf.tri, rec.point, dir
        )

    if ref.diffuse:
        sampling_pdf = compute_diffuse_sampling_pdf(rec.normal, ref.ray.dir)
    else:
        sampling_pdf = compute_specular_sampling_pdf(
            rec.coming_ray.dir, ref.ray.dir, rec.normal,
            ref.perfect_reflection_dir, ref.n, ref.refracted
        )
    return (
        hittable_pdf_weight * hittable_pdf
        + (1 - hittable_pdf_weight) * sampling_pdf
    )


def change_ref_ray(scene, root, rec, ref, hittable_pdf_weight, rng):
    # material_operations.h:87-153.  Returns factor.
    random_number = rng.random()
    default_ray = ref.ray

    if ref.diffuse:
        pivot = rec.normal
    else:
        pivot = ref.perfect_reflection_dir

    if math.isinf(ref.n):
        hittable_pdf_weight = 0.0  # :108-109 mirror lobes never redirect

    if random_number < hittable_pdf_weight:
        leaf = traverse_bvh_to_pick_a_target(
            scene, root, default_ray.p0, pivot, rng
        )
        new_target_point = get_random_point_on_surface(scene, leaf.tri, rng)
        new_dir = new_target_point - default_ray.p0
        ref.ray = Ray(default_ray.p0, new_dir)
        if ref.reflected or ref.refracted:
            ref.filter = compute_phong_filter(ref.k, ref.n, pivot,
                                              ref.ray.dir)

    pdf = _recompute_pdf(
        scene, root, rec, ref.ray.p0, ref.ray.dir, hittable_pdf_weight, ref
    )
    scattering_pdf = compute_scattering_pdf(
        rec.normal, ref.ray.dir, ref.diffuse, rec.coming_ray.dir,
        ref.refracted
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        # numpy scalar division: 0/0 -> nan, x/0 -> inf (C float semantics)
        return float(np.float64(scattering_pdf) / math.pi / np.float64(pdf))


# ---------------------------------------------------------------------------
# the estimator: _compute_color (pathtracing.h:86-200)
# ---------------------------------------------------------------------------

def compute_color(scene: OracleScene, light_root, ray_init: Ray, level: int,
                  hittable_pdf_weight: float, rng) -> np.ndarray:
    mask = np.ones(3)
    acc_color = np.zeros(3)
    ray = ray_init
    material_list: list = [None]  # pathtracing.h:110 add_new_material(nullptr)

    for i in range(level):
        factor = 1.0
        hit, cur_rec = closest_hit(scene, ray)

        if hit:
            mat = scene.mats[cur_rec.tri]
            ref, sss = check_next_path(
                mat, cur_rec.coming_ray, cur_rec.point, cur_rec.normal,
                material_list, rng
            )

            if not ref.false_hit and light_root is not None:
                # pathtracing.h:131-140 (the sss/!sss_first_pass arm is not
                # exercised: the oracle has no SSS materials)
                factor = change_ref_ray(
                    scene, light_root, cur_rec, ref, hittable_pdf_weight, rng
                )

            # pathtracing.h:148-166 dielectric-stack bookkeeping
            if ref.false_hit and ref.entering:
                add_new_material(material_list, mat)
            if ref.false_hit and not ref.entering:
                remove_a_material(material_list, mat)
            if not ref.false_hit and ref.refracted and ref.entering:
                add_new_material(material_list, mat)
            if not ref.false_hit and ref.refracted and not ref.entering:
                remove_a_material(material_list, mat)

            if not ref.false_hit:
                light_tmp = mat.emission  # get_texture_emission, constant
                add_color = mask * light_tmp
                if np.any(np.isnan(add_color)):
                    add_color = _de_nan(add_color)
                acc_color = acc_color + add_color

                if light_root is None:
                    # no NEE targets: factor stays 1 and the reference's
                    # clamp keeps mask *= filter * clamp(0,.9999,1)
                    factor = 1.0
                if factor > 0:
                    mask = mask * (
                        ref.filter * np.clip(factor, 0.0, 0.9999)
                    )
                else:
                    return acc_color
            ray = ref.ray

        else:
            sky = scene.sky_emission  # 1x1 white bg texture
            if i < 1:
                return sky.copy()
            acc_color = acc_color + mask * sky
            return acc_color

    return acc_color


def render_oracle(scene: OracleScene, make_primary_ray, width, height,
                  sample_size, level, hittable_pdf_weight, seed=0):
    """Oracle image: mean of `sample_size` _compute_color estimates per
    pixel (main.cu's render loop divides the sample sum by sample_size).
    `make_primary_ray(i + du, j + dv)` supplies the camera ray — camera
    math is validated by its own inverse-projection tests."""
    rng = np.random.default_rng(seed)
    light_root, _ = build_light_tree(scene)
    img = np.zeros((height, width, 3))
    for i in range(height):
        for j in range(width):
            acc = np.zeros(3)
            # pixel CENTERS, no sub-pixel jitter: the reference samples
            # compute_ray(i + .5, j + .5) for every sample
            # (pathtracing.h:277-292, camera.h:68-83)
            o, d = make_primary_ray(i + 0.5, j + 0.5)
            ray0 = Ray(np.asarray(o), np.asarray(d))
            for _ in range(sample_size):
                c = compute_color(
                    scene, light_root, ray0, level, hittable_pdf_weight, rng
                )
                acc += _de_nan(c)  # pathtracing.h:287-290 de_nan per sample
            img[i, j] = acc / sample_size
    return img


# ---------------------------------------------------------------------------
# bridge: build an OracleScene from a repo Scene (host-side, numpy)
# ---------------------------------------------------------------------------

def oracle_scene_from_repo(scene) -> OracleScene:
    """Convert a built repo Scene (models/scene.py) to the oracle's flat
    representation.  Only geometry + material constants cross the bridge —
    the estimator itself is transcribed from the reference, not shared."""
    g = scene.geom
    valid = np.asarray(g.valid)
    p = np.asarray(g.p, np.float64)[valid]
    n = np.asarray(g.n, np.float64)[valid]
    mat_id = np.asarray(g.mat_id)[valid]
    mt = scene.materials
    kd = np.asarray(mt.kd, np.float64)
    ks = np.asarray(mt.ks, np.float64)
    ke = np.asarray(mt.ke, np.float64)
    tf = np.asarray(mt.tf, np.float64)
    n_s = np.asarray(mt.n_s, np.float64)
    n_i = np.asarray(mt.n_i, np.float64)
    t_r = np.asarray(mt.t_r, np.float64)
    prio = np.asarray(mt.priority)
    mats_by_id = [
        OracleMaterial(
            diffuse=kd[m], specular=ks[m], emission=ke[m], transmission=tf[m],
            t_r=float(t_r[m]), n_s=float(n_s[m]), n_i=float(n_i[m]),
            priority=int(prio[m]),
        )
        for m in range(kd.shape[0])
    ]
    return OracleScene(
        p=p,
        n=n,
        mats=[mats_by_id[int(m)] for m in mat_id],
        tolerance=np.asarray(triangle_tolerance(p)),
        sky_emission=np.asarray(scene.sky_emission, np.float64),
    )
