"""Measure whether an MXU (matmul) formulation of the ray/triangle pair
test can beat the VPU Woop kernel (README r05: "Plücker edge tests are
(R,6)x(6,3T) matmuls, movable to the MXU").

The candidate formulation packs, per triangle, five output columns driven
by one shared K=16 input row per ray:
  cols 0-2: Plücker edge tests   e_i = d . (a_i x b_i) + (o x d) . (b_i - a_i)
            (rows 0-5 of the weight: [d, o x d] against [cross, diff])
  col 3:    plane numerator      n . a - n . o   (rows 6-9: [o, 1])
  col 4:    plane denominator    n . d           (rows 10-12: [d])
A pair hits iff the three edge values share a sign (watertight across
shared edges: fp negation is exact, and the matmul contraction of a
negated column negates exactly) and t = col3/col4 lies in the window.

Legs (all on the real chip, repeat-timed):
  woop-pallas   — the production HBM Pallas closest-hit kernel on the
                  327k-tri mesh scene (pairs/s from tile_visit_stats logic
                  is NOT recomputed here; we report rays/s and the known
                  pair rate for context)
  mxu-f32       — jnp.einsum (R,16)@(16,5T) with precision=HIGHEST
                  (bf16_6x: fp32-accurate) + VPU sign/t postprocessing
  mxu-bf16      — same with default (bf16) precision: only usable as a
                  conservative prefilter, timed for the ceiling
  vpu-jnp       — the same pair test as pure VPU broadcasting in jnp
                  (XLA-compiled, no Pallas), as the apples-to-apples
                  non-MXU control

Reports achieved pair-tests/s for each.  Decision rule: the MXU leg must
beat the measured Pallas pair rate (~19.4G pairs/s VMEM-path; the mesh
path is the same kernel math) by >1.5x to justify a kernel rewrite.

Usage: python scripts/profile_mxu_pairs.py  [PROF_R=4096 PROF_T=8192]

RESULT (TPU v5e, r05): at XLA level ALL legs are bound by the (R, T)-shaped
HBM intermediates (mxu-f32 0.93G, mxu-bf16 0.94G, vpu-jnp 1.34G pairs/s vs
the Pallas kernel's ~19.4G), so this bench cannot rank the in-kernel
formulations — it does establish that the f32 hit verdicts agree 100% with
the margin analysis while raw bf16 disagrees on ~2.7% of pairs (unusable
without a conservative margin).  The decisive in-kernel numbers live in
the README mesh-path section: fp32-MXU ~parity (K=16/128 padding x 6-pass
emulation), bf16-prefilter cull ceiling 4.6% (scripts/mxu_cull_rate.py),
end-to-end 2.13M -> 1.39M rays/s.  Experiment closed.
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from gpu_pathtracer_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(label, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        times.append(time.time() - t0)
    dt = sorted(times)[len(times) // 2]
    return dt, out


def pack_weights(tri):
    """(T,3,3) triangles -> (16, 5T) f32 weight matrix (see module doc)."""
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    t = tri.shape[0]
    w = np.zeros((16, 5 * t), np.float32)
    # edge i from corner pairs (a,b), (b,c), (c,a); inward normal sign
    for i, (p, q) in enumerate(((a, b), (b, c), (c, a))):
        w[0:3, i::5] = np.cross(p, q).T          # rows 0-2 against d
        w[3:6, i::5] = (q - p).T                 # rows 3-5 against o x d
    n = np.cross(b - a, c - a)
    w[6:9, 3::5] = -n.T                          # -n . o
    w[9, 3::5] = np.einsum("td,td->t", n, a)     # + n . a
    w[10:13, 4::5] = n.T                         # n . d
    return jnp.asarray(w)


def pack_rays(o, d):
    oxd = jnp.cross(o, d)
    ones = jnp.ones((o.shape[0], 1), jnp.float32)
    pad = jnp.zeros((o.shape[0], 3), jnp.float32)
    return jnp.concatenate([d, oxd, o, ones, d, pad], axis=1)  # (R, 16)


def mxu_pairs(rv, w, t_cap, precision):
    r = rv.shape[0]
    out = jax.lax.dot_general(
        rv, w, (((1,), (0,)), ((), ())), precision=precision,
        preferred_element_type=jnp.float32,
    ).reshape(r, -1, 5)  # (R, T, 5)
    e = out[..., 0:3]
    pos = jnp.all(e >= 0, axis=-1)
    neg = jnp.all(e <= 0, axis=-1)
    den = out[..., 4]
    t = out[..., 3] / jnp.where(den == 0.0, 1.0, den)
    hit = (pos | neg) & (den != 0.0) & (t >= 1e-4) & (t <= t_cap)
    tb = jnp.where(hit, t, 3.4e38)
    best = jnp.min(tb, axis=1)
    slot = jnp.argmin(tb, axis=1)
    return best, slot


def vpu_pairs(o, d, tri, t_cap):
    """Same Woop-style math as the Pallas kernel, pure jnp broadcasting."""
    ax, ay, az = jnp.abs(d[:, 0:1]), jnp.abs(d[:, 1:2]), jnp.abs(d[:, 2:3])
    is2 = (az >= ax) & (az >= ay)
    is1 = (~is2) & (ay >= ax)
    is0 = ~(is1 | is2)

    def perm(vx, vy, vz):
        x = jnp.where(is0, vy, jnp.where(is1, vz, vx))
        y = jnp.where(is0, vz, jnp.where(is1, vx, vy))
        z = jnp.where(is0, vx, jnp.where(is1, vy, vz))
        return x, y, z

    dx, dy, dz = perm(d[:, 0:1], d[:, 1:2], d[:, 2:3])
    sx, sy, sz = -dx / dz, -dy / dz, 1.0 / dz

    def corner(cidx):
        vx = tri[None, :, cidx, 0] - o[:, 0:1]
        vy = tri[None, :, cidx, 1] - o[:, 1:2]
        vz = tri[None, :, cidx, 2] - o[:, 2:3]
        px, py, pz_ = perm(vx, vy, vz)
        return px + sx * pz_, py + sy * pz_, pz_ * sz

    x1, y1, z1 = corner(0)
    x2, y2, z2 = corner(1)
    x3, y3, z3 = corner(2)
    e1 = x2 * y3 - y2 * x3
    e2 = x3 * y1 - y3 * x1
    e3 = x1 * y2 - y1 * x2
    mixed = ((e1 < 0) | (e2 < 0) | (e3 < 0)) & ((e1 > 0) | (e2 > 0) | (e3 > 0))
    det = e1 + e2 + e3
    ts = (e1 * z1 + e2 * z2 + e3 * z3) / jnp.where(det == 0.0, 1.0, det)
    hit = (~mixed) & (det != 0.0) & (ts >= 1e-4) & (ts <= t_cap)
    tb = jnp.where(hit, ts, 3.4e38)
    return jnp.min(tb, axis=1), jnp.argmin(tb, axis=1)


def main():
    R = int(os.environ.get("PROF_R", "4096"))
    T = int(os.environ.get("PROF_T", "8192"))
    print(f"backend={jax.default_backend()}  R={R} T={T} "
          f"pairs/iter={R * T / 1e6:.1f}M", flush=True)

    rng = np.random.default_rng(7)
    tri = (rng.standard_normal((T, 3, 3)) * 0.05
           + rng.standard_normal((T, 1, 3))).astype(np.float32)
    o = rng.standard_normal((R, 3)).astype(np.float32) * 0.1
    dd = rng.standard_normal((R, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    o_j, d_j, tri_j = jnp.asarray(o), jnp.asarray(dd), jnp.asarray(tri)
    t_cap = jnp.float32(1e30)

    w = pack_weights(tri)
    rv = pack_rays(o_j, d_j)

    legs = {}
    for label, prec in (("mxu-f32", jax.lax.Precision.HIGHEST),
                        ("mxu-bf16", jax.lax.Precision.DEFAULT)):
        fn = jax.jit(lambda rv, w, p=prec: mxu_pairs(rv, w, t_cap, p))
        dt, (best, slot) = timed(label, fn, rv, w)
        legs[label] = (dt, best, slot)
        print(f"{label:10s} {dt * 1e3:8.3f} ms   "
              f"{R * T / dt / 1e9:8.2f} G pairs/s", flush=True)

    fn = jax.jit(lambda o, d, tri: vpu_pairs(o, d, tri, t_cap))
    dt, (vb, vs) = timed("vpu-jnp", fn, o_j, d_j, tri_j)
    print(f"{'vpu-jnp':10s} {dt * 1e3:8.3f} ms   "
          f"{R * T / dt / 1e9:8.2f} G pairs/s", flush=True)

    # agreement of the f32 MXU leg vs the VPU control
    mb = np.asarray(legs["mxu-f32"][1])
    vb_np = np.asarray(vb)
    both = (mb < 1e30) & (vb_np < 1e30)
    agree_hit = np.mean((mb < 1e30) == (vb_np < 1e30))
    if both.any():
        rel = np.abs(mb[both] - vb_np[both]) / np.maximum(vb_np[both], 1e-6)
        print(f"hit-verdict agreement vs VPU: {agree_hit * 100:.3f}%  "
              f"max |dt|/t on common hits: {rel.max():.2e}", flush=True)
    bb = np.asarray(legs["mxu-bf16"][1])
    print(f"bf16 hit-verdict agreement:   "
          f"{np.mean((bb < 1e30) == (vb_np < 1e30)) * 100:.3f}%", flush=True)


if __name__ == "__main__":
    main()
