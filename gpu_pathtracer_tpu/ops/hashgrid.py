"""Spatial hash grid for photon-map radiance estimation.

TPU-native replacement for the reference's per-pass photon LBVH rebuild +
sphere-query traversal (`bvh_building_photon.h`, `bvh_traversal_photon.h`):
BASELINE.json calls for hash-grid radiance estimation explicitly.  The grid
is built with one `lax.sort` (points keyed by hashed cell id) and queried
with two `searchsorted` per neighbor cell — every shape is static, so the
whole build+query pipeline jits and shards.

Design:

* world positions are quantized to integer cells of `cell_size` (chosen by
  the caller as the current max gather radius, so a radius-r query touches
  at most the 27 cells around the query point);
* cell ids are hashed into 2**`hash_bits` buckets (x,y,z prime XOR).  Hash
  collisions merely add far-away candidates, which the caller's distance
  test rejects — correctness never depends on the hash;
* photons are sorted by hash id; per-cell ranges come from binary search
  (`searchsorted`) over the sorted ids; a query gathers up to `k_per_cell`
  photons from each of its 27 neighbor cells.

Compared to the dense all-pairs gather this turns the per-pass cost from
O(pixels * photons) into O(pixels * 27 * k_per_cell).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as _np

from gpu_pathtracer_tpu.pytree import pytree_dataclass

_P1 = 73856093
_P2 = 19349663
_P3 = 83492791


@pytree_dataclass(meta=("hash_bits",))
class HashGrid:
    """Photon positions bucketed by hashed grid cell.

    Queries are O(1) table lookups: `bucket_start[h] .. bucket_start[h+1]`
    is bucket h's slot range in `sorted_idx`.  (An earlier revision kept
    the sorted hash array and ran `searchsorted` per neighbor cell — XLA
    lowers the vmapped binary search to a serial while loop of gathers
    that measured 46%% of the whole SPPM iteration on TPU; the 4 MB
    start table replaces it with two flat gathers.)"""

    sorted_idx: jnp.ndarray  # (P,) int32 original photon rows, bucket order
    bucket_start: jnp.ndarray  # (2**hash_bits + 2,) int32 exclusive prefix
    origin: jnp.ndarray  # (3,) grid origin (min corner)
    cell_size: jnp.ndarray  # () float32
    hash_bits: int = 20


def _cell_hash(ix, iy, iz, hash_bits: int):
    h = (ix * _P1) ^ (iy * _P2) ^ (iz * _P3)
    return jnp.bitwise_and(h, (1 << hash_bits) - 1).astype(jnp.int32)


def build_grid(
    pos: jnp.ndarray,  # (P, 3)
    valid: jnp.ndarray,  # (P,) bool
    cell_size: jnp.ndarray,  # () float32 — typically the max gather radius
    hash_bits: int = 20,
) -> HashGrid:
    """One sort builds the whole structure (jit-friendly, static shapes)."""
    origin = jnp.min(jnp.where(valid[:, None], pos, jnp.inf), axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    cell = jnp.maximum(cell_size, 1e-12)
    q = jnp.floor((pos - origin[None, :]) / cell).astype(jnp.int32)
    h = _cell_hash(q[:, 0], q[:, 1], q[:, 2], hash_bits)
    # invalid photons sort to the end into an out-of-range bucket
    h = jnp.where(valid, h, jnp.int32(1 << hash_bits))
    idx = jnp.arange(pos.shape[0], dtype=jnp.int32)
    _, si = jax.lax.sort_key_val(h, idx)
    nb = 1 << hash_bits
    counts = jnp.zeros((nb + 1,), jnp.int32).at[h].add(1)
    bucket_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )  # (nb + 2,); bucket b occupies [start[b], start[b+1])
    return HashGrid(
        sorted_idx=si,
        bucket_start=bucket_start,
        origin=origin,
        cell_size=cell,
        hash_bits=hash_bits,
    )


# the 27 neighbor-cell offsets, (27, 3) int32.  NUMPY on purpose: a
# module-level jnp constant would be created as a TRACER if this module's
# first import happens inside a traced region (e.g. under jax.checkpoint),
# then leak into every later use (UnexpectedTracerError).
_OFFSETS = _np.stack(
    _np.meshgrid(
        _np.arange(-1, 2), _np.arange(-1, 2), _np.arange(-1, 2), indexing="ij"
    ),
    axis=-1,
).reshape(27, 3).astype(_np.int32)


def query_candidates(
    grid: HashGrid,
    query_pos: jnp.ndarray,  # (R, 3)
    k_per_cell: int = 16,
    with_stats: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """Candidate photon rows within the 27 cells around each query point.

    Returns (idx, ok) — or (idx, ok, dropped) when `with_stats=True`:
    (R, 27*K) int32 photon rows (clamped) and a bool mask.
    Callers MUST still distance-test the candidates (hash collisions and
    corner cells produce false positives; there are no false negatives for
    query radii <= cell_size).

    `with_stats=True` adds a third output: the (R,) int32 count of bucket
    entries dropped by the `k_per_cell` cap across the 27 cells ("no silent
    caps").  It is an UPPER bound on real in-radius photons lost — hash
    collisions inflate bucket occupancy — so 0 proves nothing was dropped,
    while a large count says raise `k_per_cell` (or hash_bits).
    """
    q = jnp.floor(
        (query_pos - grid.origin[None, :]) / grid.cell_size
    ).astype(jnp.int32)  # (R, 3)
    cells = q[:, None, :] + _OFFSETS[None, :, :]  # (R, 27, 3)
    h = _cell_hash(cells[..., 0], cells[..., 1], cells[..., 2], grid.hash_bits)

    # dedup at CELL level: two neighbor cells hashing to the same bucket
    # return the same slot range twice (the photons would be double-counted
    # in a flux sum), so keep only each bucket's FIRST cell.  A 27x27
    # equality mask is ~8x cheaper than the 27*K-wide candidate sort this
    # replaces, and removes every duplicate the sort did (same bucket =>
    # same slots; there is no other duplication source).
    dup = jnp.any(
        (h[..., None] == h[..., None, :])
        & jnp.tril(jnp.ones((27, 27), bool), k=-1)[None],
        axis=-1,
    )  # (R, 27) True where an earlier neighbor cell shares the bucket

    start = grid.bucket_start[h]
    end = grid.bucket_start[h + 1]

    k = k_per_cell
    p = grid.sorted_idx.shape[0]
    slots = start[..., None] + jnp.arange(k, dtype=jnp.int32)  # (R, 27, K)
    ok = (slots < end[..., None]) & ~dup[..., None]
    slots = jnp.clip(slots, 0, p - 1)
    idx = grid.sorted_idx[slots]  # (R, 27, K)
    idx = idx.reshape(idx.shape[0], -1)
    ok = ok.reshape(ok.shape[0], -1)
    if with_stats:
        dropped = jnp.sum(
            jnp.where(dup, 0, jnp.maximum(end - start - k, 0)), axis=-1
        )
        return idx, ok, dropped.astype(jnp.int32)
    return idx, ok


def query_cell_ranges(
    grid: HashGrid,
    query_pos: jnp.ndarray,  # (R, 3)
    k_per_cell: int = 16,
    with_stats: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """Bucket-order variant of `query_candidates`: returns (starts, ok) —
    or (starts, ok, dropped) — where `starts` is (R, 27) int32 slot starts
    into the BUCKET-ORDERED photon arrays (`x[grid.sorted_idx]`) and `ok`
    is the (R, 27, K) validity mask (bucket occupancy + cell-level dedup,
    identical to `query_candidates`'s mask).

    Callers gather candidate payloads as K-wide CONTIGUOUS slices from
    bucket-ordered copies (vmapped dynamic_slice -> one (K, D) slice gather
    per neighbor cell) instead of 27*K independent row gathers — the row
    gather measured ~17%% of the whole SPPM iteration on TPU.
    """
    q = jnp.floor(
        (query_pos - grid.origin[None, :]) / grid.cell_size
    ).astype(jnp.int32)  # (R, 3)
    cells = q[:, None, :] + _OFFSETS[None, :, :]  # (R, 27, 3)
    h = _cell_hash(cells[..., 0], cells[..., 1], cells[..., 2], grid.hash_bits)
    dup = jnp.any(
        (h[..., None] == h[..., None, :])
        & jnp.tril(jnp.ones((27, 27), bool), k=-1)[None],
        axis=-1,
    )  # (R, 27)
    start = grid.bucket_start[h]
    end = grid.bucket_start[h + 1]
    k = k_per_cell
    slots_rel = jnp.arange(k, dtype=jnp.int32)
    ok = (
        (start[..., None] + slots_rel < end[..., None]) & ~dup[..., None]
    )  # (R, 27, K)
    # NOTE: starts are NOT clipped — gather_cell_slices pads the payload by
    # K rows so a tail bucket's slice stays aligned with `ok` (clipping the
    # start would shift the gathered rows off the mask)
    if with_stats:
        dropped = jnp.sum(
            jnp.where(dup, 0, jnp.maximum(end - start - k, 0)), axis=-1
        )
        return start, ok, dropped.astype(jnp.int32)
    return start, ok


def gather_cell_slices(
    payload_sorted: jnp.ndarray,  # (P, D) bucket-ordered payload
    starts: jnp.ndarray,  # (R, 27) from query_cell_ranges
    k_per_cell: int,
) -> jnp.ndarray:
    """(R, 27*K, D) candidate payloads from the bucket-ordered copy.

    A plain row gather over expanded slots: a vmapped-dynamic_slice form
    was tried first and lowered to a gather that measured 4.5 s per SPPM
    iteration on TPU (vs ~0.2 s for this form) — Mosaic/XLA does not turn
    batched dynamic slices into block fetches.  The payload is padded by K
    rows so tail-bucket slots stay in bounds without clamping (a clamp
    would shift rows off the caller's `ok` mask)."""
    k = k_per_cell
    padded = jnp.concatenate(
        [payload_sorted,
         jnp.zeros((k,) + payload_sorted.shape[1:], payload_sorted.dtype)]
    )
    slots = (
        starts[:, :, None] + jnp.arange(k, dtype=jnp.int32)[None, None, :]
    ).reshape(starts.shape[0], -1)  # (R, 27K)
    return padded[slots]
