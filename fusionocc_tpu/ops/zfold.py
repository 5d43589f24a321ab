"""z-folded sparse 3D conv backend: 8 z-consecutive cells per buffer row.

The COO gather-GEMM path (ops/sparse_conv.py) gathers (1, C) feature rows —
at C=16..64 that is a 32-256 B descriptor against the TPU's (8, 128) tile
and ~512 B DMA granularity, so the conv gathers run at a few percent of
HBM bandwidth and dominate the encoder (measured 2026-08-18: stage-0 subm
apply 45.5 ms for 113 MB useful traffic).

This backend folds F=8 z-consecutive cells into ONE row of F*C lanes
(exactly one 128-lane tile at C=16), so:
  - every gather descriptor fetches F cells (256+ B useful);
  - the dense row-id tables (ops/sparse_conv.py stage_indices_table) build
    over the F-times-smaller super grid;
  - a 3^3 kernel needs 27 SUPER taps (9 xy columns x 3 z-super shifts)
    whose z structure moves into the weight: expand_weight() lifts the
    (27, Cin, Cout) cell kernel to a (27, F*Cin, F*Cout) block-banded
    super kernel, and the conv apply is literally
    ops.sparse_conv.sparse_conv_apply on super rows.
The cost is lane occupancy (~1.3-2.3 active cells per super on nuScenes
clouds -> ~8x the sparse FLOPs), which the MXU absorbs: the lifted GEMMs
run at (S, 27*F*Cin) x (.., F*Cout) shapes that tile cleanly.

Like ops/tile_sparse.py this is an alternative formulation of the
reference's spconv stack (fusionocc/lidar_encoder.py:125-220); unlike the
8^3 tile path (measured 10x slower end-to-end — halo HBM traffic) the fold
is 1x1x8, so there is no halo materialization at all.

Semantics notes vs the COO path:
  - super buffers are sorted by super key; cell validity lives in a
    (B, S, F) lane mask; inactive lanes carry exact zeros.
  - the strided active set is derived at SUPER level (same receptive-field
    candidate rule as cells — the even/odd candidate math commutes with
    the z-fold), a conservative SUPERSET of the true out-super set; the
    exact per-cell out mask is then computed by running the same
    gather-GEMM on the lane mask with a 0/1 structure kernel
    (strided_lane_mask), so densified outputs match the COO path exactly.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .search import searchsorted
from .sparse_conv import sparse_conv_apply
from .voxelize import SparseVoxels, key_to_coords


class ZFoldVoxels(NamedTuple):
    """Batched static-capacity z-folded voxel set (sorted by super key)."""
    feats: jnp.ndarray      # (B, S, F*C) float; lane zi*C + c
    coords: jnp.ndarray     # (B, S, 3) int32 super (x, y, s); 0 if invalid
    keys: jnp.ndarray       # (B, S) int32 ascending; sentinel = n_super
    mask: jnp.ndarray       # (B, S) bool super validity
    lane_mask: jnp.ndarray  # (B, S, F) bool cell validity
    fold: int               # F (static)


def super_shape(shape: Tuple[int, int, int], fold: int):
    assert shape[2] % fold == 0, (shape, fold)
    return (shape[0], shape[1], shape[2] // fold)


def as_sparse(zv: ZFoldVoxels) -> SparseVoxels:
    """View the super set as a SparseVoxels for the shared table builds
    (ops.sparse_conv.stage_indices_table works on any sorted key set)."""
    return SparseVoxels(zv.feats, zv.coords, zv.keys, zv.mask)


def expand_lane_mask(lane_mask: jnp.ndarray, C: int, dtype) -> jnp.ndarray:
    """(..., F) cell mask -> (..., F*C) lane multiplier (zi-major lanes)."""
    return jnp.repeat(lane_mask.astype(dtype), C, axis=-1)


def expand_weight(w: jnp.ndarray, f_in: int, f_out: int,
                  stride: int) -> jnp.ndarray:
    """Lift a (27, Cin, Cout) cell kernel to (27, f_in*Cin, f_out*Cout).

    Out cell zo (lane of its super), kernel z-tap dz read the in cell at
    z-offset r = stride*zo + dz - 1 from the out super's in-base — i.e. in
    super shift ds = floor(r/f_in) (in {-1,0,1}) at lane zi = r mod f_in.
    Tap order matches ops.sparse_conv.KERNEL_OFFSETS with dz replaced by
    the super shift ds, so the neighbor maps from stage_indices_table on
    the SUPER grid drive this weight unchanged.
    """
    cin, cout = w.shape[1], w.shape[2]
    assert stride * (f_out - 1) + 1 <= 2 * f_in, (f_in, f_out, stride)
    w9 = w.reshape(9, 3, cin, cout)
    out = jnp.zeros((9, 3, f_in, cin, f_out, cout), w.dtype)
    for zo in range(f_out):
        for dz in range(3):
            r = stride * zo + dz - 1
            ds, zi = r // f_in + 1, r % f_in
            out = out.at[:, ds, zi, :, zo, :].add(w9[:, dz])
    return out.reshape(27, f_in * cin, f_out * cout)


def _regroup_one(feats, keys, mask, n_cells: int, fold: int, capacity: int):
    """One sample: sorted cell rows -> sorted super rows with lane masks.

    Cell keys are z-fastest, so cell_key // F IS the super key and the F
    cells of a super are consecutive rows — the regroup is one pass of
    segment arithmetic plus a (sorted, unique) row scatter; no new sort.
    """
    V, C = feats.shape
    n_super = n_cells // fold
    skey = jnp.where(mask, keys // fold, n_super)
    zi = jnp.where(mask, keys % fold, 0)
    prv = jnp.concatenate([jnp.full((1,), -1, skey.dtype), skey[:-1]])
    is_first = (skey != prv) & mask
    sid = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    ok = mask & (sid >= 0) & (sid < capacity)

    tgt = jnp.where(ok, sid * fold + zi, capacity * fold)    # OOB -> drop
    buf = jnp.zeros((capacity * fold, C), feats.dtype).at[tgt].set(
        jnp.where(ok[:, None], feats, 0), mode='drop',
        unique_indices=True, indices_are_sorted=True)
    lane = jnp.zeros((capacity * fold,), bool).at[tgt].set(
        ok, mode='drop', unique_indices=True, indices_are_sorted=True)

    # super key/coord compaction: super #i first appears at the first row
    # whose running super count reaches i+1 (sid is nondecreasing)
    p = searchsorted(sid, jnp.arange(capacity, dtype=jnp.int32))
    p_c = jnp.minimum(p, V - 1)
    smask = (p < V) & (jnp.take(sid, p_c) == jnp.arange(capacity)) \
        & jnp.take(ok, p_c)
    skeys = jnp.where(smask, jnp.take(skey, p_c), n_super).astype(jnp.int32)
    return (buf.reshape(capacity, fold * C), skeys, smask,
            lane.reshape(capacity, fold))


def zfold_regroup(sp: SparseVoxels, shape: Tuple[int, int, int],
                  capacity: int, fold: int) -> ZFoldVoxels:
    """Batched regroup of a voxelized cell set into z-folded super rows."""
    n_cells = shape[0] * shape[1] * shape[2]
    sshape = super_shape(shape, fold)
    feats, skeys, smask, lane = jax.vmap(
        lambda f, k, m: _regroup_one(f, k, m, n_cells, fold, capacity)
    )(sp.feats, sp.keys, sp.mask)
    coords = jnp.where(smask[..., None], key_to_coords(skeys, sshape), 0)
    return ZFoldVoxels(feats, coords, skeys, smask, lane, fold)


def strided_lane_mask(lane_mask: jnp.ndarray, out_smask: jnp.ndarray,
                      nbr: jnp.ndarray, f_in: int, f_out: int) -> jnp.ndarray:
    """Exact out-cell validity for a stride-2 super conv.

    Runs the receptive-field rule through the SAME gather-GEMM as the conv
    itself: 0/1 structure kernel over the in lane mask; an out cell is
    active iff any in-cell in its 3^3 stride-2 field is.
    """
    w_occ = expand_weight(jnp.ones((27, 1, 1), jnp.float32), f_in, f_out, 2)
    occ = sparse_conv_apply(lane_mask.astype(jnp.float32), out_smask,
                            nbr, w_occ)
    return occ > 0.5


def zfold_to_dense(zv: ZFoldVoxels, shape: Tuple[int, int, int],
                   C: int) -> jnp.ndarray:
    """Densify to (B, X, Y, Z, C) (cells).  Lane order zi-major means the
    (X, Y, SZS, F*C) scatter target reshapes straight to (X, Y, Z, C)."""
    from .sparse_conv import sparse_to_dense
    sshape = super_shape(shape, zv.fold)
    f = zv.feats * expand_lane_mask(zv.lane_mask, C, zv.feats.dtype)
    d = sparse_to_dense(f, zv.keys, zv.mask, sshape)
    B = f.shape[0]
    return d.reshape(B, shape[0], shape[1], shape[2], C)
