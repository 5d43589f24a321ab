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


def zband_conv_apply(feats: jnp.ndarray, mask_out: jnp.ndarray,
                     nbr_idx: jnp.ndarray, weight: jnp.ndarray,
                     f_in: int, f_out: int, stride: int) -> jnp.ndarray:
    """z-folded conv with the lifted weight SLICED to its nonzero bands.

    The lifted (27, F*Cin, F*Cout) kernel (expand_weight) is z-banded: for
    a super tap at z-shift ds, only the (zi, zo) pairs with
    r = stride*zo + dz - 1 in [(ds-1)*F, ds*F) are nonzero.  For a subm
    conv that makes the ds=+-1 blocks 1/F^2 dense (a single (Cin, Cout)
    slice each) — yet the lifted GEMM multiplies the zeros and the tap
    gather fetches all F*Cin lanes.  Measured on chip
    (late-round-3 run, BENCH.md): the zfold encoder's feature path runs ~416 ms
    of 525 while its index builds cost ~60, so the conv composition is
    the whole game.

    This formulation runs one GEMM per z-shift ds over only the nonzero
    band: the tap gather reads just the zi-band lanes of the neighbor rows
    and the GEMM writes just the zo-band lanes of the output.  Subm convs:
    9 full-width taps + 18 Cin-wide taps (3x less gather traffic, F/3 x
    fewer MACs).  Strided convs: ds in {0,+1} are half-height bands, ds=-1
    is thin (~2.4x fewer MACs).  No tap_chunk scan is needed — the fat
    temp is (B, S, 9*F*Cin), a third of the 27-tap one-shot.

    Same contract as zslice_conv_apply (super-grid neighbor map in
    KERNEL_OFFSETS order, miss -> S_in; f_out == f_in or single out super
    in z).
    """
    B, s_in, L = feats.shape
    cin, cout = weight.shape[1], weight.shape[2]
    assert L == f_in * cin, (L, f_in, cin)
    span = stride * (f_out - 1) + 1
    assert span <= 2 * f_in, (f_in, f_out, stride)
    s_out = nbr_idx.shape[1]
    w_e = expand_weight(weight, f_in, f_out, stride).astype(feats.dtype)
    w_e = w_e.reshape(9, 3, f_in, cin, f_out, cout)
    pad = jnp.concatenate([feats, jnp.zeros((B, 1, L), feats.dtype)], axis=1)
    nbr9 = nbr_idx.reshape(B, s_out, 9, 3)

    out = jnp.zeros((B, s_out, f_out * cout), jnp.float32)
    for ds in range(3):
        pairs = [(zo, dz) for zo in range(f_out) for dz in range(3)
                 if (stride * zo + dz - 1) // f_in + 1 == ds]
        if not pairs:
            continue
        zis = [stride * zo + dz - 1 - (ds - 1) * f_in for zo, dz in pairs]
        zi_lo, zi_hi = min(zis), max(zis)
        zo_lo = min(zo for zo, _ in pairs)
        zo_hi = max(zo for zo, _ in pairs)
        nzi, nzo = zi_hi - zi_lo + 1, zo_hi - zo_lo + 1
        src = pad[:, :, zi_lo * cin:(zi_hi + 1) * cin]       # (B,S+1,nzi*Cin)
        idx = nbr9[:, :, :, ds].reshape(B, s_out * 9, 1)
        gat = jnp.take_along_axis(src, idx, axis=1)
        gat = gat.reshape(B, s_out, 9 * nzi * cin)
        wk = w_e[:, ds, zi_lo:zi_hi + 1, :, zo_lo:zo_hi + 1, :].reshape(
            9 * nzi * cin, nzo * cout)
        y = jnp.einsum('bsk,kc->bsc', gat, wk,
                       preferred_element_type=jnp.float32)
        out = out.at[:, :, zo_lo * cout:(zo_hi + 1) * cout].add(y)
    out = out.astype(feats.dtype)
    return jnp.where(mask_out[..., None], out, 0)


def zslice_conv_apply(feats: jnp.ndarray, mask_out: jnp.ndarray,
                      nbr_idx: jnp.ndarray, weight: jnp.ndarray,
                      f_in: int, f_out: int, stride: int,
                      col_chunk: int = 3) -> jnp.ndarray:
    """z-folded conv at TRUE cell FLOPs: window slices vs the unlifted kernel.

    The lifted path (expand_weight + sparse_conv_apply) runs GEMMs at
    (S, 27*F*Cin) x (27*F*Cin, F*Cout) — F times the true MACs, because each
    lifted (F*Cin, F*Cout) block is z-banded (an out cell reads only 3 of the
    3*F window cells) and the MXU multiplies the zeros anyway.

    Here each (dx, dy) kernel column g gathers its 3 z-consecutive super
    rows into a window of 3*f_in cells (relative z = -f_in .. 2*f_in-1;
    missing supers land on the zero pad row), and tap dz's operand is the
    lane slice at cells r = stride*zo + dz - 1 — contiguous for subm convs,
    stride-2 lane-strided for downsampling convs.  The GEMM is then
    (B*S*f_out, 3*Cin per column) x (3*Cin, Cout): exact cell MACs, with
    identical gather traffic to the lifted path.

    Args:
      feats: (B, S_in, f_in*Cin), zi-major lanes, inactive cells exact zero.
      nbr_idx: (B, S_out, 27) SUPER-grid neighbor map in KERNEL_OFFSETS
        order (z-shift minor); miss -> S_in.
      weight: UNLIFTED (27, Cin, Cout) cell kernel.
      col_chunk: kernel columns GEMM'd per scan step (divisor of 9); bounds
        live window temps at col_chunk * (B, S, 3*f_in*Cin).
    Returns (B, S_out, f_out*Cout), zeroed at invalid out supers.

    Geometry contract (holds by construction in the encoder): either
    f_out == f_in, or the output grid has a single super in z (f_out ==
    out_z) — otherwise the super-grid neighbor map's `in = out*stride + ds
    - 1` query would not align with the cell arithmetic.
    """
    B, s_in, L = feats.shape
    cin, cout = weight.shape[1], weight.shape[2]
    assert L == f_in * cin, (L, f_in, cin)
    span = stride * (f_out - 1) + 1
    assert span <= 2 * f_in, (f_in, f_out, stride)
    s_out = nbr_idx.shape[1]
    pad = jnp.concatenate([feats, jnp.zeros((B, 1, L), feats.dtype)], axis=1)
    nbr9 = jnp.moveaxis(nbr_idx.reshape(B, s_out, 9, 3), 2, 0)  # (9,B,S,3)
    w9 = weight.astype(feats.dtype).reshape(9, 3 * cin, cout)
    assert 9 % col_chunk == 0, col_chunk
    groups = 9 // col_chunk
    nbr_g = nbr9.reshape(groups, col_chunk, B, s_out, 3)
    w_g = w9.reshape(groups, col_chunk * 3 * cin, cout)

    def one_group(idxs, wk):
        parts = []
        for j in range(col_chunk):
            win = jnp.take_along_axis(
                pad, idxs[j].reshape(B, s_out * 3, 1), axis=1)
            win = win.reshape(B, s_out, 3 * f_in, cin)
            parts.extend(
                jax.lax.slice_in_dim(win, f_in + dz - 1,
                                     f_in + dz - 1 + span, stride, axis=2)
                for dz in range(3))
        x = jnp.concatenate(parts, axis=-1)   # (B, S, f_out, chunk*3*Cin)
        return jnp.einsum('bsfk,kc->bsfc', x, wk,
                          preferred_element_type=jnp.float32)

    if groups == 1:
        out = one_group(nbr_g[0], w_g[0])
    else:
        def body(acc, xs):
            return acc + one_group(*xs), None
        out, _ = jax.lax.scan(
            body, jnp.zeros((B, s_out, f_out, cout), jnp.float32),
            (nbr_g, w_g))
    out = out.astype(feats.dtype).reshape(B, s_out, f_out * cout)
    return jnp.where(mask_out[..., None], out, 0)


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
