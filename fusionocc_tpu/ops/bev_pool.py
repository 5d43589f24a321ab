"""Frustum-to-voxel pooling (TPU-native replacement for bev_pool_v2).

Semantics (reference: mmdet3d/ops/bev_pool_v2/src/bev_pool_cuda.cu:21-48 and
fusionocc/necks/view_transformer.py:196-281):

    out[b, z, y, x, c] = sum over frustum points p falling in that voxel of
                         depth[p] * feat[pixel(p), c]

The CUDA op runs one thread per (voxel-interval, channel) over rank-sorted
points.  On TPU we keep the *static* full point set (B*N*D*Hf*Wf), mask
out-of-grid points to a sentinel voxel, sort by voxel rank once, and reduce
with a segmented sum expressed as cumsum + two unique-index scatters (the
classic "QuickCumsum" trick from Lift-Splat-Shoot, which maps to pure XLA:
no atomics, no dynamic shapes).

The backward pass is a custom VJP:
    d_depth[p] = sum_c g[voxel(p), c] * feat[pixel(p), c]   (unique scatter)
    d_feat[i, c] = sum_{p: pixel(p)=i} depth[p] * g[voxel(p), c]
The feat gradient is a segmented sum keyed on pixel rank; we pre-sort by
pixel rank at prepare time (mirroring the reference backward's re-sort,
bev_pool.py:44-57) so both directions use the same sorted-segment reduction.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import GridConfig
from .search import searchsorted


class PoolingIndex(NamedTuple):
    """Rank tensors sorted ascending by ``ranks_bev`` (sentinel last).

    All have static length P = B*N*D*Hf*Wf. The sentinel/segment count is
    B * Z * Y * X, derived from the grid by consumers (kept out of the
    pytree so the index can cross jit boundaries).
    """
    ranks_depth: jnp.ndarray   # (P,) int32 into flattened depth
    ranks_feat: jnp.ndarray    # (P,) int32 into flattened feat rows
    ranks_bev: jnp.ndarray     # (P,) int32 voxel rank; invalid = num_voxels
    order_by_feat: jnp.ndarray  # (P,) int32 permutation sorting by ranks_feat
    # (num_voxels+1,) int32 segment boundaries: bounds[v] = first sorted
    # position with ranks_bev >= v.  Precomputed here so the per-frame pool
    # does no binary search at all — geometry is static at eval, and even
    # in-graph this hoists the search to prepare time.
    bounds: jnp.ndarray


def prepare_pooling_index(coor: jnp.ndarray, grid: GridConfig) -> PoolingIndex:
    """Quantize ego-frame frustum points and sort by voxel rank.

    Args:
      coor: (B, N, D, Hf, Wf, 3) ego coordinates (from geometry.frustum_to_ego).
    Mirrors view_transformer.py:223-281 (voxel_pooling_prepare_v2) with the
    dynamic boolean filter replaced by a sentinel segment.
    """
    B, N, D, H, W, _ = coor.shape
    P = B * N * D * H * W
    gx, gy, gz = grid.grid_size
    num_voxels = B * gz * gy * gx

    v = ((coor - grid.lower_bound) / grid.interval)
    v = jnp.floor(v).astype(jnp.int32).reshape(B, N * D * H * W, 3)
    inside = ((v[..., 0] >= 0) & (v[..., 0] < gx) &
              (v[..., 1] >= 0) & (v[..., 1] < gy) &
              (v[..., 2] >= 0) & (v[..., 2] < gz))
    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    # rank = ((b * Z + z) * Y + y) * X + x  (matches reference rank layout)
    rank = ((batch_idx * gz + v[..., 2]) * gy + v[..., 1]) * gx + v[..., 0]
    rank = jnp.where(inside, rank, num_voxels).reshape(P)

    ranks_depth = jnp.arange(P, dtype=jnp.int32)
    # pixel row index: depth layout (B, N, D, H, W) -> feat rows (B, N, H, W)
    ranks_feat = jnp.broadcast_to(
        jnp.arange(B * N * H * W, dtype=jnp.int32).reshape(B, N, 1, H, W),
        (B, N, D, H, W)).reshape(P)

    # single multi-operand sort (carries the payloads through the sort
    # network instead of argsort + three separate gathers)
    rank_s, rd_s, rf_s = jax.lax.sort(
        (rank, ranks_depth, ranks_feat), num_keys=1)
    order_by_feat = jnp.argsort(rf_s).astype(jnp.int32)
    bounds = searchsorted(
        rank_s, jnp.arange(num_voxels + 1, dtype=rank_s.dtype)
    ).astype(jnp.int32)
    return PoolingIndex(rd_s.astype(jnp.int32), rf_s.astype(jnp.int32),
                        rank_s.astype(jnp.int32), order_by_feat, bounds)


def trim_pooling_index(idx: PoolingIndex, block: int | None = None
                       ) -> PoolingIndex:
    """EVAL-ONLY: slice the index to its valid prefix (host-side).

    Invalid frustum points carry the sentinel bev rank and sort last, so
    ``bounds[-1]`` is the number of in-grid points; typically only ~half the
    frustum lands inside the grid, and the pooling gathers/cumsum shrink
    proportionally.  The length is rounded up to ``block`` (the Pallas
    segsum block).  Each distinct geometry yields its own length -> its own
    executable, which is the serving trade (one geometry per camera rig).

    NOT for training: the sliced ``order_by_feat`` no longer covers every
    (pixel, depth-bin) pair, so the feat-gradient reshape in the backward
    would be wrong.  ``bounds`` is unchanged — every boundary position is
    <= n_valid, so it indexes the trimmed arrays correctly.
    """
    import numpy as np
    if block is None:
        from .pallas.segsum import BLK as block  # keep the Pallas fast path
    n_valid = int(np.asarray(idx.bounds[-1]))
    P = idx.ranks_bev.shape[0]
    # keep at least one block: a rig whose cameras see nothing inside the
    # grid (n_valid == 0) must yield a zero pooled volume, not a 0-length
    # index that XLA cannot gather from (tests/test_ondisk.py)
    n_pad = min(P, max(block, -(-n_valid // block) * block))
    if n_pad >= P:
        return idx
    return PoolingIndex(idx.ranks_depth[:n_pad], idx.ranks_feat[:n_pad],
                        idx.ranks_bev[:n_pad], idx.order_by_feat[:n_pad],
                        idx.bounds)


def _sorted_segment_sum(vals: jnp.ndarray, seg: jnp.ndarray,
                        num_segments: int,
                        bounds: jnp.ndarray | None = None) -> jnp.ndarray:
    """Segmented sum for ascending ``seg`` ids — scatter-free.

    cumsum along the point axis, then gather the cumulative values at the
    segment boundaries found by vectorized binary search.  XLA scatters are
    slow on TPU while cumsum/searchsorted/gather all map well onto the VPU,
    so this formulation is ~100x faster than a scatter-add at these sizes.

    vals: (P, C) float32; seg: (P,) int32 in [0, num_segments]; ids equal to
    ``num_segments`` are a dropped sentinel. Returns (num_segments, C).
    """
    P, C = vals.shape
    csum = jnp.cumsum(vals.astype(jnp.float32), axis=0)
    csum_pad = jnp.concatenate([jnp.zeros((1, C), jnp.float32), csum], axis=0)
    if bounds is None:
        # bounds[v] = first sorted position whose segment id >= v
        bounds = searchsorted(
            seg, jnp.arange(num_segments + 1, dtype=seg.dtype))
    return csum_pad[bounds[1:]] - csum_pad[bounds[:-1]]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _bev_pool_flat(depth_flat: jnp.ndarray, feat_flat: jnp.ndarray,
                   ranks_depth: jnp.ndarray, ranks_feat: jnp.ndarray,
                   ranks_bev: jnp.ndarray, order_by_feat: jnp.ndarray,
                   bounds: jnp.ndarray, num_voxels: int) -> jnp.ndarray:
    """(num_voxels, C) pooled features from flat depth (Pd,) and feat (Pf, C)."""
    import os
    d = depth_flat[ranks_depth]
    f = feat_flat[ranks_feat]
    P = d.shape[0]
    from .pallas.segsum import BLK, boundary_segment_sum
    if P % BLK == 0 and not os.environ.get('FUSIONOCC_NO_PALLAS'):
        # fused product + single-pass chunked cumsum (Pallas kernel)
        return boundary_segment_sum(d, f, ranks_bev, num_voxels, bounds)
    return _sorted_segment_sum(d[:, None] * f, ranks_bev, num_voxels, bounds)


def _bev_pool_fwd(depth_flat, feat_flat, ranks_depth, ranks_feat, ranks_bev,
                  order_by_feat, bounds, num_voxels):
    out = _bev_pool_flat(depth_flat, feat_flat, ranks_depth, ranks_feat,
                         ranks_bev, order_by_feat, bounds, num_voxels)
    return out, (depth_flat, feat_flat, ranks_depth, ranks_feat, ranks_bev,
                 order_by_feat)


def _bev_pool_bwd(num_voxels, res, g):
    depth_flat, feat_flat, ranks_depth, ranks_feat, ranks_bev, order_by_feat = res
    g = g.astype(jnp.float32)
    # padded gather: sentinel rank reads a zero row
    g_pad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0)
    g_pts = g_pad[ranks_bev]                          # (P, C)
    feat_pts = feat_flat[ranks_feat].astype(jnp.float32)
    depth_pts = depth_flat[ranks_depth].astype(jnp.float32)
    # depth grad: ranks_depth is a permutation of the depth elements, so the
    # scatter back to natural order is an inverse-permutation GATHER
    d_depth_sorted = jnp.sum(g_pts * feat_pts, axis=-1)
    d_depth = d_depth_sorted[jnp.argsort(ranks_depth)]
    # feat grad: re-sorted by pixel rank every pixel owns exactly D entries
    # (all depth bins are kept, invalid points only dump their bev rank), so
    # the segmented sum is a plain reshape-sum — no search, no scatter.
    # (This replaces the reference backward's re-sort + interval RLE,
    # bev_pool.py:44-57.)
    contrib = depth_pts[:, None] * g_pts              # (P, C)
    Pf = feat_flat.shape[0]
    D = ranks_depth.shape[0] // Pf
    d_feat = contrib[order_by_feat].reshape(Pf, D, -1).sum(axis=1)
    return (d_depth.astype(depth_flat.dtype), d_feat.astype(feat_flat.dtype),
            None, None, None, None, None)


_bev_pool_flat.defvjp(_bev_pool_fwd, _bev_pool_bwd)


def bev_pool(depth: jnp.ndarray, feat: jnp.ndarray, idx: PoolingIndex,
             grid: GridConfig) -> jnp.ndarray:
    """Pool per-pixel depth-weighted features into the voxel grid.

    Args:
      depth: (B, N, D, Hf, Wf) softmaxed depth distribution.
      feat:  (B, N, Hf, Wf, C) per-pixel context features.
      idx:   from prepare_pooling_index (same B/N/D/Hf/Wf).
    Returns:
      (B, Z, Y, X, C) float32 voxel features. (The reference wrapper emits
      channels-first (B,C,Z,Y,X), bev_pool.py:86-93; this framework keeps
      voxel grids channels-last, the native TPU layout.)
    """
    B, N, D, H, W = depth.shape
    C = feat.shape[-1]
    gx, gy, gz = grid.grid_size
    out = _bev_pool_flat(
        depth.reshape(-1).astype(jnp.float32),
        feat.reshape(-1, C).astype(jnp.float32),
        idx.ranks_depth, idx.ranks_feat, idx.ranks_bev, idx.order_by_feat,
        idx.bounds, B * gz * gy * gx)
    return out.reshape(B, gz, gy, gx, C)


def bev_pool_dense_reference(depth: jnp.ndarray, feat: jnp.ndarray,
                             coor: jnp.ndarray, grid: GridConfig) -> jnp.ndarray:
    """O(P*V) one-hot einsum reference used by unit tests only."""
    B, N, D, H, W = depth.shape
    C = feat.shape[-1]
    gx, gy, gz = grid.grid_size
    v = jnp.floor((coor - grid.lower_bound) / grid.interval).astype(jnp.int32)
    inside = ((v[..., 0] >= 0) & (v[..., 0] < gx) &
              (v[..., 1] >= 0) & (v[..., 1] < gy) &
              (v[..., 2] >= 0) & (v[..., 2] < gz))
    rank = (v[..., 2] * gy + v[..., 1]) * gx + v[..., 0]
    rank = jnp.where(inside, rank, gz * gy * gx)
    onehot = jax.nn.one_hot(rank.reshape(B, N * D * H * W),
                            gz * gy * gx + 1, dtype=jnp.float32)
    prod = (depth.reshape(B, N, D, H, W, 1) *
            feat.reshape(B, N, 1, H, W, C)).reshape(B, N * D * H * W, C)
    out = jnp.einsum('bpv,bpc->bvc', onehot, prod)[:, :-1]
    return out.reshape(B, gz, gy, gx, C)
