"""Dynamic voxelization with static capacity (TPU-native).

Replaces the reference's ``torch.unique(coords) + torch_scatter.scatter_mean``
(reference: projects/FusionOcc/fusionocc/lidar_encoder.py:91-123) with a
sort-based unique + sorted segment mean over a fixed-size point buffer, so the
whole pipeline jits once.

Conventions used across the sparse stack:
  - voxel key = (x * SY + y) * SZ + z   (lexicographic by x, y, z — the same
    order torch.unique(dim=0) produces), int32.
  - a padded/invalid slot carries key == SX*SY*SZ (the sentinel, sorting last).
  - voxel lists are sorted ascending by key with all valid entries first.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .search import searchsorted


class SparseVoxels(NamedTuple):
    """Batched static-capacity COO voxel set (per-sample sorted by key)."""
    feats: jnp.ndarray   # (B, V, C) float
    coords: jnp.ndarray  # (B, V, 3) int32 (x, y, z); 0 where invalid
    keys: jnp.ndarray    # (B, V) int32 ascending; sentinel = prod(shape)
    mask: jnp.ndarray    # (B, V) bool


def coords_to_key(coords: jnp.ndarray, shape: Tuple[int, int, int],
                  valid: jnp.ndarray) -> jnp.ndarray:
    """int32 lexicographic key; invalid entries get the sentinel."""
    sx, sy, sz = shape
    key = (coords[..., 0] * sy + coords[..., 1]) * sz + coords[..., 2]
    return jnp.where(valid, key, sx * sy * sz).astype(jnp.int32)


def key_to_coords(keys: jnp.ndarray, shape: Tuple[int, int, int]) -> jnp.ndarray:
    sx, sy, sz = shape
    x = keys // (sy * sz)
    rem = keys - x * (sy * sz)
    y = rem // sz
    z = rem - y * sz
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def _voxelize_one(points: jnp.ndarray, valid: jnp.ndarray,
                  pcr_min: jnp.ndarray, voxel_size: jnp.ndarray,
                  shape: Tuple[int, int, int], capacity: int,
                  tile_size: int | None = None):
    """Single-sample voxelization. points: (P, C); valid: (P,).

    With ``tile_size``, keys are TILE-MAJOR (ops.tile_sparse) so the sorted
    voxel list is tile-contiguous; the voxel set and features are identical
    either way (both key functions are bijections on grid coords).
    """
    sx, sy, sz = shape
    coord = jnp.floor(
        (points[:, :3].astype(jnp.float32) - pcr_min) / voxel_size
    ).astype(jnp.int32)
    inside = ((coord[:, 0] >= 0) & (coord[:, 0] < sx) &
              (coord[:, 1] >= 0) & (coord[:, 1] < sy) &
              (coord[:, 2] >= 0) & (coord[:, 2] < sz))
    ok = valid & inside
    if tile_size is None:
        sentinel = sx * sy * sz
        key = coords_to_key(coord, shape, ok)
    else:
        from .tile_sparse import tile_grid, tile_major_key
        tg = tile_grid(shape, tile_size)
        sentinel = tg[0] * tg[1] * tg[2] * tile_size ** 3
        key = tile_major_key(coord, shape, tile_size, ok)

    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = points[order].astype(jnp.float32)
    ok_s = ok[order]

    prv = jnp.concatenate([jnp.full((1,), -1, key_s.dtype), key_s[:-1]])
    is_first = (key_s != prv) & ok_s
    # position of each point's voxel among the unique voxels (0-based)
    vid = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    # overflow beyond capacity and invalid points both go to the dump slot
    vid = jnp.where(ok_s & (vid < capacity), vid, capacity)

    # Scatter-free segmented mean: vid is sorted, so each voxel's point run
    # is found by binary search and reduced via cumsum differences.
    P = points.shape[0]
    bounds = searchsorted(vid, jnp.arange(capacity + 1, dtype=jnp.int32))
    csum = jnp.concatenate(
        [jnp.zeros((1, pts_s.shape[1]), jnp.float32),
         jnp.cumsum(pts_s, axis=0)], axis=0)
    sums = csum[bounds[1:]] - csum[bounds[:-1]]
    cnts = (bounds[1:] - bounds[:-1]).astype(jnp.float32)
    feats = sums / jnp.maximum(cnts[:, None], 1.0)
    vmask = cnts > 0

    vkeys = key_s[jnp.minimum(bounds[:-1], P - 1)]
    vkeys = jnp.where(vmask, vkeys, sentinel)
    if tile_size is None:
        vcoords = key_to_coords(vkeys, shape)
    else:
        cells = tile_size ** 3
        tc = key_to_coords(vkeys // cells, tg) * tile_size
        oc = key_to_coords(vkeys % cells,
                           (tile_size, tile_size, tile_size))
        vcoords = tc + oc
    vcoords = jnp.where(vmask[:, None], vcoords, 0)
    feats = jnp.where(vmask[:, None], feats, 0.0)
    return feats, vcoords, vkeys, vmask


def voxelize_mean(points: jnp.ndarray, valid: jnp.ndarray,
                  point_cloud_range, voxel_size,
                  shape: Tuple[int, int, int], capacity: int,
                  tile_size: int | None = None) -> SparseVoxels:
    """Batched mean voxelization.

    Args:
      points: (B, P, C) padded point clouds (first 3 dims are ego xyz).
      valid:  (B, P) bool.
      tile_size: if set, voxel keys are tile-major (for ops.tile_sparse);
        the voxel set/features/coords are identical, only the sort order
        and key encoding change.
    Returns SparseVoxels with per-sample capacity ``capacity``; voxel features
    are the mean of the full point vectors (like the reference's
    scatter_mean over the 5-dim points).
    """
    pcr_min = jnp.asarray(point_cloud_range[:3], jnp.float32)
    vsize = jnp.asarray(voxel_size, jnp.float32)
    fn = jax.vmap(
        lambda p, v: _voxelize_one(p, v, pcr_min, vsize, shape, capacity,
                                   tile_size))
    feats, coords, keys, mask = fn(points, valid)
    return SparseVoxels(feats, coords, keys, mask)
