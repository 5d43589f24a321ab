"""Masked dense 3D convs for the LATE sparse-encoder stages.

The reference runs every encoder stage as spconv SubMConv3d/SparseConv3d
(reference: fusionocc/lidar_encoder.py:125-220).  On TPU the sparse
formulations (ops/sparse_conv.py, ops/zfold.py, ops/pallas/zwin_conv.py)
pay per-active-row selection machinery; by stages 2-3 the grids are small
enough ([400,400,32] / [200,200,16] cells) that a PLAIN DENSE conv — zeros
at inactive cells, outputs re-masked to the active set — is less total
work than the gather machinery: the MXU convolves everything at full tile
utilization and no index tables are built at all.

Semantics match spconv exactly on the active sets:
  - SubM: out active set == in active set; inactive inputs are exact zeros
    so the conv sees identical operands; outputs are re-masked.
  - Strided (stride 2, k3, p1): an output site is active iff ANY active
    input lies in its receptive field — computed densely with a max-pool
    over the input mask (same rule as _downsample_coords_one).

Two conv formulations, A/B-able on chip (config.dense_mode):
  - 'xla3d': one lax.conv_general_dilated NDHWC call.
  - 'zbatch': z folded into the BATCH axis — 3 z-shifted 2D convs at TRUE
    cell FLOPs; layout (B, Z, X, Y, C) so the z-shift is a static strided
    slice and the 2D conv batches over B*Z.

Weight layout matches the sparse backends: (27, Cin, Cout) in
KERNEL_OFFSETS row-major (dx, dy, dz) order, so checkpoints are
backend-interchangeable (tests/test_dense_tail.py pins equivalence).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def conv3d_ndhwc(x: jnp.ndarray, w27: jnp.ndarray,
                 stride: int = 1) -> jnp.ndarray:
    """out[o] = sum_k x[o*stride + k - 1] @ W[k], zero-padded (pad 1).

    x: (B, X, Y, Z, Cin); w27: (27, Cin, Cout) KERNEL_OFFSETS order.
    Returns (B, X', Y', Z', Cout) in fp32-accumulated x.dtype.
    """
    cin, cout = w27.shape[1], w27.shape[2]
    w = w27.reshape(3, 3, 3, cin, cout).astype(x.dtype)
    out = lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3, padding=[(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def conv3d_zbatch(xz: jnp.ndarray, w27: jnp.ndarray,
                  stride: int = 1) -> jnp.ndarray:
    """Same conv with z in the BATCH axis: xz (B, Z, X, Y, Cin).

    Per z-tap dz the input plane for output zo is z = zo*stride + dz - 1 —
    a static strided slice of the z-padded volume — and the xy reduction is
    one 2D conv batched over (B, Z_out).  3 conv2d calls total, exact cell
    FLOPs, no lane lifting.  Returns (B, Z', X', Y', Cout).
    """
    b, z, x_, y_, cin = xz.shape
    cout = w27.shape[2]
    w = w27.reshape(3, 3, 3, cin, cout).astype(xz.dtype)  # (dx, dy, dz, i, o)
    z_out = (z + 2 - 3) // stride + 1
    xp = jnp.pad(xz, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        sl = lax.slice_in_dim(xp, dz, dz + (z_out - 1) * stride + 1,
                              stride, axis=1)                 # (B, Z', X, Y, C)
        sl = sl.reshape(b * z_out, x_, y_, cin)
        y = lax.conv_general_dilated(
            sl, w[:, :, dz], window_strides=(stride,) * 2,
            padding=[(1, 1)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    xo, yo = out.shape[1], out.shape[2]
    return out.astype(xz.dtype).reshape(b, z_out, xo, yo, cout)


def strided_out_mask(mask: jnp.ndarray, z_axis: int) -> jnp.ndarray:
    """Active set of a stride-2 k3 p1 sparse conv, densely.

    mask: (B, ...) bool over the 3 spatial dims (any order; z_axis names
    none specially — the rule is isotropic).  An output site is active iff
    any input site in its 3^3 stride-2 receptive field is (spconv rule,
    ops/sparse_conv.py::_downsample_coords_one).
    """
    del z_axis
    m = mask.astype(jnp.float32)[..., None]
    pooled = lax.reduce_window(
        m, 0.0, lax.max, window_dimensions=(1, 3, 3, 3, 1),
        window_strides=(1, 2, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    return pooled[..., 0] > 0.5


def dense_from_zfold(zv, shape: Tuple[int, int, int], C: int,
                     layout: str = 'bxyzc'):
    """Densify a ZFoldVoxels set to (x, mask) in the requested layout.

    layout 'bxyzc' -> x (B, X, Y, Z, C); 'bzxyc' -> (B, Z, X, Y, C)
    (the conv3d_zbatch layout).  Inactive cells are exact zeros.
    """
    from .zfold import expand_lane_mask, super_shape
    from .sparse_conv import sparse_to_dense
    sshape = super_shape(shape, zv.fold)
    f = zv.feats * expand_lane_mask(zv.lane_mask, C, zv.feats.dtype)
    both = jnp.concatenate(
        [f.reshape(*f.shape[:2], zv.fold, C),
         zv.lane_mask[..., None].astype(f.dtype)], axis=-1)
    d = sparse_to_dense(both.reshape(f.shape[0], f.shape[1], -1),
                        zv.keys, zv.mask, sshape)
    b = f.shape[0]
    d = d.reshape(b, shape[0], shape[1], shape[2], C + 1)
    x, mask = d[..., :C], d[..., C] > 0.5
    if layout == 'bzxyc':
        x = jnp.transpose(x, (0, 3, 1, 2, 4))
        mask = jnp.transpose(mask, (0, 3, 1, 2))
    return x, mask
