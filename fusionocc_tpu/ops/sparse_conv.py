"""Sparse 3D convolution as gather-GEMM-scatter over static-capacity buffers.

TPU-native replacement for the spconv SubMConv3d / SparseConv3d stack the
reference's LiDAR encoder uses (reference: fusionocc/lidar_encoder.py:125-220,
registered via mmdet3d/ops/spconv/overwrite_spconv/write_spconv2.py:9-39).

Design:
  - Active voxels live in per-sample sorted-by-key COO buffers
    (ops/voxelize.SparseVoxels).  All shapes are static.
  - Neighbor maps are built with vectorized binary search
    (jnp.searchsorted) over the sorted key arrays — the TPU analogue of
    spconv's GPU hash tables.  Like spconv's ``indice_key`` mechanism, a map
    is built once per (resolution, kind) and shared by all convs in a stage.
  - The conv itself is one MXU matmul per layer: gather the 27 neighbors into
    (V, 27*Cin) and multiply by the (27*Cin, Cout) reshaped weight.
  - Submanifold convs keep the input's active set; strided convs derive the
    downsampled active set exactly like spconv (any output site whose
    receptive field covers an active input site).

Weight layout: (27, Cin, Cout) with kernel offsets enumerated as
(dx, dy, dz) in row-major order over {0,1,2}^3 — offset index 13 is the
center tap.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .search import lookup_rows, searchsorted
from .voxelize import SparseVoxels, coords_to_key, key_to_coords

KERNEL_OFFSETS = np.stack(np.meshgrid(
    np.arange(3), np.arange(3), np.arange(3), indexing='ij'),
    axis=-1).reshape(27, 3)   # (27, 3) of (dx, dy, dz) in {0,1,2}


def _lookup(in_keys: jnp.ndarray, queries: jnp.ndarray,
            sentinel_idx: int) -> jnp.ndarray:
    """Find each query key in the sorted key array; miss -> sentinel_idx.

    One merge sort with found-ness carried through (ops/search.lookup_rows):
    measured 100 -> 55 ms for the stage-0 neighbor build (3.5M queries over
    131k keys) vs sort-search + validation gather.  Padding slots duplicate
    the sentinel key; a query hitting one resolves to a padded row whose
    features are identically zero, so the conv contribution is unchanged.
    """
    return lookup_rows(in_keys, queries, sentinel_idx)


def _build_index_one(out_coords, out_mask, in_keys,
                     shape_in: Tuple[int, int, int],
                     stride: int, padding: int) -> jnp.ndarray:
    """Neighbor map (V_out, 27) for one sample; miss/invalid -> V_in.

    For submanifold convs (stride 1, pad 1) the center tap is the voxel
    itself, so only the 26 true neighbors go through the merge lookup and
    the self row is spliced back in — 1/27 less sort volume per build.
    """
    v_in = in_keys.shape[0]
    v_out = out_coords.shape[0]
    subm = stride == 1 and padding == 1
    taps = [k for k in range(27) if not (subm and k == 13)]
    offs = jnp.asarray(KERNEL_OFFSETS[taps], jnp.int32)     # (27|26, 3)
    # input position contributing to output o at kernel tap k:
    #   in = o * stride + k - padding
    pos = (out_coords[:, None, :] * stride + offs[None] - padding)
    sx, sy, sz = shape_in
    ok = (out_mask[:, None]
          & (pos[..., 0] >= 0) & (pos[..., 0] < sx)
          & (pos[..., 1] >= 0) & (pos[..., 1] < sy)
          & (pos[..., 2] >= 0) & (pos[..., 2] < sz))
    qkey = coords_to_key(pos, shape_in, ok)                 # (V, 27|26)
    nbr = _lookup(in_keys, qkey.reshape(-1), v_in)
    nbr = nbr.reshape(v_out, len(taps))
    if subm:
        self_idx = jnp.where(out_mask,
                             jnp.arange(v_out, dtype=jnp.int32), v_in)
        nbr = jnp.concatenate(
            [nbr[:, :13], self_idx[:, None], nbr[:, 13:]], axis=1)
    return nbr


def build_subm_index(sp: SparseVoxels,
                     shape: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, V, 27) neighbor map for submanifold convs at this resolution."""
    return jax.vmap(
        lambda c, m, k: _build_index_one(c, m, k, shape, 1, 1)
    )(sp.coords, sp.mask, sp.keys)


def out_shape_strided(shape: Tuple[int, int, int], stride: int = 2,
                      kernel: int = 3, padding: int = 1) -> Tuple[int, int, int]:
    return tuple((s + 2 * padding - kernel) // stride + 1 for s in shape)


def _downsample_coords_one(in_coords, in_mask, shape_in, shape_out,
                           capacity: int):
    """Active-output-site derivation for a stride-2 k3 p1 sparse conv.

    spconv semantics: an output site is active iff any active input voxel lies
    in its receptive field.  With stride 2 / pad 1 / kernel 3 each input
    coordinate d contributes to outputs floor((d+1-k)/2) for k in {0,1,2} with
    (d+1-k) even: even d -> {d/2}; odd d -> {(d+1)/2, (d-1)/2}.
    """
    sentinel_out = shape_out[0] * shape_out[1] * shape_out[2]
    # two candidates per dim: (d+1)//2 (always valid parity-wise for odd d,
    # equals d/2+... ) — build explicitly:
    d = in_coords  # (V, 3)
    even = (d % 2) == 0
    cand0 = jnp.where(even, d // 2, (d + 1) // 2)
    cand1 = jnp.where(even, d // 2, (d - 1) // 2)   # dup of cand0 when even
    cands = jnp.stack([cand0, cand1], axis=1)       # (V, 2, 3)
    so = jnp.asarray(shape_out, jnp.int32)
    ok_dim = (cands >= 0) & (cands < so)            # (V, 2, 3)
    # 8 combinations
    combos = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                c = jnp.stack([cands[:, ix, 0], cands[:, iy, 1],
                               cands[:, iz, 2]], axis=-1)
                ok = (in_mask & ok_dim[:, ix, 0] & ok_dim[:, iy, 1]
                      & ok_dim[:, iz, 2])
                combos.append((c, ok))
    all_c = jnp.concatenate([c for c, _ in combos], axis=0)     # (8V, 3)
    all_ok = jnp.concatenate([ok for _, ok in combos], axis=0)  # (8V,)
    keys = coords_to_key(all_c, shape_out, all_ok)
    keys = jnp.sort(keys)
    prv = jnp.concatenate([jnp.full((1,), -1, keys.dtype), keys[:-1]])
    is_new = (keys != prv) & (keys < sentinel_out)
    # compact the first `capacity` unique keys — scatter-free: slot ids are
    # non-decreasing, so unique #i sits at searchsorted(slot, i)
    slot = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n8 = keys.shape[0]
    pos = searchsorted(slot, jnp.arange(capacity, dtype=jnp.int32))
    pos_c = jnp.minimum(pos, n8 - 1)
    out_keys = keys[pos_c]
    out_mask = (pos < n8) & is_new[pos_c] & (out_keys < sentinel_out)
    out_keys = jnp.where(out_mask, out_keys, sentinel_out)
    out_coords = jnp.where(out_mask[:, None],
                           key_to_coords(out_keys, shape_out), 0)
    return out_coords, out_keys, out_mask


def build_strided_index(sp: SparseVoxels, shape_in: Tuple[int, int, int],
                        capacity: int):
    """Derive the stride-2 output voxel set and its (B, V_out, 27) nbr map.

    Returns (out_coords, out_keys, out_mask, nbr_idx). The neighbor map uses
    in = out*2 + k - 1.
    """
    shape_out = out_shape_strided(shape_in)

    def one(coords, mask, keys):
        oc, ok_keys, om = _downsample_coords_one(coords, mask, shape_in,
                                                 shape_out, capacity)
        nbr = _build_index_one(oc, om, keys, shape_in, 2, 1)
        return oc, ok_keys, om, nbr

    return jax.vmap(one)(sp.coords, sp.mask, sp.keys), shape_out


def sparse_conv_apply(feats: jnp.ndarray, mask_out: jnp.ndarray,
                      nbr_idx: jnp.ndarray, weight: jnp.ndarray,
                      bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Gather-GEMM: out[v] = sum_k feats[nbr[v,k]] @ W[k]  (+ bias).

    Args:
      feats: (B, V_in, Cin); nbr_idx: (B, V_out, 27) with miss -> V_in.
      weight: (27, Cin, Cout).
    Returns (B, V_out, Cout), zeroed at invalid outputs.
    """
    B, v_in, cin = feats.shape
    v_out = nbr_idx.shape[1]
    cout = weight.shape[-1]
    pad = jnp.concatenate(
        [feats, jnp.zeros((B, 1, cin), feats.dtype)], axis=1)
    gathered = jnp.take_along_axis(
        pad.reshape(B, v_in + 1, cin),
        nbr_idx.reshape(B, v_out * 27, 1), axis=1)
    gathered = gathered.reshape(B, v_out, 27 * cin)
    w = weight.astype(feats.dtype).reshape(27 * cin, cout)
    out = jnp.einsum('bvk,kc->bvc', gathered, w,
                     preferred_element_type=jnp.float32).astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(mask_out[..., None], out, 0)


def sparse_conv1x1_apply(feats: jnp.ndarray, mask: jnp.ndarray,
                         weight: jnp.ndarray,
                         bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """1x1x1 submanifold conv == per-voxel linear (conv_input / conv_out)."""
    out = jnp.einsum('bvc,cd->bvd', feats, weight.astype(feats.dtype),
                     preferred_element_type=jnp.float32).astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(mask[..., None], out, 0)


def sparse_to_dense(feats: jnp.ndarray, keys: jnp.ndarray,
                    mask: jnp.ndarray,
                    shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Densify (B, V, C) voxel rows into (B, X, Y, Z, C).

    Mirrors SparseConvTensor.dense() (channels-last; callers transpose).
    A row scatter: V is small at the final stage (<= 16k rows into a 640k
    grid), and a small row scatter beats the binary-search formulation on
    chip (31 vs 53 ms incl. ~30 ms launch floor).  The big TPU-scatter
    penalty applies to huge scatters, not this one.
    """
    B, V, C = feats.shape
    sx, sy, sz = shape
    n = sx * sy * sz

    def one(f, k, m):
        tgt = jnp.where(m, k, n)
        dense = jnp.zeros((n + 1, C), feats.dtype)
        dense = dense.at[tgt].set(
            jnp.where(m[:, None], f, 0), mode='drop')
        return dense[:n].reshape(sx, sy, sz, C)

    return jax.vmap(one)(feats, keys, mask)
