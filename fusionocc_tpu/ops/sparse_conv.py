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

from .search import lookup_rows3, searchsorted
from .voxelize import SparseVoxels, coords_to_key, key_to_coords

KERNEL_OFFSETS = np.stack(np.meshgrid(
    np.arange(3), np.arange(3), np.arange(3), indexing='ij'),
    axis=-1).reshape(27, 3)   # (27, 3) of (dx, dy, dz) in {0,1,2}


XY_OFFSETS = np.stack(np.meshgrid(
    np.arange(3), np.arange(3), indexing='ij'),
    axis=-1).reshape(9, 2)    # (9, 2) of (dx, dy); column k = g*3 + dz


def _build_index_one(out_coords, out_mask, in_keys,
                     shape_in: Tuple[int, int, int],
                     stride: int, padding: int) -> jnp.ndarray:
    """Neighbor map (V_out, 27) for one sample; miss/invalid -> V_in.

    Keys are z-fastest lexicographic, so the 3 z-taps of each of the 9
    (dx, dy) kernel columns are CONSECUTIVE key values: one merged base
    query per column answers all three taps (ops.search.lookup_rows3) —
    9 instead of 27 merge queries per output voxel, ~3x less sort volume
    in the dominant neighbor-build cost.
    """
    v_in = in_keys.shape[0]
    v_out = out_coords.shape[0]
    assert padding == 1, padding
    sx, sy, sz = shape_in
    offs2 = jnp.asarray(XY_OFFSETS, jnp.int32)              # (9, 2)
    # input position contributing to output o at kernel tap (dx, dy, dz):
    #   in = o * stride + (dx, dy, dz) - 1; base query is the dz=1 tap
    #   (in_z = z*stride, always in range since z*stride <= shape_in-1).
    xy = out_coords[:, None, :2] * stride + offs2[None] - 1  # (V, 9, 2)
    zb = (out_coords[:, 2] * stride)[:, None]                # (V, 1)
    ok_xy = (out_mask[:, None]
             & (xy[..., 0] >= 0) & (xy[..., 0] < sx)
             & (xy[..., 1] >= 0) & (xy[..., 1] < sy))        # (V, 9)
    base_key = jnp.where(ok_xy, (xy[..., 0] * sy + xy[..., 1]) * sz + zb,
                         sx * sy * sz).astype(jnp.int32)
    idx3 = lookup_rows3(in_keys, base_key.reshape(-1), v_in)
    nbr = idx3.reshape(v_out, 9, 3)
    # per-tap z validity: tap dz in {0,1,2} hits in_z = z*stride + dz - 1
    zt = zb[:, :, None] + jnp.arange(3, dtype=jnp.int32)[None, None, :] - 1
    ok = ok_xy[:, :, None] & (zt >= 0) & (zt < sz)
    nbr = jnp.where(ok, nbr, v_in)
    return nbr.reshape(v_out, 27)


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
                      bias: jnp.ndarray | None = None,
                      tap_chunk: int = 0) -> jnp.ndarray:
    """Gather-GEMM: out[v] = sum_k feats[nbr[v,k]] @ W[k]  (+ bias).

    Args:
      feats: (B, V_in, Cin); nbr_idx: (B, V_out, 27) with miss -> V_in.
      weight: (27, Cin, Cout).
      tap_chunk: 0 gathers all 27 taps into one (B, V, 27*Cin) temp before
        a single GEMM — fastest when it fits, but at z-folded lane widths
        (ops/zfold.py, Cin up to 512) that temp is GBs and OOMs the chip
        once the camera branch shares the program.  1/3/9 accumulates over
        27//tap_chunk groups under lax.scan, bounding live temps at
        (B, V, tap_chunk*Cin) (+ one fp32 accumulator); HBM gather traffic
        is identical.
    Returns (B, V_out, Cout), zeroed at invalid outputs.
    """
    B, v_in, cin = feats.shape
    v_out = nbr_idx.shape[1]
    cout = weight.shape[-1]
    pad = jnp.concatenate(
        [feats, jnp.zeros((B, 1, cin), feats.dtype)], axis=1)
    if tap_chunk and tap_chunk < 27:
        assert 27 % tap_chunk == 0, tap_chunk
        g = 27 // tap_chunk
        nbr_g = jnp.moveaxis(
            nbr_idx.reshape(B, v_out, g, tap_chunk), 2, 0)   # (g, B, V, tc)
        w_g = weight.astype(feats.dtype).reshape(g, tap_chunk * cin, cout)

        def body(acc, xs):
            nb, wk = xs
            gat = jnp.take_along_axis(
                pad, nb.reshape(B, v_out * tap_chunk, 1), axis=1)
            gat = gat.reshape(B, v_out, tap_chunk * cin)
            return acc + jnp.einsum(
                'bvk,kc->bvc', gat, wk,
                preferred_element_type=jnp.float32), None

        acc0 = jnp.zeros((B, v_out, cout), jnp.float32)
        out, _ = jax.lax.scan(body, acc0, (nbr_g, w_g))
        out = out.astype(feats.dtype)
    else:
        gathered = jnp.take_along_axis(
            pad.reshape(B, v_in + 1, cin),
            nbr_idx.reshape(B, v_out * 27, 1), axis=1)
        gathered = gathered.reshape(B, v_out, 27 * cin)
        w = weight.astype(feats.dtype).reshape(27 * cin, cout)
        out = jnp.einsum('bvk,kc->bvc', gathered, w,
                         preferred_element_type=jnp.float32
                         ).astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(mask_out[..., None], out, 0)


def sparse_conv_apply_block(feats: jnp.ndarray, mask_out: jnp.ndarray,
                            nbr_idx: jnp.ndarray, weight: jnp.ndarray,
                            bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Same math as sparse_conv_apply via 9 three-row BLOCK gathers.

    Voxel keys are z-fastest lexicographic and unique per sample, so a
    kernel column's found z-taps always occupy CONSECUTIVE rows: if q-1 and
    q+1 both exist but q is absent, their rows are still adjacent (no
    integer key fits between).  Hence every found tap of a column lies in
    [start, start+2] with start = min(found rows), and the 27 per-row
    gathers collapse into 9 contiguous (3, Cin) slice gathers — 3x fewer
    gather descriptors in the op that dominates the sparse-conv stack once
    time-folding amortizes the index-build sorts — plus an in-register tap
    alignment by row offset (tap t takes block row ``nbr[t] - start``).

    Drop-in for sparse_conv_apply: same (B, V_out, 27) neighbor map with
    miss -> V_in, same output.  Selected by SparseEncoderConfig.gather.
    """
    B, v_in, cin = feats.shape
    v_out = nbr_idx.shape[1]
    cout = weight.shape[-1]
    nbr3 = nbr_idx.reshape(B, v_out, 9, 3)
    found = nbr3 < v_in
    start = jnp.min(jnp.where(found, nbr3, v_in), axis=-1)   # (B, V, 9)
    sel = nbr3 - start[..., None]                            # row offset/tap
    pad = jnp.concatenate(
        [feats, jnp.zeros((B, 3, cin), feats.dtype)], axis=1)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))

    def gather_one(p, s):
        return jax.lax.gather(p, s.reshape(-1, 1), dn, slice_sizes=(3, cin),
                              mode=jax.lax.GatherScatterMode.CLIP)

    gf = jax.vmap(gather_one)(pad, start).reshape(B, v_out, 9, 3, cin)
    # tap t <- block row r where sel[..., t] == r; misses masked by `found`
    # (a missing tap's sel can alias 0..2 when start is near v_in)
    taps = []
    for t in range(3):
        acc = jnp.zeros((B, v_out, 9, cin), feats.dtype)
        for r in range(3):
            m = (sel[..., t] == r) & found[..., t]
            acc = acc + jnp.where(m[..., None], gf[..., r, :], 0)
        taps.append(acc)
    gathered = jnp.stack(taps, axis=3).reshape(B, v_out, 27 * cin)
    w = weight.astype(feats.dtype).reshape(27 * cin, cout)
    out = jnp.einsum('bvk,kc->bvc', gathered, w,
                     preferred_element_type=jnp.float32).astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(mask_out[..., None], out, 0)


# ---------------------------------------------------------------------------
# Dense row-id table index builds.
#
# The merge-based builds above reformulate neighbor lookup as sorts, but
# XLA's TPU sort is a bitonic network (log^2 n compare stages) — measured
# 113.8 ms for ONE stage-0 subm build at V=131k (tools/profile_lidar.py).
# The table formulation replaces every sort with linear-memory primitives
# that the TPU executes at bandwidth:
#   - scatter arange(V) row ids into a dense per-cell int32 table (a memset
#     + a V-element row scatter — small scatters are fast on TPU, see
#     sparse_to_dense);
#   - a neighbor lookup is then ONE gather from the table at the tap's cell
#     index: O(1) per tap, no merge volume at all.
# The stage-0 table is sx*sy*sz int32 (1.31 GB at 1600x1600x128) but
# transient and built per-sample under lax.map when large, so at most one
# (plus pipelining) is alive at a time.
#
# Layout rule (learned the hard way from sparse_conv_apply_block's OOM):
# every intermediate keeps the VOXEL axis LAST — (9, V) / (27, V) — because
# a trailing dim of 3/9/27 pads to the 128-lane tile (14-42x memory
# expansion).  Only the final neighbor map is transposed to the (V, 27)
# layout the conv applies expect.
# ---------------------------------------------------------------------------

_TABLE_VMAP_CELLS = 2 ** 26   # above this, build per-sample under lax.map


def _row_table_one(keys: jnp.ndarray, mask: jnp.ndarray,
                   n_cells: int) -> jnp.ndarray:
    """(n_cells + 3,) int32 cell -> row table, miss/invalid -> V.

    Front-padded by one miss cell and back-padded by two so a 3-tap z-slice
    starting at cell c reads table[c .. c+2] = cells (c-1, c, c+1) without
    any boundary clamping; out-of-grid xy columns read the back pads.
    """
    v = keys.shape[0]
    pos = jnp.where(mask, keys + 1, n_cells + 3)   # OOB -> dropped
    table = jnp.full((n_cells + 3,), v, jnp.int32)
    # keys are sorted and unique (ops.voxelize invariant) — assert it so XLA
    # vectorizes the scatter instead of serializing per element
    return table.at[pos].set(jnp.arange(v, dtype=jnp.int32), mode='drop',
                             unique_indices=True, indices_are_sorted=True)


def _index_from_table_one(table: jnp.ndarray, out_coords, out_mask,
                          shape_in: Tuple[int, int, int], stride: int,
                          v_in: int) -> jnp.ndarray:
    """Neighbor map (V_out, 27) from a row table; miss/invalid -> V_in.

    Same query geometry as _build_index_one (in = out*stride + tap - 1,
    base z tap dz=1 always in range); taps are read with three (9, V)
    element gathers in tap-major layout.
    """
    sx, sy, sz = shape_in
    n_cells = sx * sy * sz
    offs2 = jnp.asarray(XY_OFFSETS, jnp.int32)              # (9, 2)
    qx = out_coords[None, :, 0] * stride + offs2[:, 0, None] - 1  # (9, V)
    qy = out_coords[None, :, 1] * stride + offs2[:, 1, None] - 1
    zb = (out_coords[:, 2] * stride)[None, :]                     # (1, V)
    ok_xy = (out_mask[None, :]
             & (qx >= 0) & (qx < sx) & (qy >= 0) & (qy < sy))     # (9, V)
    # padded-table slice base: index c reads cell c-1; taps dz in {0,1,2}
    # live at c+dz with c = the (x', y', z*stride) cell index
    c = jnp.where(ok_xy, (qx * sy + qy) * sz + zb, n_cells)
    # the 3 dz taps read CONSECUTIVE table entries table[c..c+2]: one
    # slice-gather (slice_sizes=3) pays one random-access latency per
    # (dx, dy) instead of three — the tap gathers are the dominant table
    # cost on TPU (results/round5_tables.log: latency-, not
    # bandwidth-bound on the 164 MB stage-0 table)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,), collapsed_slice_dims=(), start_index_map=(0,))
    nbr3 = jax.lax.gather(
        table, c.reshape(9, -1, 1), dnums, slice_sizes=(3,),
        mode=jax.lax.GatherScatterMode.CLIP)                # (9, V, 3)
    taps = []
    for dz in range(3):
        zt = zb + dz - 1
        ok = ok_xy & (zt >= 0) & (zt < sz)
        taps.append(jnp.where(ok, nbr3[:, :, dz], v_in))
    nbr = jnp.stack(taps, axis=1)                # (9, 3, V) tap-major
    return jnp.transpose(nbr.reshape(27, -1))   # (V_out, 27)


def _downsample_out_set_table_one(in_coords, in_mask, shape_out,
                                  capacity: int):
    """Active stride-2 output set via dense occupancy + prefix sum.

    Same receptive-field rule and overflow semantics as
    _downsample_coords_one (first `capacity` unique out keys ascending),
    without the 8V-row sort: scatter candidate cells into a dense int32
    occupancy grid, prefix-sum it, and read unique cell #i at the first
    index whose running count reaches i+1 (binary search over the monotone
    prefix array — 26 rounds of `capacity`-element gathers, no sort).
    """
    n_out = shape_out[0] * shape_out[1] * shape_out[2]
    d = in_coords                                    # (V, 3)
    so = jnp.asarray(shape_out, jnp.int32)
    targets = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                sel = jnp.asarray([ix, iy, iz], jnp.int32)[None, :]
                even = (d % 2) == 0
                cand = jnp.where(even, d // 2,
                                 jnp.where(sel == 0, (d + 1) // 2,
                                           (d - 1) // 2))
                ok = in_mask & jnp.all((cand >= 0) & (cand < so), axis=-1)
                key = (cand[:, 0] * shape_out[1] + cand[:, 1]) \
                    * shape_out[2] + cand[:, 2]
                targets.append(jnp.where(ok, key, n_out))
    occ = jnp.zeros((n_out,), jnp.int32).at[
        jnp.concatenate(targets)].set(1, mode='drop')
    csum = jnp.cumsum(occ)
    pos = jnp.searchsorted(csum, jnp.arange(1, capacity + 1,
                                            dtype=csum.dtype), method='scan')
    out_mask = pos < n_out
    out_keys = jnp.where(out_mask, pos, n_out).astype(jnp.int32)
    out_coords = jnp.where(out_mask[:, None],
                           key_to_coords(out_keys, shape_out), 0)
    return out_coords, out_keys, out_mask


def stage_indices_table(sp: SparseVoxels, shape: Tuple[int, int, int],
                        down_capacity: int | None = None):
    """All neighbor maps for one encoder stage from ONE row table.

    Returns (subm_nbr, strided) where strided is None when down_capacity is
    None, else ((out_coords, out_keys, out_mask, strided_nbr), shape_out).
    Built per-sample — under lax.map when the grid is large (so only one
    transient table is alive at a time), vmap otherwise.
    """
    sx, sy, sz = shape
    n_cells = sx * sy * sz
    v_in = sp.keys.shape[1]
    batch = sp.keys.shape[0]
    shape_out = out_shape_strided(shape) if down_capacity else None

    def one(args):
        coords, mask, keys = args
        table = _row_table_one(keys, mask, n_cells)
        subm = _index_from_table_one(table, coords, mask, shape, 1, v_in)
        if down_capacity is None:
            return subm
        oc, okeys, om = _downsample_out_set_table_one(
            coords, mask, shape_out, down_capacity)
        snbr = _index_from_table_one(table, oc, om, shape, 2, v_in)
        return subm, (oc, okeys, om, snbr)

    args = (sp.coords, sp.mask, sp.keys)
    # vmap materializes BATCH tables at once — the memory/bandwidth budget
    # is batch * n_cells, not n_cells (time-folded streaming runs the
    # encoder at B=chunk)
    if batch * n_cells > _TABLE_VMAP_CELLS:
        out = jax.lax.map(one, args)
    else:
        out = jax.vmap(one)(args)
    if down_capacity is None:
        return out, None
    return out[0], (out[1], shape_out)


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
        tgt = jnp.where(m, k, n)   # invalid -> OOB, dropped; keys are
        dense = jnp.zeros((n, C), feats.dtype)   # sorted + unique, so the
        dense = dense.at[tgt].set(                # scatter vectorizes
            jnp.where(m[:, None], f, 0), mode='drop',
            unique_indices=True, indices_are_sorted=True)
        return dense.reshape(sx, sy, sz, C)

    return jax.vmap(one)(feats, keys, mask)
