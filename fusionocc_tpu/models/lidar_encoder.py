"""LiDAR branch: dynamic voxelization + sparse 3D conv encoder.

TPU-native re-design of CustomSparseEncoder
(reference: fusionocc/lidar_encoder.py:31-246):
  - scatter_voxelize -> ops.voxelize.voxelize_mean (fp32, stop-gradient, like
    the reference's @torch.no_grad @force_fp32 voxelization)
  - SubMConv3d/SparseConv3d stacks -> gather-GEMM-scatter over static-capacity
    voxel buffers (ops.sparse_conv), with spconv-style shared neighbor maps
    per (resolution, kind) — the `indice_key` mechanism.
  - .dense() -> unique-index scatter into (B, Z, Y, X, C).

Channel plan (encoder_channels, lidar_encoder.py:42): stage i has
len(blocks)-1 SubM convs followed (stages 1..3) by a stride-2 SparseConv3d;
then a 1x1 SubM out-projection with neither norm nor activation
(order=("conv",), lidar_encoder.py:80-89).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GridConfig, SparseEncoderConfig
from ..nn.layers import MaskedBatchNorm
from ..ops.dense_conv import (conv3d_ndhwc, conv3d_zbatch, dense_from_zfold,
                              strided_out_mask)
from ..ops.sparse_conv import (build_strided_index, build_subm_index,
                               out_shape_strided,
                               sparse_conv1x1_apply, sparse_conv_apply,
                               sparse_conv_apply_block,
                               sparse_to_dense, stage_indices_table)
from ..ops.pallas.zwin_conv import (zwin_conv_apply, zwin_conv_infer,
                                    zwin_plan)
from ..ops.zfold import (ZFoldVoxels, as_sparse, expand_lane_mask,
                         expand_weight, strided_lane_mask, super_shape,
                         zband_conv_apply, zfold_regroup, zfold_to_dense,
                         zslice_conv_apply)
from ..ops.tile_sparse import (TileVoxels, neighbor_slots, tile_conv1x1,
                               tile_grid, tile_strided_apply,
                               tile_strided_prepare, tile_subm_conv,
                               tiles_from_sorted, tiles_to_dense)
from ..ops.voxelize import SparseVoxels, voxelize_mean

Dtype = Any


class SubMConvBN(nn.Module):
    """Submanifold 3x3x3 conv + masked BN + ReLU over a sparse voxel set.

    Two backends with the SAME parameter tree (kernel (27, Cin, Cout) in
    KERNEL_OFFSETS row-major order + MaskedBatchNorm), so checkpoints are
    backend-interchangeable: 'coo' gather-GEMM over a COO buffer, 'tile'
    one dense MXU conv over halo'd active tiles (ops/tile_sparse.py).
    """
    features: int
    norm: bool = True
    act: bool = True
    tile: bool = False
    dense: str = ''        # 'xla3d'/'zbatch': masked dense conv (dense_conv)
    fold: int = 0          # >0: zfold super rows (ops/zfold.py)
    gather: str = 'row'
    tap_chunk: int = 0     # bound gather temps (ops/sparse_conv.py)
    zconv: str = 'lifted'  # zfold formulation (ops/zfold.py)
    col_chunk: int = 3
    zwin_block: int = 128  # zwin kernel tiling (ops/pallas/zwin_conv.py)
    zwin_nwin: int = 4
    zwin_bad_frac: float = 0.125  # overflow-block recompute capacity
    zwin_merged: bool = False     # merged-tap kernel (one stacked matmul/dx)
    zwin_fuse: bool = True  # fuse eval BN+ReLU+lane mask into the kernel
    remat: bool = False    # recompute gathers in backward (config.remat_conv)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, mask, nbr_idx, train: bool = False,
                 lane_mask=None, zplan=None):
        maybe_ckpt = jax.checkpoint if self.remat else (lambda f: f)
        # z-folded feats carry ts*C / fold*C lanes; the param stays
        # (27, C, Cout) — backend-interchangeable checkpoints
        if self.tile:
            cin = feats.shape[-1] // feats.shape[-2]
        elif self.fold:
            cin = feats.shape[-1] // self.fold
        else:
            cin = feats.shape[-1]
        w = self.param('kernel', nn.initializers.he_normal(),
                       (27, cin, self.features), jnp.float32)
        if self.dense:
            # masked dense conv (ops/dense_conv.py): feats is the dense
            # (B, [XYZ...], C) volume with exact zeros at inactive cells
            # (MaskedBatchNorm re-zeroes after every conv); mask is the
            # dense bool active set; nbr_idx is unused.
            conv = conv3d_zbatch if self.dense == 'zbatch' else conv3d_ndhwc
            y = maybe_ckpt(lambda f, k: conv(f, k, 1))(feats, w)
        elif self.tile:
            y = tile_subm_conv(feats, mask, nbr_idx, w)
        elif self.fold and self.zconv == 'zwin':
            if not train and self.norm and self.zwin_fuse:
                # BN affine + ReLU + lane mask fused into the kernel
                # epilogue — measured slower than letting XLA fuse the
                # elementwise chain (config.py zwin_fuse); kept opt-in
                inv, bshift = MaskedBatchNorm(
                    fold=self.fold, dtype=self.dtype,
                    channels=self.features)(None, None)
                y = zwin_conv_infer(
                    feats, mask, nbr_idx, w, self.fold, self.fold, 1,
                    block_v=self.zwin_block, n_win=self.zwin_nwin,
                    bad_frac=self.zwin_bad_frac, merged=self.zwin_merged,
                    plan=zplan,
                    affine=(jnp.tile(inv, self.fold),
                            jnp.tile(bshift, self.fold)),
                    act=self.act,
                    lane_exp=expand_lane_mask(lane_mask, self.features,
                                              self.dtype))
                return y
            elif not train:
                # eval: shared per-stage window plan, unfused epilogue
                y = zwin_conv_infer(
                    feats, mask, nbr_idx, w, self.fold, self.fold, 1,
                    block_v=self.zwin_block, n_win=self.zwin_nwin,
                    bad_frac=self.zwin_bad_frac, merged=self.zwin_merged,
                    plan=zplan)
            else:
                y = maybe_ckpt(lambda f, m, n, k: zwin_conv_apply(
                    f, m, n, k, self.fold, self.fold, 1,
                    block_v=self.zwin_block, n_win=self.zwin_nwin,
                    bad_frac=self.zwin_bad_frac,
                    merged=self.zwin_merged))(
                    feats, mask, nbr_idx, w)
        elif self.fold and self.zconv == 'zslice':
            y = maybe_ckpt(lambda f, m, n, k: zslice_conv_apply(
                f, m, n, k, self.fold, self.fold, 1,
                col_chunk=self.col_chunk))(feats, mask, nbr_idx, w)
        elif self.fold and self.zconv == 'zband':
            y = maybe_ckpt(lambda f, m, n, k: zband_conv_apply(
                f, m, n, k, self.fold, self.fold, 1))(
                feats, mask, nbr_idx, w)
        elif self.fold:
            w_e = expand_weight(w, self.fold, self.fold, 1)
            y = maybe_ckpt(lambda f, m, n, k: sparse_conv_apply(
                f, m, n, k, tap_chunk=self.tap_chunk))(
                feats, mask, nbr_idx, w_e)
        elif self.gather == 'block':
            y = sparse_conv_apply_block(feats, mask, nbr_idx, w)
        else:
            y = sparse_conv_apply(feats, mask, nbr_idx, w)
        if self.norm:
            bn_mask = lane_mask if self.fold else mask
            y = MaskedBatchNorm(fold=self.fold, dtype=self.dtype)(
                y, bn_mask, train=train)
        elif self.fold:
            y = y * expand_lane_mask(lane_mask, self.features, y.dtype)
        elif self.dense:
            y = jnp.where(mask[..., None], y, 0)
        if self.act:
            y = nn.relu(y)
        return y


class SparseConvBNStride2(nn.Module):
    """Strided sparse conv (new active set) + masked BN + ReLU.

    ``nbr_idx`` is the COO (B, V_out, 27) neighbor map, or the
    StridedGeom when ``tile``; ``out_mask`` is the output active mask in
    the matching layout.  Parameter tree is backend-independent.
    """
    features: int
    norm: bool = True      # False: profiling only (config.profile_no_bn)
    tile: bool = False
    dense: str = ''        # 'xla3d'/'zbatch': masked dense conv (dense_conv)
    fold_in: int = 0       # >0: zfold super rows (ops/zfold.py)
    fold_out: int = 0
    gather: str = 'row'
    tap_chunk: int = 0     # bound gather temps (ops/sparse_conv.py)
    zconv: str = 'lifted'  # zfold formulation (ops/zfold.py)
    col_chunk: int = 3
    zwin_block: int = 128  # zwin kernel tiling (ops/pallas/zwin_conv.py)
    zwin_nwin: int = 4
    zwin_bad_frac: float = 0.125  # overflow-block recompute capacity
    zwin_merged: bool = False     # merged-tap kernel (one stacked matmul/dx)
    zwin_fuse: bool = True  # fuse eval BN+ReLU+lane mask into the kernel
    remat: bool = False    # recompute gathers in backward (config.remat_conv)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, out_mask, nbr_idx, train: bool = False,
                 out_lane_mask=None):
        maybe_ckpt = jax.checkpoint if self.remat else (lambda f: f)
        if self.tile:
            cin = feats.shape[-1] // feats.shape[-2]
        elif self.fold_in:
            cin = feats.shape[-1] // self.fold_in
        else:
            cin = feats.shape[-1]
        w = self.param('kernel', nn.initializers.he_normal(),
                       (27, cin, self.features), jnp.float32)
        if self.dense:
            conv = conv3d_zbatch if self.dense == 'zbatch' else conv3d_ndhwc
            y = maybe_ckpt(lambda f, k: conv(f, k, 2))(feats, w)
        elif self.tile:
            y = tile_strided_apply(feats, nbr_idx, w)
        elif self.fold_in and self.zconv == 'zwin':
            if not train and self.zwin_fuse and self.norm:
                inv, bshift = MaskedBatchNorm(
                    fold=self.fold_out, dtype=self.dtype,
                    channels=self.features)(None, None)
                return zwin_conv_infer(
                    feats, out_mask, nbr_idx, w, self.fold_in,
                    self.fold_out, 2,
                    block_v=self.zwin_block, n_win=self.zwin_nwin,
                    bad_frac=self.zwin_bad_frac, merged=self.zwin_merged,
                    affine=(jnp.tile(inv, self.fold_out),
                            jnp.tile(bshift, self.fold_out)),
                    act=True,
                    lane_exp=expand_lane_mask(out_lane_mask, self.features,
                                              self.dtype))
            y = maybe_ckpt(lambda f, m, n, k: zwin_conv_apply(
                f, m, n, k, self.fold_in, self.fold_out, 2,
                block_v=self.zwin_block, n_win=self.zwin_nwin,
                bad_frac=self.zwin_bad_frac, merged=self.zwin_merged))(
                feats, out_mask, nbr_idx, w)
        elif self.fold_in and self.zconv == 'zslice':
            y = maybe_ckpt(lambda f, m, n, k: zslice_conv_apply(
                f, m, n, k, self.fold_in, self.fold_out, 2,
                col_chunk=self.col_chunk))(feats, out_mask, nbr_idx, w)
        elif self.fold_in and self.zconv == 'zband':
            y = maybe_ckpt(lambda f, m, n, k: zband_conv_apply(
                f, m, n, k, self.fold_in, self.fold_out, 2))(
                feats, out_mask, nbr_idx, w)
        elif self.fold_in:
            w_e = expand_weight(w, self.fold_in, self.fold_out, 2)
            y = maybe_ckpt(lambda f, m, n, k: sparse_conv_apply(
                f, m, n, k, tap_chunk=self.tap_chunk))(
                feats, out_mask, nbr_idx, w_e)
        elif self.gather == 'block':
            y = sparse_conv_apply_block(feats, out_mask, nbr_idx, w)
        else:
            y = sparse_conv_apply(feats, out_mask, nbr_idx, w)
        if not self.norm:   # profiling only (config.profile_no_bn)
            return y
        bn_mask = out_lane_mask if self.fold_in else out_mask
        y = MaskedBatchNorm(fold=self.fold_out, dtype=self.dtype)(
            y, bn_mask, train=train)
        return nn.relu(y)


class SparseEncoder(nn.Module):
    """Full LiDAR encoder: points -> dense (B, Z, Y, X, C_out) voxel volume."""
    cfg: SparseEncoderConfig
    grid: GridConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, points: jnp.ndarray, points_mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        shape = cfg.sparse_shape(self.grid)
        pcr = self.grid.point_cloud_range

        use_tile = cfg.backend == 'tile'
        sp = voxelize_mean(
            jax.lax.stop_gradient(points.astype(jnp.float32)),
            points_mask, pcr, cfg.voxel_size, shape, cfg.voxel_capacity[0],
            tile_size=cfg.tile_size if use_tile else None)
        if cfg.stop_after == 'vox':
            return sp.feats
        feats = sp.feats.astype(self.dtype)

        # conv_input: 1x1 SubM, conv only (lidar_encoder.py:65-74)
        w_in = self.param('conv_input_kernel', nn.initializers.he_normal(),
                          (cfg.in_channels, cfg.base_channels), jnp.float32)
        feats = sparse_conv1x1_apply(feats, sp.mask, w_in)
        if cfg.stop_after == 'input':
            return feats

        if use_tile:
            return self._tile_stages(feats, sp, shape, train)
        if cfg.backend == 'zfold':
            return self._zfold_stages(feats, sp, shape, train)

        cur = SparseVoxels(feats, sp.coords, sp.keys, sp.mask)
        cur_shape = shape
        num_stages = len(cfg.encoder_channels)
        for i, blocks in enumerate(cfg.encoder_channels):
            last = i == num_stages - 1
            down_cap = None if last else cfg.voxel_capacity[i + 1]
            if cfg.index == 'table':
                # one dense row table per stage serves the shared subm map
                # AND the strided map (the spconv indice_key mechanism)
                nbr, strided = stage_indices_table(cur, cur_shape, down_cap)
            else:
                nbr = build_subm_index(cur, cur_shape)
                strided = None if last else build_strided_index(
                    cur, cur_shape, down_cap)
            n_subm = len(blocks) - 1 if not last else len(blocks)
            f = cur.feats
            for j in range(n_subm):
                f = SubMConvBN(blocks[j], dtype=self.dtype,
                               gather=cfg.gather,
                               name=f'stage{i}_subm{j}')(
                    f, cur.mask, nbr, train=train)
            if not last:
                (oc, okeys, om, snbr), out_shape = strided
                f = SparseConvBNStride2(blocks[-1], dtype=self.dtype,
                                        gather=cfg.gather,
                                        name=f'stage{i}_down')(
                    f, om, snbr, train=train)
                cur = SparseVoxels(f, oc, okeys, om)
                cur_shape = out_shape
            else:
                cur = SparseVoxels(f, cur.coords, cur.keys, cur.mask)

        # conv_out: 1x1 SubM, conv only (lidar_encoder.py:80-89)
        w_out = self.param('conv_out_kernel', nn.initializers.he_normal(),
                           (cur.feats.shape[-1], cfg.output_channels),
                           jnp.float32)
        f = sparse_conv1x1_apply(cur.feats, cur.mask, w_out)

        dense = sparse_to_dense(f, cur.keys, cur.mask, cur_shape)
        # (B, X, Y, Z, C) -> (B, Z, Y, X, C): matches the image voxel layout
        # (the reference permutes to (B, C, z, y, x), fusion_occ.py:795)
        return jnp.transpose(dense, (0, 3, 2, 1, 4))

    def _zfold_stages(self, feats, sp: SparseVoxels, shape, train: bool):
        """z-folded backend (ops/zfold.py): F=8 z-consecutive cells per
        128-lane super row; table index builds run on the F-times-smaller
        super grid and every conv is a clean (S, 27*F*Cin) MXU GEMM.  Same
        parameter tree as the COO path (module names + (27, Cin, Cout)
        kernels), so checkpoints are backend-interchangeable; equivalence
        is tested in tests/test_zfold.py."""
        cfg = self.cfg
        zf = zfold_regroup(SparseVoxels(feats, sp.coords, sp.keys, sp.mask),
                           shape, cfg.zfold_capacity[0],
                           min(cfg.zfold, shape[2]))
        if cfg.stop_after == 'regroup':
            return zf.feats
        cur_cells = shape
        num_stages = len(cfg.encoder_channels)
        for i, blocks in enumerate(cfg.encoder_channels):
            if i == cfg.dense_from:
                return self._dense_tail(zf, cur_cells, i, train)
            last = i == num_stages - 1
            sshape = super_shape(cur_cells, zf.fold)
            down_cap = None if last else cfg.zfold_capacity[i + 1]
            nbr, strided = stage_indices_table(as_sparse(zf), sshape,
                                               down_cap)
            if cfg.stop_after == f'table{i}':
                return nbr
            n_subm = len(blocks) - 1 if not last else len(blocks)
            f = zf.feats
            # the stage's SubM convs share one neighbor map: precompute
            # the zwin window plan once (eval serving only — training
            # routes through zwin_conv_apply's custom VJP)
            s_cap = zf.feats.shape[1]
            zplan = None
            if (not train and cfg.zconv == 'zwin'
                    and nbr.shape[1] % cfg.zwin_block == 0
                    and s_cap >= cfg.zwin_block):
                zplan = zwin_plan(nbr, s_cap, cfg.zwin_block,
                                  cfg.zwin_nwin, cfg.zwin_bad_frac)
            for j in range(n_subm):
                f = SubMConvBN(blocks[j], fold=zf.fold, dtype=self.dtype,
                               tap_chunk=cfg.tap_chunk, zconv=cfg.zconv,
                               col_chunk=cfg.col_chunk,
                               zwin_block=cfg.zwin_block,
                               zwin_nwin=cfg.zwin_nwin,
                               zwin_bad_frac=cfg.zwin_bad_frac,
                               zwin_merged=cfg.zwin_merged,
                               zwin_fuse=cfg.zwin_fuse,
                               norm=not cfg.profile_no_bn,
                               act=not cfg.profile_no_bn,
                               remat=cfg.remat_conv,
                               name=f'stage{i}_subm{j}')(
                    f, zf.mask, nbr, train=train, lane_mask=zf.lane_mask,
                    zplan=zplan)
            if not last:
                (oc, okeys, om, snbr), sshape_out = strided
                out_cells = out_shape_strided(cur_cells)
                f_out = min(cfg.zfold, out_cells[2])
                out_lane = strided_lane_mask(zf.lane_mask, om, snbr,
                                             zf.fold, f_out)
                f = SparseConvBNStride2(blocks[-1], fold_in=zf.fold,
                                        fold_out=f_out, dtype=self.dtype,
                                        tap_chunk=cfg.tap_chunk,
                                        zconv=cfg.zconv,
                                        col_chunk=cfg.col_chunk,
                                        zwin_block=cfg.zwin_block,
                                        zwin_nwin=cfg.zwin_nwin,
                                        zwin_bad_frac=cfg.zwin_bad_frac,
                                        zwin_merged=cfg.zwin_merged,
                                        zwin_fuse=cfg.zwin_fuse,
                                        norm=not cfg.profile_no_bn,
                                        remat=cfg.remat_conv,
                                        name=f'stage{i}_down')(
                    f, om, snbr, train=train, out_lane_mask=out_lane)
                oc2 = jnp.where(om[..., None], oc, 0)
                zf = ZFoldVoxels(f, oc2, okeys, om, out_lane, f_out)
                cur_cells = out_cells
            else:
                zf = zf._replace(feats=f)
            if cfg.stop_after == f'stage{i}':
                return zf.feats

        # conv_out: 1x1 SubM, conv only (lidar_encoder.py:80-89) — per-lane
        # block-diagonal kron(I_F, W) matmul
        cin = zf.feats.shape[-1] // zf.fold
        w_out = self.param('conv_out_kernel', nn.initializers.he_normal(),
                           (cin, cfg.output_channels), jnp.float32)
        w_bd = jax.scipy.linalg.block_diag(*([w_out] * zf.fold))
        f = sparse_conv1x1_apply(zf.feats, zf.mask, w_bd)
        if cfg.stop_after == 'conv_out':
            return f

        dense = zfold_to_dense(zf._replace(feats=f), cur_cells,
                               cfg.output_channels)
        return jnp.transpose(dense, (0, 3, 2, 1, 4))

    def _dense_tail(self, zf: ZFoldVoxels, cells, start: int, train: bool):
        """Masked dense convs for stages >= cfg.dense_from.

        By stages 2-3 the grids ([400,400,32] / [200,200,16] cells at full
        size) are small enough that a plain dense conv over the densified
        volume beats the sparse selection machinery AND needs no index
        tables at all (ops/dense_conv.py rationale).  Same parameter tree
        as the sparse stages (module names, (27, Cin, Cout) kernels), so
        checkpoints remain backend-interchangeable; equivalence pinned by
        tests/test_dense_tail.py.  Reference semantics: the same spconv
        SubM/strided stack (fusionocc/lidar_encoder.py:125-220).
        """
        cfg = self.cfg
        mode = cfg.dense_mode
        layout = 'bzxyc' if mode == 'zbatch' else 'bxyzc'
        cin = zf.feats.shape[-1] // zf.fold
        x, mask = dense_from_zfold(zf, cells, cin, layout)
        num_stages = len(cfg.encoder_channels)
        for i in range(start, num_stages):
            blocks = cfg.encoder_channels[i]
            last = i == num_stages - 1
            n_subm = len(blocks) - 1 if not last else len(blocks)
            for j in range(n_subm):
                x = SubMConvBN(blocks[j], dense=mode, dtype=self.dtype,
                               remat=cfg.remat_conv,
                               name=f'stage{i}_subm{j}')(
                    x, mask, None, train=train)
            if not last:
                mask = strided_out_mask(mask, 0)
                x = SparseConvBNStride2(blocks[-1], dense=mode,
                                        dtype=self.dtype,
                                        remat=cfg.remat_conv,
                                        name=f'stage{i}_down')(
                    x, mask, None, train=train)
            if cfg.stop_after == f'stage{i}':
                return x

        # conv_out: 1x1 SubM, conv only (lidar_encoder.py:80-89); x is
        # exact zero at inactive cells, so the linear map needs no remask
        w_out = self.param('conv_out_kernel', nn.initializers.he_normal(),
                           (x.shape[-1], cfg.output_channels), jnp.float32)
        y = jnp.einsum('...c,cd->...d', x, w_out.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        if cfg.stop_after == 'conv_out':
            return y
        # -> (B, Z, Y, X, C), matching the sparse paths' output layout
        perm = (0, 1, 3, 2, 4) if layout == 'bzxyc' else (0, 3, 2, 1, 4)
        return jnp.transpose(y, perm)

    def _tile_stages(self, feats, sp: SparseVoxels, shape, train: bool):
        """Block-sparse tile backend (ops/tile_sparse.py): stages as dense
        MXU convs over halo'd active ts^3 tiles.  Same parameter tree as the
        COO path (module names + kernel layouts match), so the two backends
        are checkpoint-interchangeable; equivalence is tested in
        tests/test_tile_sparse.py."""
        cfg = self.cfg
        ts = cfg.tile_size
        tv = tiles_from_sorted(feats, sp.keys, sp.mask, shape,
                               cfg.tile_capacity[0], ts)
        cur_shape = shape
        num_stages = len(cfg.encoder_channels)
        for i, blocks in enumerate(cfg.encoder_channels):
            nbr = neighbor_slots(tv, tile_grid(cur_shape, ts))
            n_subm = len(blocks) - 1 if i < num_stages - 1 else len(blocks)
            f = tv.feats
            for j in range(n_subm):
                f = SubMConvBN(blocks[j], tile=True, dtype=self.dtype,
                               name=f'stage{i}_subm{j}')(
                    f, tv.mask, nbr, train=train)
            if i < num_stages - 1:
                geom, out_shape = tile_strided_prepare(
                    tv, cur_shape, cfg.tile_capacity[i + 1])
                f = SparseConvBNStride2(blocks[-1], tile=True,
                                        dtype=self.dtype,
                                        name=f'stage{i}_down')(
                    f, geom.out_mask, geom, train=train)
                tv = TileVoxels(f, geom.out_mask, geom.tile_coords,
                                geom.tile_keys, geom.tile_mask, geom.table)
                cur_shape = out_shape
            else:
                tv = tv._replace(feats=f)

        # conv_out: 1x1 SubM, conv only (lidar_encoder.py:80-89) — in
        # z-folded form a block-diagonal kron(I_ts, W) lane matmul
        w_out = self.param('conv_out_kernel', nn.initializers.he_normal(),
                           (tv.feats.shape[-1] // ts, cfg.output_channels),
                           jnp.float32)
        f = tile_conv1x1(tv, w_out)

        dense = tiles_to_dense(tv._replace(feats=f), cur_shape)
        return jnp.transpose(dense, (0, 3, 2, 1, 4))
