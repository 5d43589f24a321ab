"""Cross-modal LSS view transformer (camera branch core).

TPU-native re-design of CrossModalLSS / DepthSegNet / CrossModalFusion
(reference: fusionocc/necks/fusion_view_transformer.py:12-251) on top of the
Pallas/XLA frustum pooling in ops/bev_pool.py.

Pipeline per (frame, view):
  1. one-hot the min-pooled sparse LiDAR depth (88 bins) -> depth_encoder CNN
  2. image feature -> img_reduce_conv
  3. CrossModalFusion channel+spatial cross attention between the two
  4. DepthSegNet -> depth logits (88), 2D seg logits (18), 32-ch context
     (16 seg-branch + 16 context-branch)
  5. softmax depth, lift-splat via bev_pool -> (B, Z, Y, X, C) voxel feature

During training the depth input is randomly zeroed for ~50% of views
(fusion_view_transformer.py:236-237).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GridConfig, ViewTransformerConfig
from ..nn.layers import ASPP, BasicBlock2D, BatchNorm, ConvBN, Mlp, SELayer
from ..ops.bev_pool import PoolingIndex, bev_pool

Dtype = Any


def downsample_depth_onehot(
        sparse_depth: jnp.ndarray, downsample: int, grid: GridConfig,
        sid: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min-pool sparse depth per patch, quantize to one-hot depth bins.

    Args:
      sparse_depth: (B, N, H, W) metres, 0 = empty.
      sid: spacing-increasing discretization — log-spaced bins instead of
        linear (view_transformer.py:771-778):
        bin = 1 + (D-1) * log(d / lo) / log((hi - 1) / lo).
    Returns:
      onehot: (B, N, h, w, D) float32 (all-zero rows where no depth), and
      bin index map (B, N, h, w) int32 (0 = empty, else 1..D).
    Mirrors get_downsampled_gt_depth (view_transformer.py:747-786).
    """
    B, N, H, W = sparse_depth.shape
    ds = downsample
    D = grid.num_depth_bins
    x = sparse_depth.reshape(B, N, H // ds, ds, W // ds, ds)
    x = jnp.where(x == 0.0, 1e5, x)
    x = jnp.min(x, axis=(3, 5))                       # (B, N, h, w)
    lo, hi, step = grid.depth
    if sid:
        binf = jnp.log(x) - jnp.log(jnp.float32(lo))
        binf = binf * (D - 1) / jnp.log(jnp.float32(hi - 1.0) / lo) + 1.0
    else:
        binf = (x - (lo - step)) / step
    binf = jnp.where((binf < D + 1) & (binf >= 0.0), binf, 0.0)
    bins = binf.astype(jnp.int32)                     # 0 = empty, 1..D valid
    onehot = jax.nn.one_hot(bins, D + 1, dtype=jnp.float32)[..., 1:]
    return onehot, bins


class CrossModalFusion(nn.Module):
    """Channel + spatial cross attention between camera and depth features.

    Reference: fusion_view_transformer.py:97-144. NHWC.
    """
    mid_channels: int
    alpha: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fc, fd, train: bool = False):
        C = self.mid_channels
        gc = jnp.mean(fc, axis=(1, 2))                # (B', C)
        gd = jnp.mean(fd, axis=(1, 2))
        w_c = nn.sigmoid(nn.Dense(C, dtype=self.dtype,
                                  param_dtype=jnp.float32,
                                  name='channel_mlp_c')(gc))[:, None, None, :]
        w_d = nn.sigmoid(nn.Dense(C, dtype=self.dtype,
                                  param_dtype=jnp.float32,
                                  name='channel_mlp_d')(gd))[:, None, None, :]
        fc2d = w_d * fc
        fd2c = w_c * fd
        fuse = ConvBN(2 * C, (3, 3), dtype=self.dtype,
                      name='fuse_conv')(jnp.concatenate([fc2d, fd2c], -1),
                                        train=train)
        f_c = jnp.mean(fuse[..., :C], axis=-1, keepdims=True)
        f_d = jnp.mean(fuse[..., C:], axis=-1, keepdims=True)

        def spatial(x, name):
            y = nn.Conv(C // 2, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f'{name}_0')(x)
            y = nn.relu(y)
            y = nn.Conv(1, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f'{name}_1')(y)
            return nn.relu(y)

        zc = spatial(f_c, 'spatial_c')
        zd = spatial(f_d, 'spatial_d')
        return self.alpha * zd * fc + fc, self.alpha * zc * fd + fd


class DepthSegNet(nn.Module):
    """Depth distribution + 2D semantics + context head.

    Reference: fusion_view_transformer.py:12-94. Input is the fused
    (B', h, w, 2*mid) feature; camera-parameter conditioning is applied via
    SE layers fed by MLPs of the batch-normed 27-dim vector.
    """
    cfg: ViewTransformerConfig
    num_depth_bins: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mlp_input, train: bool = False):
        cfg = self.cfg
        mid = cfg.mid_channels
        seg_feat_ch = cfg.feature_channels // 2
        ctx_feat_ch = cfg.feature_channels - seg_feat_ch

        mi = BatchNorm(dtype=jnp.float32, name='mlp_bn')(
            mlp_input.reshape(-1, mlp_input.shape[-1]), train=train)
        mi = mi.astype(self.dtype)

        x_c = ConvBN(mid, (3, 3), dtype=self.dtype,
                     name='reduce_conv_seg')(x, train=train)
        x_d = ConvBN(mid, (3, 3), dtype=self.dtype,
                     name='reduce_conv_depth')(x, train=train)
        x_cx = ConvBN(mid, (3, 3), dtype=self.dtype,
                      name='reduce_conv_context')(x, train=train)

        seg_se = Mlp(mid, mid, dtype=self.dtype,
                     name='seg_mlp')(mi)[:, None, None, :]
        seg = SELayer(mid, dtype=self.dtype, name='seg_se')(x_c, seg_se)
        # plain conv straight into the BasicBlock — no activation between
        # (fusion_view_transformer.py:69-72)
        seg = ConvBN(seg_feat_ch, (3, 3), norm=False, use_bias=True,
                     act=None, dtype=self.dtype,
                     name='seg_conv0')(seg, train=train)
        seg_feature = BasicBlock2D(seg_feat_ch, dtype=self.dtype,
                                   name='seg_conv1')(seg, train=train)
        seg_out = nn.Conv(cfg.seg_num_classes, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32, name='seg_out')(seg_feature)

        ctx_se = Mlp(mid, mid, dtype=self.dtype,
                     name='context_mlp')(mi)[:, None, None, :]
        ctx = SELayer(mid, dtype=self.dtype, name='context_se')(x_cx, ctx_se)
        context_feature = nn.Conv(ctx_feat_ch, (3, 3), dtype=self.dtype,
                                  param_dtype=jnp.float32,
                                  name='context_conv')(ctx)

        feature = jnp.concatenate([seg_feature, context_feature], axis=-1)

        d_se = Mlp(mid, mid, dtype=self.dtype,
                   name='depth_mlp')(mi)[:, None, None, :]
        d = SELayer(mid, dtype=self.dtype, name='depth_se')(x_d, d_se)
        d = BasicBlock2D(mid, dtype=self.dtype, name='depth_block0')(d, train=train)
        d = BasicBlock2D(mid, dtype=self.dtype, name='depth_block1')(d, train=train)
        d = ASPP(cfg.aspp_mid_channels, mid, dtype=self.dtype,
                 name='aspp')(d, train=train)
        depth = nn.Conv(self.num_depth_bins, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name='depth_out')(d)
        return depth, feature, seg_out


class CrossModalLSS(nn.Module):
    """Full cross-modal lift-splat view transformer."""
    cfg: ViewTransformerConfig
    grid: GridConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sparse_depth, mlp_input, pool_idx: PoolingIndex,
                 train: bool = False):
        """Args:
          x: (B, N, h, w, C_in) image features (FPN output).
          sparse_depth: (B, N, H, W) input-resolution sparse LiDAR depth.
          mlp_input: (B, N, 27) camera parameters.
          pool_idx: precomputed pooling index for this frame's geometry.
        Returns:
          voxel feature (B, Z, Y, X, C_feat), depth softmax (B, N, h, w, D),
          seg logits (B, N, h, w, num_seg).
        """
        cfg = self.cfg
        B, N, h, w, _ = x.shape
        D = self.grid.num_depth_bins

        onehot, _ = downsample_depth_onehot(sparse_depth, cfg.downsample,
                                            self.grid, sid=cfg.sid)
        depth_input = jax.lax.stop_gradient(onehot)      # (B, N, h, w, D)
        if train and cfg.depth_drop_rate > 0:
            keep = jax.random.bernoulli(
                self.make_rng('dropout'), 1.0 - cfg.depth_drop_rate, (B * N,))
            depth_input = depth_input * keep.reshape(
                B * N, 1, 1, 1).astype(depth_input.dtype).reshape(
                    B, N, 1, 1, 1)
        depth_input = depth_input.astype(self.dtype)

        img = x.reshape(B * N, h, w, -1)
        di = depth_input.reshape(B * N, h, w, D)
        f_c = ConvBN(cfg.mid_channels, (3, 3), dtype=self.dtype,
                     name='img_reduce_conv')(img, train=train)
        f_d = ConvBN(cfg.mid_channels, (3, 3), dtype=self.dtype,
                     name='depth_encoder0')(di, train=train)
        f_d = ConvBN(cfg.mid_channels, (3, 3), dtype=self.dtype,
                     name='depth_encoder1')(f_d, train=train)
        fc_c2d, fc_d2c = CrossModalFusion(
            cfg.mid_channels, dtype=self.dtype,
            name='cross_modal_fusion')(f_c, f_d, train=train)
        fused = BasicBlock2D(cfg.mid_channels * 2, dtype=self.dtype,
                             name='further_fuse')(
            jnp.concatenate([fc_c2d, fc_d2c], -1), train=train)

        depth_logits, feature, seg_out = DepthSegNet(
            cfg, D, dtype=self.dtype, name='depth_seg_net')(
                fused, mlp_input, train=train)

        depth = jax.nn.softmax(depth_logits.astype(jnp.float32), axis=-1)
        depth = depth.reshape(B, N, h, w, D)
        feature = feature.reshape(B, N, h, w, -1)
        # bev_pool expects depth as (B, N, D, h, w)
        voxel = bev_pool(jnp.transpose(depth, (0, 1, 4, 2, 3)),
                         feature.astype(jnp.float32), pool_idx, self.grid)
        voxel = voxel.astype(self.dtype)
        return voxel, depth, seg_out.reshape(B, N, h, w, -1)
