"""Core NN building blocks (flax.linen, channels-last layouts).

Replicates the torch building blocks FusionOcc composes — ConvModule
(conv+BN+ReLU), mmdet BasicBlock, the 3D BasicBlock3D
(reference: fusionocc/backbones/resnet3d.py:8-43), SELayer / Mlp / ASPP
(reference: fusionocc/necks/view_transformer.py:342-488) — in idiomatic flax.

Layout conventions: 2D tensors are NHWC, 3D voxel tensors are (B, Z, Y, X, C).
BatchNorm statistics are always computed in float32; under pjit with a
data-sharded batch the stats are global across devices automatically (the
XLA-native equivalent of the reference's SyncBN hook,
fusionocc/hooks/syncbn_hook.py:43-82).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class BatchNorm(nn.Module):
    """BatchNorm with fp32 statistics regardless of compute dtype."""
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum, epsilon=self.epsilon,
            dtype=jnp.float32, param_dtype=jnp.float32)(
                x.astype(jnp.float32))
        return y.astype(self.dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid entries of (..., C) sparse voxel features.

    Equivalent of the BN1d inside spconv conv modules
    (lidar_encoder.py:40 norm_cfg BN1d eps 1e-3 momentum 0.01): statistics are
    computed over all *active* voxels in the batch.  Two layouts share the
    same (C,) parameters (backend-interchangeable checkpoints):

      - COO: x (..., C) with mask over the leading dims
        (x.ndim == mask.ndim + 1).
      - z-folded tiles (ops/tile_sparse.py): x (B, T+1, ts, ts, ts*C) with
        the flat cell mask (B, T+1, ts^3) (x.ndim == mask.ndim + 2).  Lane
        sums collapse to per-channel sums via a ``(ts*C, C)`` 0/1 matmul so
        statistics never materialize the padding-hostile unfolded layout.
      - z-folded super rows (ops/zfold.py, ``fold=F`` set): x (B, S, F*C)
        with the cell lane mask (B, S, F); same lane-collapse trick.
    """
    momentum: float = 0.99
    epsilon: float = 1e-3
    fold: int = 0           # >0: zfold lane layout (..., fold*C)
    channels: int = 0       # required only for the x=None affine query
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        if x is None:
            # affine-parameter query (fused serving epilogue,
            # ops/pallas/zwin_conv.py): define the SAME variables in the
            # SAME order as the full path, return (inv, bias_shift) with
            # eval BN == y = x * inv + bias_shift
            C = self.channels
            ra_mean = self.variable('batch_stats', 'mean',
                                    lambda: jnp.zeros((C,), jnp.float32))
            ra_var = self.variable('batch_stats', 'var',
                                   lambda: jnp.ones((C,), jnp.float32))
            scale = self.param('scale', nn.initializers.ones, (C,),
                               jnp.float32)
            bias = self.param('bias', nn.initializers.zeros, (C,),
                              jnp.float32)
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            return inv, bias - ra_mean.value * inv
        folded = self.fold > 0 or x.ndim == mask.ndim + 2
        if self.fold > 0:
            ts = self.fold
            C = x.shape[-1] // ts
        elif folded:
            ts = x.shape[-2]
            C = x.shape[-1] // ts
        else:
            ts, C = 1, x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (C,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (C,), jnp.float32)

        xf = x.astype(jnp.float32)
        if folded:
            if self.fold > 0:
                m = jnp.repeat(mask.astype(jnp.float32), C, axis=-1)
            else:
                from ..ops.tile_sparse import expand_cell_mask
                m = expand_cell_mask(mask, ts, C, jnp.float32)
            collapse = jnp.asarray(
                np.tile(np.eye(C, dtype=np.float32), (ts, 1)))
            red = tuple(range(xf.ndim - 1))

            def ch_sum(v):  # (..., ts*C) -> (C,) per-channel masked sum
                return jnp.einsum('...l,lc->c', v,
                                  collapse,
                                  preferred_element_type=jnp.float32)
        else:
            m = mask.astype(jnp.float32)[..., None]
            red = tuple(range(xf.ndim - 1))

            def ch_sum(v):
                return jnp.sum(v, axis=red)

        if train:
            cnt = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
            mean = ch_sum(xf * m) / cnt
            mean_b = jnp.tile(mean, ts) if folded else mean
            var = ch_sum(jnp.square(xf - mean_b) * m) / cnt
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        mean_b = jnp.tile(mean, ts) if folded else mean
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        inv_b = jnp.tile(inv, ts) if folded else inv
        bias_b = jnp.tile(bias, ts) if folded else bias
        y = ((xf - mean_b) * inv_b + bias_b) * m
        return y.astype(self.dtype)


class ConvBN(nn.Module):
    """Conv (any spatial rank) + optional BN + optional activation.

    The flax analogue of mmcv ConvModule with conv_cfg Conv2d/Conv3d.
    ``padding`` is symmetric explicit padding (torch semantics).
    """
    features: int
    kernel_size: Tuple[int, ...] = (3, 3)
    strides: Tuple[int, ...] | int = 1
    padding: Tuple[int, ...] | int | None = None  # default: k//2
    dilation: Tuple[int, ...] | int = 1
    use_bias: bool = False
    norm: bool = True
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        rank = len(self.kernel_size)
        strides = ((self.strides,) * rank if isinstance(self.strides, int)
                   else tuple(self.strides))
        dil = ((self.dilation,) * rank if isinstance(self.dilation, int)
               else tuple(self.dilation))
        if self.padding is None:
            pad = tuple(d * (k // 2) for k, d in zip(self.kernel_size, dil))
        elif isinstance(self.padding, int):
            pad = (self.padding,) * rank
        else:
            pad = tuple(self.padding)
        x = nn.Conv(self.features, self.kernel_size, strides=strides,
                    padding=tuple((p, p) for p in pad),
                    kernel_dilation=dil, use_bias=self.use_bias,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.norm:
            x = BatchNorm(dtype=self.dtype)(x, train=train)
        if self.act is not None:
            x = self.act(x)
        return x


class BasicBlock2D(nn.Module):
    """mmdet ResNet BasicBlock: two 3x3 convs with BN, residual, ReLU.

    Used by DepthSegNet's depth branch and ``further_fuse``
    (fusion_view_transformer.py:48-50,180).
    """
    features: int
    strides: int = 1
    downsample: bool = False  # 1x1 conv on the identity path
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBN(self.features, (3, 3), self.strides, dtype=self.dtype,
                   act=nn.relu)(x, train=train)
        y = ConvBN(self.features, (3, 3), 1, dtype=self.dtype,
                   act=None)(y, train=train)
        if self.downsample or x.shape[-1] != self.features or self.strides != 1:
            identity = ConvBN(self.features, (1, 1), self.strides,
                              dtype=self.dtype, act=None)(x, train=train)
        return nn.relu(y + identity)


class BasicBlock3D(nn.Module):
    """3D residual block (reference: backbones/resnet3d.py:8-43).

    conv1 = Conv3d+BN+ReLU, conv2 = Conv3d+BN, optional downsample conv on the
    identity (Conv3d 3x3x3 stride s + BN), then add + ReLU.
    """
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.downsample:
            identity = ConvBN(self.features, (3, 3, 3), self.strides,
                              dtype=self.dtype, act=None)(x, train=train)
        else:
            identity = x
        y = ConvBN(self.features, (3, 3, 3), self.strides, dtype=self.dtype,
                   act=nn.relu)(x, train=train)
        y = ConvBN(self.features, (3, 3, 3), 1, dtype=self.dtype,
                   act=None)(y, train=train)
        return nn.relu(y + identity)


class SELayer(nn.Module):
    """Camera-aware squeeze-excite (view_transformer.py:475-488).

    forward(x, x_se) = x * sigmoid(conv1x1(relu(conv1x1(x_se)))).
    """
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_se):
        g = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32)(x_se)
        g = nn.relu(g)
        g = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32)(g)
        return x * nn.sigmoid(g)


class Mlp(nn.Module):
    """Linear-ReLU-Linear (view_transformer.py:449-472)."""
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (view_transformer.py:375-446).

    Four atrous conv branches (dilations 1,6,12,18) + global-average branch,
    concat, 1x1 conv + BN + ReLU, dropout(0.5).
    """
    mid_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = ConvBN(self.mid_channels, (1, 1), dtype=self.dtype)(x, train=train)
        b2 = ConvBN(self.mid_channels, (3, 3), dilation=6,
                    dtype=self.dtype)(x, train=train)
        b3 = ConvBN(self.mid_channels, (3, 3), dilation=12,
                    dtype=self.dtype)(x, train=train)
        b4 = ConvBN(self.mid_channels, (3, 3), dilation=18,
                    dtype=self.dtype)(x, train=train)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBN(self.mid_channels, (1, 1), dtype=self.dtype)(g, train=train)
        g = jnp.broadcast_to(g, b4.shape[:-1] + (self.mid_channels,))
        y = jnp.concatenate([b1, b2, b3, b4, g], axis=-1)
        y = ConvBN(self.out_channels, (1, 1), dtype=self.dtype)(y, train=train)
        if train:
            y = nn.Dropout(0.5, deterministic=False)(y)
        return y


def drop_path(x, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth on the leading (batch) axis."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)
