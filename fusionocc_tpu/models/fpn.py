"""FPN necks: 2D FPN_LSS for the image branch and 3D LSSFPN3D for the BEV
encoder (reference: fusionocc/necks/lss_fpn.py:10-156). NHWC / (B,Z,Y,X,C).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import ConvBN
from ..ops.grid_sample import resize_bilinear, resize_trilinear

Dtype = Any


class FPN_LSS(nn.Module):
    """Two-level FPN: upsample the deep feature x2, concat, two 3x3 convs.

    Config (configs/fusion_occ.py:92-99): in 512+1024, out 256,
    extra_upsample=None, scale_factor=2.
    """
    out_channels: int
    scale_factor: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x2, x1 = feats[0], feats[1]
        B, H, W, _ = x2.shape
        x1 = jnp.transpose(
            resize_bilinear(jnp.transpose(x1, (0, 3, 1, 2)),
                            (H, W), align_corners=True),
            (0, 2, 3, 1)).astype(self.dtype)
        x = jnp.concatenate([x2, x1], axis=-1)
        x = ConvBN(self.out_channels, (3, 3), dtype=self.dtype)(x, train=train)
        x = ConvBN(self.out_channels, (3, 3), dtype=self.dtype)(x, train=train)
        return x


class LSSFPN3D(nn.Module):
    """3-scale 3D FPN: trilinear-upsample x2/x4, concat, 1x1x1 Conv3d+BN+ReLU.

    Reference: necks/lss_fpn.py:114-156.
    """
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x8, x16, x32 = feats

        def up(x, s):
            y = jnp.transpose(x, (0, 4, 1, 2, 3))
            y = resize_trilinear(y, s)
            return jnp.transpose(y, (0, 2, 3, 4, 1)).astype(self.dtype)

        x = jnp.concatenate([x8, up(x16, 2), up(x32, 4)], axis=-1)
        return ConvBN(self.out_channels, (1, 1, 1),
                      dtype=self.dtype)(x, train=train)


class CustomResNet3D(nn.Module):
    """Stack of BasicBlock3D layers (reference: backbones/resnet3d.py:46-113).

    Every layer's first block carries a 3x3x3-conv downsample on the identity
    path (even at stride 1, mirroring the reference for checkpoint parity).
    Returns the per-layer outputs listed in ``out_ids``.
    """
    num_channels: Sequence[int]
    num_layer: Sequence[int]
    strides: Sequence[int]
    out_ids: Sequence[int] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..nn.layers import BasicBlock3D
        out_ids = self.out_ids or tuple(range(len(self.num_layer)))
        feats = []
        for i, (c, n, s) in enumerate(
                zip(self.num_channels, self.num_layer, self.strides)):
            x = BasicBlock3D(c, strides=s, downsample=True,
                             dtype=self.dtype)(x, train=train)
            for _ in range(n - 1):
                x = BasicBlock3D(c, dtype=self.dtype)(x, train=train)
            if i in out_ids:
                feats.append(x)
        return feats
