"""Swin Transformer backbone (flax, NHWC).

Structure mirrors the reference's mmcv-style Swin
(projects/FusionOcc/fusionocc/backbones/swin.py:688-985): patch embed (conv
4x4) + LN, four stages of shifted-window attention blocks, mmcv-style unfold
PatchMerging between stages, per-out-index LayerNorms, and the
``return_stereo_feat`` hook that also emits stage 0's pre-merge feature
(swin.py:954-960).

Parameter layout notes (for the torch checkpoint importer):
  - relative_position_bias_table: ((2w-1)^2, num_heads), identical to torch.
  - PatchMerging concat order follows nn.Unfold: merged channel index is
    c * 4 + p with kernel position p = ky*2 + kx (swin.py:181-250); the
    importer can copy `reduction`/`norm` weights untransposed.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import SwinConfig
from ..quant import int8_dot_general

Dtype = Any


def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww, wh*ww) index into the (2wh-1)*(2ww-1) bias table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing='ij'))        # (2, wh, ww)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]            # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nWh*nWw, w*w, C); H, W divisible by w."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, w * w, C)


def window_reverse(wins: jnp.ndarray, w: int, B: int, H: int, W: int
                   ) -> jnp.ndarray:
    C = wins.shape[-1]
    x = wins.reshape(B, H // w, W // w, w, w, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, C)


class WindowMSA(nn.Module):
    """Multi-head attention within windows with relative position bias.

    When ``fused`` is set (and window geometry is given), the whole
    scores→softmax→PV chain runs as one Pallas kernel with the (N, N)
    attention matrices VMEM-resident (ops/pallas/window_attn.py); the
    cyclic-shift mask is rebuilt inside the kernel, so ``mask`` is ignored.
    """
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    fused: bool = False
    # (nWh, nWw, shift) static window-grid geometry for the fused kernel
    win_geom: Optional[Tuple[int, int, int]] = None
    int8: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nW_total, N, C); mask: (nW, N, N) additive or None
        dg = int8_dot_general if self.int8 else None
        Bn, N, C = x.shape
        w = self.window_size
        head_dim = C // self.num_heads
        scale = head_dim ** -0.5

        table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(0.02),
            ((2 * w - 1) * (2 * w - 1), self.num_heads), jnp.float32)
        rpi = jnp.asarray(_relative_position_index(w, w).reshape(-1))
        bias = table[rpi].reshape(N, N, self.num_heads)
        bias = jnp.transpose(bias, (2, 0, 1)).astype(jnp.float32)

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, dot_general=dg,
                       name='qkv')(x)
        if self.fused and self.win_geom is not None:
            # the kernel rebuilds the cyclic-shift mask internally from
            # win_geom; a caller-supplied mask would be silently wrong
            assert mask is None, 'fused window attention ignores mask'
            from ..ops.pallas.window_attn import fused_window_attention
            nWh, nWw, shift = self.win_geom
            q, k, v = (qkv[..., i * C:(i + 1) * C] for i in range(3))
            out = fused_window_attention(q, k, v, bias, nWh, nWw, w,
                                         shift, self.num_heads)
            return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                            dot_general=dg, name='proj')(out)
        qkv = qkv.reshape(Bn, N, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i] for i in range(3))
        # scores accumulate fp32 on the MXU but are STORED in the compute
        # dtype: the (nW, h, N, N) logit/prob buffers are the largest
        # activations in the camera branch, and halving their HBM traffic
        # matters more than the last bf16 mantissa bits (softmax still
        # max-subtracts in fp32 inside the fused reduction)
        attn = jnp.einsum('bnhd,bmhd->bhnm', q * scale, k,
                          preferred_element_type=jnp.float32
                          ).astype(self.dtype)
        attn = attn + bias[None].astype(self.dtype)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, self.num_heads, N, N)
            attn = attn + mask[None, :, None].astype(self.dtype)
            attn = attn.reshape(Bn, self.num_heads, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
        out = jnp.einsum('bhnm,bmhd->bnhd', attn, v)
        out = out.reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                        dot_general=dg, name='proj')(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: bool
    mlp_ratio: int
    qkv_bias: bool
    drop_path_rate: float
    dtype: Dtype = jnp.float32
    fused_attn: bool = False
    int8: bool = False

    @nn.compact
    def __call__(self, x, hw_shape, deterministic: bool = True):
        H, W = hw_shape
        B, L, C = x.shape
        w = self.window_size
        shift = w // 2 if self.shift else 0

        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                         name='norm1')(x.astype(jnp.float32)).astype(self.dtype)
        y = y.reshape(B, H, W, C)
        pad_b = (w - H % w) % w
        pad_r = (w - W % w) % w
        Hp, Wp = H + pad_b, W + pad_r
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        attn_mask = None
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        if shift > 0 and not self.fused_attn:
            img_mask = np.zeros((Hp, Wp), np.int32)
            cnt = 0
            for hs in (slice(0, Hp - w), slice(Hp - w, Hp - shift),
                       slice(Hp - shift, Hp)):
                for ws in (slice(0, Wp - w), slice(Wp - w, Wp - shift),
                           slice(Wp - shift, Wp)):
                    img_mask[hs, ws] = cnt
                    cnt += 1
            m = window_partition(
                jnp.asarray(img_mask)[None, :, :, None], w)[..., 0]
            attn_mask = jnp.where(m[:, None, :] == m[:, :, None], 0.0, -100.0)

        wins = window_partition(y, w)
        wins = WindowMSA(C, self.num_heads, w, self.qkv_bias,
                         dtype=self.dtype, fused=self.fused_attn,
                         win_geom=(Hp // w, Wp // w, shift),
                         int8=self.int8, name='attn')(wins, attn_mask)
        y = window_reverse(wins, w, B, Hp, Wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :H, :W].reshape(B, L, C)

        if self.drop_path_rate > 0 and not deterministic:
            from .layers import drop_path
            y = drop_path(y, self.drop_path_rate, deterministic,
                          self.make_rng('dropout'))
        x = shortcut + y

        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                         name='norm2')(x.astype(jnp.float32)).astype(self.dtype)
        dg = int8_dot_general if self.int8 else None
        y = nn.Dense(self.mlp_ratio * C, dtype=self.dtype,
                     param_dtype=jnp.float32, dot_general=dg,
                     name='ffn_fc1')(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     dot_general=dg, name='ffn_fc2')(y)
        if self.drop_path_rate > 0 and not deterministic:
            from .layers import drop_path
            y = drop_path(y, self.drop_path_rate, deterministic,
                          self.make_rng('dropout'))
        return shortcut + y


class PatchMerging(nn.Module):
    """mmcv unfold-style 2x2 merge: LN(4C) then Linear(4C -> out, no bias)."""
    out_channels: int
    dtype: Dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x, hw_shape):
        H, W = hw_shape
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        pad_b, pad_r = H % 2, W % 2
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        # unfold channel order: merged[c*4 + p], p = ky*2 + kx
        parts = jnp.stack([x[:, 0::2, 0::2], x[:, 0::2, 1::2],
                           x[:, 1::2, 0::2], x[:, 1::2, 1::2]], axis=-1)
        Ho, Wo = parts.shape[1], parts.shape[2]
        merged = parts.reshape(B, Ho * Wo, C * 4)
        merged = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                              name='norm')(
            merged.astype(jnp.float32)).astype(self.dtype)
        merged = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32,
                          dot_general=(int8_dot_general if self.int8
                                       else None),
                          name='reduction')(merged)
        return merged, (Ho, Wo)


class SwinTransformer(nn.Module):
    """Returns [stereo_feat?] + [normed out_indices features], NHWC."""
    cfg: SwinConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        B, H, W, _ = x.shape
        p = cfg.patch_size
        x = nn.Conv(cfg.embed_dims, (p, p), strides=(p, p), padding='VALID',
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name='patch_embed')(x)
        Hf, Wf = x.shape[1], x.shape[2]
        x = x.reshape(B, Hf * Wf, cfg.embed_dims)
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                         name='patch_norm')(
            x.astype(jnp.float32)).astype(self.dtype)

        total_depth = sum(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, total_depth)
        outs = []
        hw = (Hf, Wf)
        block_id = 0
        num_stages = len(cfg.depths)
        dims = cfg.num_features
        block_cls = (nn.remat(SwinBlock, static_argnums=(2, 3))
                     if cfg.with_cp else SwinBlock)
        for i in range(num_stages):
            blocks_out = x
            for j in range(cfg.depths[i]):
                blocks_out = block_cls(
                    dims[i], cfg.num_heads[i], cfg.window_size,
                    shift=(j % 2 == 1), mlp_ratio=cfg.mlp_ratio,
                    qkv_bias=cfg.qkv_bias,
                    drop_path_rate=float(dpr[block_id]),
                    dtype=self.dtype,
                    fused_attn=(cfg.fused_attn and cfg.num_heads[i]
                                <= cfg.fused_attn_max_heads),
                    int8=cfg.int8_dense,
                    name=f'stage{i}_block{j}')(
                        blocks_out, hw, deterministic)
                block_id += 1
            out = blocks_out
            if i == 0 and cfg.return_stereo_feat:
                outs.append(out.reshape(B, hw[0], hw[1], dims[i]))
            if i in cfg.out_indices:
                y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                                 name=f'out_norm{i}')(
                    out.astype(jnp.float32)).astype(self.dtype)
                outs.append(y.reshape(B, hw[0], hw[1], dims[i]))
            if i < num_stages - 1:
                x, hw = PatchMerging(dims[i + 1], dtype=self.dtype,
                                     int8=cfg.int8_dense,
                                     name=f'downsample{i}')(blocks_out, hw)
        return outs
