"""Fused shifted-window attention Pallas TPU kernel.

The Swin camera backbone is the FLOP + HBM heavyweight of FusionOcc's
forward (reference backbone: projects/FusionOcc/fusionocc/backbones/
swin.py:263-351, WindowMSA).  The unfused XLA lowering materialises the
(nWindows*heads, N, N) attention logits AND probabilities in HBM between
the two matmuls — at 512x1408 input that is ~2.6 GB of HBM round trips per
stage-0 block.  This kernel fuses

    scores = (q*scale) @ k^T + rel_pos_bias[h] (+ shift mask)
    p      = softmax_fp32(scores)
    out    = p @ v

into one VMEM-resident pass per window block: the (N, N) score matrix never
touches HBM.  The cyclic-shift mask is reconstructed *inside* the kernel
from broadcasted iotas and the window's (row, col) grid position — it costs
zero HBM traffic (the reference precomputes an img_mask tensor instead,
swin.py:429-448).

Layout: q, k, v, out are (Bn, N, C) with heads packed in C (exactly the
layout the qkv projection produces), so no big pre-transposes are needed.
N = window**2 = 144 for window 12 (sublane-aligned: 144 % 8 == 0); C is a
multiple of 128 for every Swin-B stage, so blocks are lane-aligned.

Policy (measured on v5e, full-size 12-image Swin-B forward via
tools/ab_swin_fused.py with device-resident inputs and a true barrier
fetch): fusing only the high-resolution stages (<= 8 heads;
SwinConfig.fused_attn_max_heads) with one window per grid step runs
252 -> 235 ms (~7%) and cuts program compile time ~2x (84 -> 44 s).
Fusing the late 16/32-head stages is a net loss — few windows, tiny
score tensors, long per-head unrolls.

Backward: custom VJP that recomputes probabilities with plain XLA ops
(flash-style recompute; fp32) — training works, inference gets the full
fused win.  Falls back to interpret mode off-TPU so the CPU test suite
exercises the identical code path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

MASK_VALUE = -100.0  # matches mmcv's masked_fill value (swin.py:447)


def _use_interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _region_ids(pos, last, w: int, shift: int):
    """mmcv img_mask region id along one axis for tokens of one window.

    pos: (..,) token coordinate within the window (iota); last: traced bool,
    whether this window is the final one along the axis.  Windows before the
    last lie entirely in region 0 (rows [0, Hp-w)); the last window spans
    regions 1 ([Hp-w, Hp-shift)) and 2 ([Hp-shift, Hp)).  swin.py:429-443.
    """
    inner = jnp.where(pos < w - shift, 1, 2)
    return jnp.where(last, inner, jnp.zeros_like(inner))


def _shift_mask(widx, nWh: int, nWw: int, w: int, shift: int, n: int):
    """(N, N) additive mask for the window at flat index ``widx``."""
    r = (widx // nWw) % nWh
    c = widx % nWw
    tok = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    py, px = tok // w, tok % w
    rid = (_region_ids(py, r == nWh - 1, w, shift) * 3
           + _region_ids(px, c == nWw - 1, w, shift))  # (N, 1)
    same = rid == rid.reshape(1, n)
    return jnp.where(same, 0.0, MASK_VALUE).astype(jnp.float32)


def _attn_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, heads: int,
                 head_dim: int, scale: float, nWh: int, nWw: int, w: int,
                 shift: int):
    # One window per grid step (block (1, N, C)): small blocks pipeline
    # HBM<->VMEM best on this workload, and the body unrolls only `heads`
    # matmul pairs, keeping Mosaic compile time below the unfused XLA path.
    i = pl.program_id(0)
    n = w * w
    mask = None
    if shift > 0:
        mask = _shift_mask(i, nWh, nWw, w, shift, n)
    q = q_ref[0].astype(jnp.float32)   # (N, C)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    outs = []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl] * scale, k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (N, N)
        s = s + b_ref[h]
        if mask is not None:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.dot(p, v[:, sl],
                            preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _head_block(heads: int, head_dim: int) -> int:
    """Heads per grid step: smallest head count whose C-slice is
    lane-aligned (a multiple of 128).  Falls back to all heads (full-C
    blocks) when no aligned divisor exists — Pallas TPU blocks must be
    (8k, 128m) or the full array dims in the last two axes."""
    for hb in range(1, heads + 1):
        if heads % hb == 0 and (hb * head_dim) % 128 == 0:
            return hb
    return heads


def _forward(q, k, v, bias, nWh, nWw, w, shift, heads):
    bn, n, c = q.shape
    head_dim = c // heads
    scale = head_dim ** -0.5
    # Head-blocked 2-D grid: (window, head-group).  The kernel body unrolls
    # only `hb` matmul pairs regardless of the stage's head count, so Mosaic
    # compile time stays flat for the 16/32-head late stages (Swin-B
    # head_dim is 32 at every stage -> hb = 4).
    hb = _head_block(heads, head_dim)
    kern = functools.partial(
        _attn_kernel, heads=hb, head_dim=head_dim, scale=scale,
        nWh=nWh, nWw=nWw, w=w, shift=shift)
    blk = pl.BlockSpec((1, n, hb * head_dim), lambda i, h: (i, 0, h))
    return pl.pallas_call(
        kern,
        grid=(bn, heads // hb),
        in_specs=[blk, blk, blk,
                  pl.BlockSpec((hb, n, n), lambda i, h: (h, 0, 0))],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((bn, n, c), q.dtype),
        interpret=_use_interpret(),
    )(q, k, v, bias.astype(jnp.float32))


def _full_masks(nWh: int, nWw: int, w: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive masks, numpy (static), for the XLA recompute."""
    n = w * w
    tok = np.arange(n)
    py, px = tok // w, tok % w

    def rid1(pos, last):
        return np.where(last, np.where(pos < w - shift, 1, 2), 0)

    masks = np.zeros((nWh * nWw, n, n), np.float32)
    if shift > 0:
        for r in range(nWh):
            for c in range(nWw):
                rid = rid1(py, r == nWh - 1) * 3 + rid1(px, c == nWw - 1)
                masks[r * nWw + c] = np.where(
                    rid[:, None] == rid[None, :], 0.0, MASK_VALUE)
    return masks


def _reference_probs(q, k, v, bias, nWh, nWw, w, shift, heads):
    """fp32 probabilities via plain XLA — the recompute for the backward."""
    bn, n, c = q.shape
    d = c // heads
    scale = d ** -0.5
    qh = q.astype(jnp.float32).reshape(bn, n, heads, d)
    kh = k.astype(jnp.float32).reshape(bn, n, heads, d)
    s = jnp.einsum('bnhd,bmhd->bhnm', qh * scale, kh)
    s = s + bias.astype(jnp.float32)[None]
    if shift > 0:
        nw = nWh * nWw
        m = jnp.asarray(_full_masks(nWh, nWw, w, shift))
        s = s.reshape(bn // nw, nw, heads, n, n) + m[None, :, None]
        s = s.reshape(bn, heads, n, n)
    return jax.nn.softmax(s, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_window_attention(q, k, v, bias, nWh, nWw, w, shift, heads):
    """softmax((q*scale) @ k^T + bias (+ shift mask)) @ v, fused on TPU.

    q, k, v: (Bn, N, C) with Bn = B*nWh*nWw, N = w*w, heads packed in C.
    bias: (heads, N, N) relative position bias (already gathered).
    Returns (Bn, N, C) in q.dtype.
    """
    return _forward(q, k, v, bias, nWh, nWw, w, shift, heads)


def _fwd(q, k, v, bias, nWh, nWw, w, shift, heads):
    out = _forward(q, k, v, bias, nWh, nWw, w, shift, heads)
    return out, (q, k, v, bias)


def _bwd(nWh, nWw, w, shift, heads, res, g):
    q, k, v, bias = res
    bn, n, c = q.shape
    d = c // heads
    scale = d ** -0.5
    p = _reference_probs(q, k, v, bias, nWh, nWw, w, shift, heads)
    gf = g.astype(jnp.float32).reshape(bn, n, heads, d)
    vh = v.astype(jnp.float32).reshape(bn, n, heads, d)
    qh = q.astype(jnp.float32).reshape(bn, n, heads, d)
    kh = k.astype(jnp.float32).reshape(bn, n, heads, d)
    dv = jnp.einsum('bhnm,bnhd->bmhd', p, gf)
    dp = jnp.einsum('bnhd,bmhd->bhnm', gf, vh)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum('bhnm,bmhd->bnhd', ds, kh) * scale
    dk = jnp.einsum('bhnm,bnhd->bmhd', ds, qh * scale)
    dbias = jnp.sum(ds, axis=0)
    return (dq.reshape(bn, n, c).astype(q.dtype),
            dk.reshape(bn, n, c).astype(k.dtype),
            dv.reshape(bn, n, c).astype(v.dtype),
            dbias.astype(bias.dtype))


fused_window_attention.defvjp(_fwd, _bwd)
