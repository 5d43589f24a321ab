"""Fused Pallas window attention vs the plain-XLA reference path.

The kernel (ops/pallas/window_attn.py) must reproduce the unfused
einsum+softmax formulation — including the cyclic-shift mask it rebuilds
in-kernel from iotas — and its custom VJP must match autodiff of the
reference.  Runs in interpret mode on CPU (conftest forces the cpu
platform), i.e. the identical kernel code path the TPU executes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionocc_tpu.ops.pallas.window_attn import (
    _full_masks, _reference_probs, fused_window_attention)


def _reference_out(q, k, v, bias, nWh, nWw, w, shift, heads):
    bn, n, c = q.shape
    d = c // heads
    p = _reference_probs(q, k, v, bias, nWh, nWw, w, shift, heads)
    vh = v.astype(jnp.float32).reshape(bn, n, heads, d)
    out = jnp.einsum('bhnm,bmhd->bnhd', p, vh)
    return out.reshape(bn, n, c).astype(q.dtype)


def _rand(key, b, nWh, nWw, w, c):
    n = w * w
    bn = b * nWh * nWw
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (bn, n, c), jnp.float32)
    k = jax.random.normal(ks[1], (bn, n, c), jnp.float32)
    v = jax.random.normal(ks[2], (bn, n, c), jnp.float32)
    return q, k, v


@pytest.mark.parametrize('shift,nWh,nWw,b', [
    (0, 3, 2, 2),   # no mask
    (2, 3, 2, 2),   # shifted: masked last row/col windows
    (2, 1, 1, 3),   # degenerate single-window grid (Hp == w)
    (1, 2, 4, 1),   # asymmetric shift
])
def test_fused_matches_reference(shift, nWh, nWw, b):
    w, heads, c = 4, 2, 16
    n = w * w
    q, k, v = _rand(jax.random.PRNGKey(0), b, nWh, nWw, w, c)
    bias = jax.random.normal(jax.random.PRNGKey(5), (heads, n, n),
                             jnp.float32)
    got = fused_window_attention(q, k, v, bias, nWh, nWw, w, shift, heads)
    want = _reference_out(q, k, v, bias, nWh, nWw, w, shift, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('heads', [4, 8, 16, 32])
def test_fused_matches_reference_many_heads(heads):
    """The head-blocked grid (4-head groups per Pallas step) must match the
    reference at the late Swin stages' head counts (16/32), which the
    full-model config now fuses (fused_attn_max_heads=32)."""
    w, c, shift, nWh, nWw, b = 4, 4 * heads, 2, 2, 3, 1
    n = w * w
    q, k, v = _rand(jax.random.PRNGKey(heads), b, nWh, nWw, w, c)
    bias = jax.random.normal(jax.random.PRNGKey(6), (heads, n, n),
                             jnp.float32)
    got = fused_window_attention(q, k, v, bias, nWh, nWw, w, shift, heads)
    want = _reference_out(q, k, v, bias, nWh, nWw, w, shift, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_inkernel_mask_matches_mmcv_construction():
    """The iota-built masks equal the mmcv img_mask/window_partition ones."""
    from fusionocc_tpu.nn.swin import window_partition
    w, shift = 4, 2
    for nWh, nWw in [(3, 2), (1, 1), (2, 5)]:
        Hp, Wp = nWh * w, nWw * w
        img_mask = np.zeros((Hp, Wp), np.int32)
        cnt = 0
        for hs in (slice(0, Hp - w), slice(Hp - w, Hp - shift),
                   slice(Hp - shift, Hp)):
            for ws in (slice(0, Wp - w), slice(Wp - w, Wp - shift),
                       slice(Wp - shift, Wp)):
                img_mask[hs, ws] = cnt
                cnt += 1
        m = window_partition(jnp.asarray(img_mask)[None, :, :, None],
                             w)[..., 0]
        want = np.where(np.asarray(m)[:, None, :] == np.asarray(m)[:, :, None],
                        0.0, -100.0)
        got = _full_masks(nWh, nWw, w, shift)
        np.testing.assert_array_equal(got, want)


def test_fused_gradients_match_reference():
    w, heads, c, shift, nWh, nWw, b = 4, 2, 16, 2, 2, 3, 1
    n = w * w
    q, k, v = _rand(jax.random.PRNGKey(1), b, nWh, nWw, w, c)
    bias = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (heads, n, n),
                                   jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)

    def loss_fused(q, k, v, bias):
        out = fused_window_attention(q, k, v, bias, nWh, nWw, w, shift, heads)
        return jnp.sum(out * g)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_reference_out(q, k, v, bias, nWh, nWw, w, shift,
                                      heads) * g)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_swin_fused_flag_end_to_end():
    """Same params, fused on/off -> same backbone outputs (incl. padding +
    shifted blocks, where fused rebuilds the mask in-kernel)."""
    import dataclasses

    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.nn.swin import SwinTransformer

    cfg = tiny_model_config().swin
    cfg_f = dataclasses.replace(cfg, fused_attn=True, with_cp=False)
    cfg_u = dataclasses.replace(cfg, fused_attn=False, with_cp=False)
    # 18x10 feature grid after patch embed: pads to 20x12 with window 4
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 72, 40, 3), jnp.float32)
    m_f, m_u = SwinTransformer(cfg_f), SwinTransformer(cfg_u)
    vs = m_f.init(jax.random.PRNGKey(0), x)
    outs_f = m_f.apply(vs, x)
    outs_u = m_u.apply(vs, x)
    assert len(outs_f) == len(outs_u)
    for a, b in zip(outs_f, outs_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_fused_head_blocked_grid():
    """Swin-B-shaped heads (head_dim 32, 8 heads -> 4-head groups, 2 grid
    steps along the head axis) must match the reference bit-for-bit with
    the single-group path."""
    import jax
    w, heads, c = 4, 8, 256           # head_dim 32 -> hb 4 -> 2 head groups
    nWh, nWw, b, shift = 2, 2, 1, 2
    n = w * w
    bn = b * nWh * nWw
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (bn, n, c),
                                 jnp.float32) for i in range(3))
    bias = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (heads, n, n),
                                   jnp.float32)
    from fusionocc_tpu.ops.pallas.window_attn import _head_block
    assert _head_block(heads, c // heads) == 4
    got = fused_window_attention(q, k, v, bias, nWh, nWw, w, shift, heads)
    want = _reference_out(q, k, v, bias, nWh, nWw, w, shift, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
