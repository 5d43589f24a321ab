"""Swin backbone: output shapes/stride structure, window attention numerics
vs a direct numpy softmax-attention reference, shifted-window masking."""
import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.config import SwinConfig
from fusionocc_tpu.nn.swin import (SwinTransformer, WindowMSA,
                                   _relative_position_index,
                                   window_partition, window_reverse)


def test_window_partition_round_trip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 5), jnp.float32)
    w = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 16, 5)
    back = window_reverse(w, 4, 2, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_symmetry():
    idx = _relative_position_index(3, 3)
    assert idx.shape == (9, 9)
    assert idx.max() == 24 and idx.min() == 0  # (2*3-1)^2 - 1
    # relative displacement of (i, j) is negative of (j, i): indices must
    # be mirrored through the table center
    assert idx[0, 8] + idx[8, 0] == 24


def test_window_attention_matches_numpy():
    rng = np.random.RandomState(0)
    dim, heads, w = 8, 2, 3
    msa = WindowMSA(dim, heads, w, qkv_bias=True, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(4, w * w, dim), jnp.float32)
    variables = msa.init(jax.random.PRNGKey(0), x)
    out = msa.apply(variables, x)

    p = variables['params']
    qkv_w = np.asarray(p['qkv']['kernel'])
    qkv_b = np.asarray(p['qkv']['bias'])
    proj_w = np.asarray(p['proj']['kernel'])
    proj_b = np.asarray(p['proj']['bias'])
    table = np.asarray(p['relative_position_bias_table'])
    rpi = _relative_position_index(w, w)

    xn = np.asarray(x)
    qkv = xn @ qkv_w + qkv_b                     # (4, 9, 3*dim)
    hd = dim // heads
    qkv = qkv.reshape(4, 9, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = np.einsum('bnhd,bmhd->bhnm', q * hd ** -0.5, k)
    bias = table[rpi.reshape(-1)].reshape(9, 9, heads).transpose(2, 0, 1)
    attn = attn + bias[None]
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    ref = np.einsum('bhnm,bmhd->bnhd', attn, v).reshape(4, 9, dim)
    ref = ref @ proj_w + proj_b
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_backbone_output_shapes():
    cfg = SwinConfig(embed_dims=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                     window_size=4, out_indices=(2, 3),
                     return_stereo_feat=True, with_cp=False,
                     drop_path_rate=0.0)
    swin = SwinTransformer(cfg, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 96, 3))
    v = jax.jit(lambda x: swin.init(jax.random.PRNGKey(0), x,
                                    deterministic=True))(x)
    outs = jax.jit(lambda v, x: swin.apply(v, x, deterministic=True))(v, x)
    # stereo feat (stage0, /4) + norm2 (/16) + norm3 (/32)
    assert len(outs) == 3
    assert outs[0].shape == (2, 16, 24, 16)
    assert outs[1].shape == (2, 4, 6, 64)
    assert outs[2].shape == (2, 2, 3, 128)


def test_shifted_block_changes_cross_window_flow():
    """With shift, tokens in different windows of the unshifted grid mix."""
    from fusionocc_tpu.nn.swin import SwinBlock
    cfg_dim, heads, w = 8, 2, 4
    x = jnp.zeros((1, 8 * 8, cfg_dim))
    blk_s = SwinBlock(cfg_dim, heads, w, shift=True, mlp_ratio=2,
                      qkv_bias=True, drop_path_rate=0.0, dtype=jnp.float32)
    v = blk_s.init(jax.random.PRNGKey(0), x, (8, 8), True)
    # impulse at (0,0); with shift its window includes tokens from the
    # opposite side only via masking — assert output is finite & shaped
    x2 = x.at[0, 0, :].set(1.0)
    out = blk_s.apply(v, x2, (8, 8), True)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))
