"""Golden cross-validation of the Swin backbone against a torch module with
the reference's mmcv structure and key naming (backbones/swin.py:688-985):
patch_embed.projection/norm, stages.{i}.blocks.{j}.{norm1,attn.w_msa.*,
norm2,ffn.layers.0.0,ffn.layers.1}, stages.{i}.downsample.{norm,reduction}
(nn.Unfold channel order), out norm{i} — weights flow through the import
rule table and outputs must match.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from fusionocc_tpu.config import SwinConfig, tiny_model_config
from fusionocc_tpu.nn.swin import SwinTransformer
from fusionocc_tpu.train import torch_import as ti


def _rel_index(w):
    coords = torch.stack(torch.meshgrid(torch.arange(w), torch.arange(w),
                                        indexing='ij'))
    flat = coords.flatten(1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


class TWindowMSA(nn.Module):
    def __init__(self, dim, heads, w):
        super().__init__()
        self.dim, self.heads, self.w = dim, heads, w
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * w - 1) ** 2, heads))
        self.register_buffer('relative_position_index', _rel_index(w))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = self.qkv(x).reshape(B_, N, 3, self.heads,
                                  C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, -1)
        attn = attn + bias.permute(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.heads, N, N) + \
                mask[None, :, None]
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class TShiftMSA(nn.Module):
    def __init__(self, dim, heads, w, shift):
        super().__init__()
        self.w, self.shift = w, shift
        self.w_msa = TWindowMSA(dim, heads, w)

    def forward(self, x, hw):
        H, W = hw
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        w = self.w
        pad_b, pad_r = (w - H % w) % w, (w - W % w) % w
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        Hp, Wp = H + pad_b, W + pad_r
        mask = None
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            img_mask = torch.zeros((1, Hp, Wp, 1))
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -self.shift),
                       slice(-self.shift, None)):
                for ws in (slice(0, -w), slice(-w, -self.shift),
                           slice(-self.shift, None)):
                    img_mask[:, hs, ws, :] = cnt
                    cnt += 1
            mw = img_mask.view(1, Hp // w, w, Wp // w, w, 1).permute(
                0, 1, 3, 2, 4, 5).reshape(-1, w * w)
            mask = (mw[:, None] - mw[:, :, None])
            mask = mask.masked_fill(mask != 0, -100.0)
        xw = x.view(B, Hp // w, w, Wp // w, w, C).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)
        xw = self.w_msa(xw, mask)
        x = xw.view(B, Hp // w, Wp // w, w, w, C).permute(
            0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        return x[:, :H, :W].reshape(B, L, C)


class TFFN(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = nn.ModuleList([
            nn.Sequential(nn.Linear(dim, hidden), nn.GELU()),
            nn.Linear(hidden, dim)])

    def forward(self, x):
        return self.layers[1](self.layers[0](x))


class TBlock(nn.Module):
    def __init__(self, dim, heads, w, shift, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TShiftMSA(dim, heads, w, w // 2 if shift else 0)
        self.norm2 = nn.LayerNorm(dim)
        self.ffn = TFFN(dim, dim * mlp_ratio)

    def forward(self, x, hw):
        x = x + self.attn(self.norm1(x), hw)
        return x + self.ffn(self.norm2(x))


class TPatchMerging(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.sampler = nn.Unfold(kernel_size=2, stride=2)
        self.norm = nn.LayerNorm(4 * cin)
        self.reduction = nn.Linear(4 * cin, cout, bias=False)

    def forward(self, x, hw):
        H, W = hw
        B, L, C = x.shape
        x = x.view(B, H, W, C).permute(0, 3, 1, 2)
        x = self.sampler(x).transpose(1, 2)     # (B, L/4, 4C), c*4+p order
        return self.reduction(self.norm(x)), (H // 2, W // 2)


class TSwin(nn.Module):
    """mmcv-named tiny Swin: depths (2, 1), out_indices (1,)."""

    def __init__(self, embed=16, heads=(2, 4), w=4, mlp_ratio=2):
        super().__init__()
        class PE(nn.Module):
            def __init__(self):
                super().__init__()
                self.projection = nn.Conv2d(3, embed, 4, 4)
                self.norm = nn.LayerNorm(embed)
        self.patch_embed = PE()

        class Stage(nn.Module):
            def __init__(self, dim, depth, heads, downsample):
                super().__init__()
                self.blocks = nn.ModuleList(
                    [TBlock(dim, heads, w, j % 2 == 1, mlp_ratio)
                     for j in range(depth)])
                self.downsample = downsample
        self.stages = nn.ModuleList([
            Stage(embed, 2, heads[0], TPatchMerging(embed, embed * 2)),
            Stage(embed * 2, 1, heads[1], None)])
        self.norm1 = nn.LayerNorm(embed * 2)

    def forward(self, x):
        x = self.patch_embed.projection(x)
        H, W = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        hw = (H, W)
        outs = []
        for i, st in enumerate(self.stages):
            for blk in st.blocks:
                x = blk(x, hw)
            out = x
            if i == 1:
                out = self.norm1(out)
                B = out.shape[0]
                outs.append(out.view(B, *hw, -1).permute(0, 3, 1, 2))
            if st.downsample is not None:
                x, hw = st.downsample(x, hw)
        return outs


def test_swin_matches_torch_golden():
    torch.manual_seed(0)
    tmod = TSwin()
    with torch.no_grad():
        for p in tmod.parameters():
            p.copy_(torch.randn(p.shape) * 0.1)
    tmod.eval()
    sd = {f'img_backbone.{k}': v.numpy() for k, v in tmod.state_dict().items()}

    scfg = SwinConfig(embed_dims=16, depths=(2, 1), num_heads=(2, 4),
                      window_size=4, mlp_ratio=2, out_indices=(1,),
                      drop_path_rate=0.0, return_stereo_feat=False,
                      with_cp=False)
    cfg = dataclasses.replace(tiny_model_config(), swin=scfg)
    fmod = SwinTransformer(scfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    # 24x40 input -> 6x10 tokens: exercises window padding AND the shifted
    # block in stage 0
    x = rng.randn(2, 24, 40, 3).astype(np.float32)
    variables = fmod.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(x),
                          deterministic=True)

    rules = ti.build_rules(cfg)
    prefix = 'img_backbone/'
    out_p = {}
    for path, leaf in ti._flatten(variables['params']).items():
        tkey, conv = rules['params'][prefix + path]
        val = conv(sd[tkey]).astype(np.float32)
        assert val.shape == tuple(leaf.shape), (path, val.shape, leaf.shape)
        out_p[path] = jnp.asarray(val)
    params = ti._unflatten(out_p)

    outs = fmod.apply({'params': params}, jnp.asarray(x), deterministic=True)
    with torch.no_grad():
        touts = tmod(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(outs) == len(touts) == 1
    got = np.asarray(outs[0])
    ref = touts[0].permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_fpn_lss_matches_torch_golden():
    """FPN_LSS vs torch Sequential(conv,bn,relu,conv,bn,relu) naming
    (necks/lss_fpn.py:53-72: keys conv.0/conv.1/conv.3/conv.4)."""
    from fusionocc_tpu.models.fpn import FPN_LSS

    class TFPN(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = nn.Sequential(
                nn.Conv2d(cin, cout, 3, 1, 1, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
                nn.Conv2d(cout, cout, 3, 1, 1, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

        def forward(self, feats):
            x2, x1 = feats
            x1 = F.interpolate(x1, scale_factor=2, mode='bilinear',
                               align_corners=True)
            return self.conv(torch.cat([x2, x1], dim=1))

    torch.manual_seed(1)
    tmod = TFPN(8 + 16, 12)
    with torch.no_grad():
        for p in tmod.parameters():
            p.copy_(torch.randn(p.shape) * 0.1)
        for b in tmod.buffers():
            if b.dtype.is_floating_point and b.ndim:
                b.copy_(torch.rand(b.shape) * 0.5 + 0.75)
    tmod.eval()
    sd = {f'img_neck.{k}': v.numpy() for k, v in tmod.state_dict().items()}

    fmod = FPN_LSS(12, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x2 = rng.randn(2, 8, 10, 8).astype(np.float32)
    x1 = rng.randn(2, 4, 5, 16).astype(np.float32)
    variables = fmod.init({'params': jax.random.PRNGKey(0)},
                          [jnp.asarray(x2), jnp.asarray(x1)], train=False)
    rules = {'params': {}, 'batch_stats': {}}
    ti._convbn(rules, 'img_neck/ConvBN_0', 'img_neck.conv.0',
               'img_neck.conv.1', 2)
    ti._convbn(rules, 'img_neck/ConvBN_1', 'img_neck.conv.3',
               'img_neck.conv.4', 2)

    def import_sub(tree, kind):
        out = {}
        for path, leaf in ti._flatten(tree).items():
            tkey, conv = rules[kind]['img_neck/' + path]
            val = conv(sd[tkey]).astype(np.float32)
            assert val.shape == tuple(leaf.shape), (path, val.shape)
            out[path] = jnp.asarray(val)
        return ti._unflatten(out)

    params = import_sub(variables['params'], 'params')
    stats = import_sub(variables['batch_stats'], 'batch_stats')
    got = fmod.apply({'params': params, 'batch_stats': stats},
                     [jnp.asarray(x2), jnp.asarray(x1)], train=False)
    with torch.no_grad():
        ref = tmod([torch.from_numpy(x2).permute(0, 3, 1, 2),
                    torch.from_numpy(x1).permute(0, 3, 1, 2)])
    np.testing.assert_allclose(np.asarray(got),
                               ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-4)
