"""Torch -> flax checkpoint importer for reference FusionOCC weights.

Maps the reference's state_dict (projects/FusionOcc/fusionocc/fusion_occ.py
module tree, mmcv-converted Swin keys per backbones/swin.py:32-84, spconv2
weight layouts per mmdet3d/ops/spconv/overwrite_spconv/write_spconv2.py)
onto this framework's parameter / batch_stats trees, for parity testing.

The mapping is generated from the ModelConfig so it adapts to scaled-down
test configs. `import_state_dict` reports unmapped keys both ways.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import numpy as np

from ..config import ModelConfig

# converters: torch ndarray -> flax ndarray
def conv2d(w):  # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def conv3d(w):  # (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def linear(w):  # (O, I) -> (I, O)
    return np.transpose(w, (1, 0))


def spconv(w):
    """spconv2 (O, k0, k1, k2, I) -> (27, I, O); 1x1x1 -> (I, O)."""
    if w.ndim == 5:
        O, k0, k1, k2, I = w.shape
        out = np.transpose(w.reshape(O, k0 * k1 * k2, I), (1, 2, 0))
        return out[0] if k0 * k1 * k2 == 1 else out
    return linear(w)


def ident(w):
    return np.asarray(w)


def resize_bias_table(table: np.ndarray, target_len: int) -> np.ndarray:
    """Bicubic-resize a ((2w'-1)^2, nH) relative-position bias table to a new
    window size (official-checkpoint adaptation, swin.py:900-950)."""
    import jax
    L1, nH = table.shape
    s1 = int(round(L1 ** 0.5))
    s2 = int(round(target_len ** 0.5))
    if s1 == s2:
        return table
    t = table.reshape(s1, s1, nH)
    out = jax.image.resize(t, (s2, s2, nH), method='cubic')
    return np.asarray(out).reshape(s2 * s2, nH)


Rule = Tuple[str, Callable]     # (torch key, converter)


def _convbn(rules, fpath: str, tconv: str, tbn: str, conv_nd: int,
            bias: bool = False):
    """ConvBN module: conv kernel + BN params + BN running stats."""
    cv = conv3d if conv_nd == 3 else conv2d
    rules['params'][f'{fpath}/Conv_0/kernel'] = (f'{tconv}.weight', cv)
    if bias:
        rules['params'][f'{fpath}/Conv_0/bias'] = (f'{tconv}.bias', ident)
    bnp = f'{fpath}/BatchNorm_0/BatchNorm_0'
    rules['params'][f'{bnp}/scale'] = (f'{tbn}.weight', ident)
    rules['params'][f'{bnp}/bias'] = (f'{tbn}.bias', ident)
    rules['batch_stats'][f'{bnp}/mean'] = (f'{tbn}.running_mean', ident)
    rules['batch_stats'][f'{bnp}/var'] = (f'{tbn}.running_var', ident)


def _conv(rules, fpath: str, tkey: str, conv_nd: int, bias: bool = True):
    cv = conv3d if conv_nd == 3 else conv2d
    rules['params'][f'{fpath}/kernel'] = (f'{tkey}.weight', cv)
    if bias:
        rules['params'][f'{fpath}/bias'] = (f'{tkey}.bias', ident)


def _dense(rules, fpath: str, tkey: str, bias: bool = True):
    rules['params'][f'{fpath}/kernel'] = (f'{tkey}.weight', linear)
    if bias:
        rules['params'][f'{fpath}/bias'] = (f'{tkey}.bias', ident)


def _ln(rules, fpath: str, tkey: str):
    rules['params'][f'{fpath}/scale'] = (f'{tkey}.weight', ident)
    rules['params'][f'{fpath}/bias'] = (f'{tkey}.bias', ident)


def _basicblock2d(rules, fpath: str, tpath: str, downsample: bool = False):
    """mmdet BasicBlock: conv1/bn1, conv2/bn2 [+ downsample.0/.1]."""
    _convbn(rules, f'{fpath}/ConvBN_0', f'{tpath}.conv1', f'{tpath}.bn1', 2)
    _convbn(rules, f'{fpath}/ConvBN_1', f'{tpath}.conv2', f'{tpath}.bn2', 2)
    if downsample:
        _convbn(rules, f'{fpath}/ConvBN_2', f'{tpath}.downsample.0',
                f'{tpath}.downsample.1', 2)


def _basicblock3d(rules, fpath: str, tpath: str, downsample: bool):
    """reference BasicBlock3D (resnet3d.py:8-43): conv1/conv2 are ConvModules
    (conv+bn), plus a downsample ConvModule on the first block of each layer.
    flax naming: ConvBN_0 = downsample (created first) when present."""
    off = 0
    if downsample:
        _convbn(rules, f'{fpath}/ConvBN_0', f'{tpath}.downsample.conv',
                f'{tpath}.downsample.bn', 3)
        off = 1
    _convbn(rules, f'{fpath}/ConvBN_{off}', f'{tpath}.conv1.conv',
            f'{tpath}.conv1.bn', 3)
    _convbn(rules, f'{fpath}/ConvBN_{off + 1}', f'{tpath}.conv2.conv',
            f'{tpath}.conv2.bn', 3)


def _resnet3d(rules, fpath: str, tpath: str, num_layer):
    k = 0
    for layer, n in enumerate(num_layer):
        for j in range(n):
            _basicblock3d(rules, f'{fpath}/BasicBlock3D_{k}',
                          f'{tpath}.layers.{layer}.{j}', downsample=(j == 0))
            k += 1


def _aspp(rules, fpath: str, tpath: str):
    # branch order: aspp1..aspp4, global pool, fused 1x1 (ConvBN_0..5)
    for i in range(4):
        rules['params'][f'{fpath}/ConvBN_{i}/Conv_0/kernel'] = (
            f'{tpath}.aspp{i + 1}.atrous_conv.weight', conv2d)
        bn = f'{tpath}.aspp{i + 1}.bn'
        p = f'{fpath}/ConvBN_{i}/BatchNorm_0/BatchNorm_0'
        rules['params'][f'{p}/scale'] = (f'{bn}.weight', ident)
        rules['params'][f'{p}/bias'] = (f'{bn}.bias', ident)
        rules['batch_stats'][f'{p}/mean'] = (f'{bn}.running_mean', ident)
        rules['batch_stats'][f'{p}/var'] = (f'{bn}.running_var', ident)
    _convbn(rules, f'{fpath}/ConvBN_4', f'{tpath}.global_avg_pool.1',
            f'{tpath}.global_avg_pool.2', 2)
    _convbn(rules, f'{fpath}/ConvBN_5', f'{tpath}.conv1', f'{tpath}.bn1', 2)


def _mlp(rules, fpath: str, tpath: str):
    _dense(rules, f'{fpath}/Dense_0', f'{tpath}.fc1')
    _dense(rules, f'{fpath}/Dense_1', f'{tpath}.fc2')


def _selayer(rules, fpath: str, tpath: str):
    _conv(rules, f'{fpath}/Conv_0', f'{tpath}.conv_reduce', 2)
    _conv(rules, f'{fpath}/Conv_1', f'{tpath}.conv_expand', 2)


def build_rules(cfg: ModelConfig) -> Dict[str, Dict[str, Rule]]:
    rules: Dict[str, Dict[str, Rule]] = {'params': {}, 'batch_stats': {}}
    P = rules['params']

    # --- Swin backbone (mmcv-converted key names, swin.py:32-84) ---------
    bb = 'img_backbone'
    _conv(rules, f'{bb}/patch_embed', f'{bb}.patch_embed.projection', 2)
    _ln(rules, f'{bb}/patch_norm', f'{bb}.patch_embed.norm')
    for i, depth in enumerate(cfg.swin.depths):
        for j in range(depth):
            f = f'{bb}/stage{i}_block{j}'
            t = f'{bb}.stages.{i}.blocks.{j}'
            _ln(rules, f'{f}/norm1', f'{t}.norm1')
            _ln(rules, f'{f}/norm2', f'{t}.norm2')
            P[f'{f}/attn/relative_position_bias_table'] = (
                f'{t}.attn.w_msa.relative_position_bias_table', ident)
            _dense(rules, f'{f}/attn/qkv', f'{t}.attn.w_msa.qkv')
            _dense(rules, f'{f}/attn/proj', f'{t}.attn.w_msa.proj')
            _dense(rules, f'{f}/ffn_fc1', f'{t}.ffn.layers.0.0')
            _dense(rules, f'{f}/ffn_fc2', f'{t}.ffn.layers.1')
        if i < len(cfg.swin.depths) - 1:
            _ln(rules, f'{bb}/downsample{i}/norm',
                f'{bb}.stages.{i}.downsample.norm')
            P[f'{bb}/downsample{i}/reduction/kernel'] = (
                f'{bb}.stages.{i}.downsample.reduction.weight', linear)
    for i in cfg.swin.out_indices:
        _ln(rules, f'{bb}/out_norm{i}', f'{bb}.norm{i}')

    # --- FPN_LSS img neck (lss_fpn.py:53-72: Sequential conv,bn,relu x2) --
    _convbn(rules, 'img_neck/ConvBN_0', 'img_neck.conv.0', 'img_neck.conv.1', 2)
    _convbn(rules, 'img_neck/ConvBN_1', 'img_neck.conv.3', 'img_neck.conv.4', 2)

    # --- CrossModalLSS view transformer -----------------------------------
    vt, tvt = 'img_view_transformer', 'img_view_transformer'
    _convbn(rules, f'{vt}/img_reduce_conv', f'{tvt}.img_reduce_conv.0',
            f'{tvt}.img_reduce_conv.1', 2)
    _convbn(rules, f'{vt}/depth_encoder0', f'{tvt}.depth_encoder.0',
            f'{tvt}.depth_encoder.1', 2)
    _convbn(rules, f'{vt}/depth_encoder1', f'{tvt}.depth_encoder.3',
            f'{tvt}.depth_encoder.4', 2)
    cmf, tcmf = f'{vt}/cross_modal_fusion', f'{tvt}.cross_model_fusion'
    _dense(rules, f'{cmf}/channel_mlp_c', f'{tcmf}.channel_mlp_c.0')
    _dense(rules, f'{cmf}/channel_mlp_d', f'{tcmf}.channel_mlp_d.0')
    for s in ('spatial_c', 'spatial_d'):
        _conv(rules, f'{cmf}/{s}_0', f'{tcmf}.{s}.0', 2)
        _conv(rules, f'{cmf}/{s}_1', f'{tcmf}.{s}.2', 2)
    _convbn(rules, f'{cmf}/fuse_conv', f'{tcmf}.fuse_conv.0',
            f'{tcmf}.fuse_conv.1', 2)
    _basicblock2d(rules, f'{vt}/further_fuse', f'{tvt}.further_fuse')

    dsn, tdsn = f'{vt}/depth_seg_net', f'{tvt}.depth_seg_net'
    for r in ('reduce_conv_depth', 'reduce_conv_seg', 'reduce_conv_context'):
        _convbn(rules, f'{dsn}/{r}', f'{tdsn}.{r}.0', f'{tdsn}.{r}.1', 2)
    # BatchNorm1d over the 27-dim camera vector
    p = f'{dsn}/mlp_bn/BatchNorm_0'
    P[f'{p}/scale'] = (f'{tdsn}.bn.weight', ident)
    P[f'{p}/bias'] = (f'{tdsn}.bn.bias', ident)
    rules['batch_stats'][f'{p}/mean'] = (f'{tdsn}.bn.running_mean', ident)
    rules['batch_stats'][f'{p}/var'] = (f'{tdsn}.bn.running_var', ident)
    for m in ('depth_mlp', 'context_mlp', 'seg_mlp'):
        _mlp(rules, f'{dsn}/{m}', f'{tdsn}.{m}')
    for s in ('depth_se', 'context_se', 'seg_se'):
        _selayer(rules, f'{dsn}/{s}', f'{tdsn}.{s}')
    _basicblock2d(rules, f'{dsn}/depth_block0', f'{tdsn}.depth_conv.0')
    _basicblock2d(rules, f'{dsn}/depth_block1', f'{tdsn}.depth_conv.1')
    _aspp(rules, f'{dsn}/aspp', f'{tdsn}.depth_conv.2')
    _conv(rules, f'{dsn}/depth_out', f'{tdsn}.depth_conv.3', 2)
    _conv(rules, f'{dsn}/context_conv', f'{tdsn}.context_conv', 2)
    _conv(rules, f'{dsn}/seg_conv0/Conv_0', f'{tdsn}.seg_conv.0', 2)
    _basicblock2d(rules, f'{dsn}/seg_conv1', f'{tdsn}.seg_conv.1')
    _conv(rules, f'{dsn}/seg_out', f'{tdsn}.seg_out', 2)

    # --- pre_process + BEV encoder ----------------------------------------
    _resnet3d(rules, 'pre_process_net', 'pre_process_net', (1,))
    _resnet3d(rules, 'bev_backbone', 'img_bev_encoder_backbone',
              cfg.bev_num_layer)
    _convbn(rules, 'bev_neck/ConvBN_0', 'img_bev_encoder_neck.conv.conv',
            'img_bev_encoder_neck.conv.bn', 3)

    # --- lidar sparse encoder (lidar_encoder.py:65-89,125-194) ------------
    le, tle = 'lidar_encoder', 'lidar_encoder'
    P[f'{le}/conv_input_kernel'] = (f'{tle}.conv_input.0.weight', spconv)
    P[f'{le}/conv_out_kernel'] = (f'{tle}.conv_out.0.weight', spconv)
    n_stage = len(cfg.lidar.encoder_channels)
    for i, blocks in enumerate(cfg.lidar.encoder_channels):
        t_stage = f'{tle}.encoder_layers.encoder_layer{i + 1}'
        n_subm = len(blocks) - 1 if i < n_stage - 1 else len(blocks)
        for j in range(n_subm):
            f = f'{le}/stage{i}_subm{j}'
            P[f'{f}/kernel'] = (f'{t_stage}.{j}.0.weight', spconv)
            bn = f'{t_stage}.{j}.1'
            P[f'{f}/MaskedBatchNorm_0/scale'] = (f'{bn}.weight', ident)
            P[f'{f}/MaskedBatchNorm_0/bias'] = (f'{bn}.bias', ident)
            rules['batch_stats'][f'{f}/MaskedBatchNorm_0/mean'] = (
                f'{bn}.running_mean', ident)
            rules['batch_stats'][f'{f}/MaskedBatchNorm_0/var'] = (
                f'{bn}.running_var', ident)
        if i < n_stage - 1:
            f = f'{le}/stage{i}_down'
            j = len(blocks) - 1
            P[f'{f}/kernel'] = (f'{t_stage}.{j}.0.weight', spconv)
            bn = f'{t_stage}.{j}.1'
            P[f'{f}/MaskedBatchNorm_0/scale'] = (f'{bn}.weight', ident)
            P[f'{f}/MaskedBatchNorm_0/bias'] = (f'{bn}.bias', ident)
            rules['batch_stats'][f'{f}/MaskedBatchNorm_0/mean'] = (
                f'{bn}.running_mean', ident)
            rules['batch_stats'][f'{f}/MaskedBatchNorm_0/var'] = (
                f'{bn}.running_var', ident)

    # --- head --------------------------------------------------------------
    _conv(rules, 'final_conv', 'final_conv.conv', 3)
    _dense(rules, 'predicter_fc1', 'predicter.0')
    _dense(rules, 'predicter_fc2', 'predicter.2')
    return rules


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, 'items'):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out['/'.join(prefix)] = tree
    return out


def _unflatten(flat: Dict[str, Any]):
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def convert_official_swin(state_dict: Dict[str, np.ndarray],
                          prefix: str = 'img_backbone.'
                          ) -> Dict[str, np.ndarray]:
    """Official (Microsoft) Swin checkpoint keys -> mmcv-format keys.

    Re-implements the reference's swin_convert (backbones/swin.py:32-84):
    layers->stages, attn.->attn.w_msa., mlp.fc1/fc2->ffn.layers.0.0/1,
    patch_embed.proj->projection, classification head dropped, and the
    nn.Unfold channel-order correction on PatchMerging reduction/norm
    weights (official concat order [x00, x10, x01, x11] by-chunk vs mmcv
    unfold's interleaved c*4+p).  The result feeds import_state_dict for
    warm-starting from an official Swin pretrain (configs load_from path).
    """
    def reduction_order(x):
        o, i = x.shape
        return x.reshape(o, 4, i // 4)[:, (0, 2, 1, 3)].transpose(
            0, 2, 1).reshape(o, i)

    def norm_order(x):
        i = x.shape[0]
        return x.reshape(4, i // 4)[(0, 2, 1, 3), :].T.reshape(i)

    out: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        v = np.asarray(v)
        if k.startswith('head'):
            continue
        if k.startswith('layers'):
            if 'attn.' in k:
                k = k.replace('attn.', 'attn.w_msa.')
            elif 'mlp.fc1.' in k:
                k = k.replace('mlp.fc1.', 'ffn.layers.0.0.')
            elif 'mlp.fc2.' in k:
                k = k.replace('mlp.fc2.', 'ffn.layers.1.')
            elif 'mlp.' in k:
                k = k.replace('mlp.', 'ffn.')
            elif 'downsample' in k:
                if 'reduction.' in k:
                    v = reduction_order(v)
                elif 'norm.' in k:
                    v = norm_order(v)
            k = k.replace('layers', 'stages', 1)
        elif k.startswith('patch_embed') and 'proj' in k:
            k = k.replace('proj', 'projection')
        out[prefix + k] = v
    return out


def import_state_dict(state_dict: Dict[str, np.ndarray], params,
                      batch_stats, cfg: ModelConfig, strict: bool = True):
    """Overwrite flax trees with converted torch weights.

    Returns (params, batch_stats, report) where report lists flax leaves
    without a torch source and torch keys that were never consumed.
    """
    import jax.numpy as jnp
    rules = build_rules(cfg)
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()
    report = {'missing_rule': [], 'missing_torch': [], 'shape_mismatch': []}

    def apply(tree, kind):
        flat = _flatten(tree)
        out = {}
        for path, leaf in flat.items():
            rule = rules[kind].get(path)
            if rule is None:
                report['missing_rule'].append(f'{kind}:{path}')
                out[path] = leaf
                continue
            tkey, conv = rule
            if tkey not in sd:
                report['missing_torch'].append(tkey)
                out[path] = leaf
                continue
            val = conv(sd[tkey]).astype(np.float32)
            used.add(tkey)
            if ('relative_position_bias_table' in path
                    and val.shape != tuple(leaf.shape)
                    and val.shape[1] == leaf.shape[1]):
                val = resize_bias_table(val, leaf.shape[0])
            if val.shape != tuple(leaf.shape):
                report['shape_mismatch'].append(
                    f'{path}: torch {val.shape} vs flax {tuple(leaf.shape)}')
                out[path] = leaf
            else:
                out[path] = jnp.asarray(val)
        return _unflatten(out)

    new_params = apply(params, 'params')
    new_stats = apply(batch_stats, 'batch_stats')
    report['unused_torch'] = sorted(
        k for k in sd if k not in used
        and 'relative_position_index' not in k and 'num_batches' not in k)
    if strict and (report['missing_torch'] or report['shape_mismatch']):
        raise ValueError(f'import failed: {report}')
    return new_params, new_stats, report
