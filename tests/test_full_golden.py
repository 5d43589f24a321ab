"""FULL-composition golden parity: the complete FusionOcc forward (Swin ->
FPN_LSS -> CrossModalLSS -> bev_pool -> pre_process + sparse LiDAR encoder ->
fusion -> CustomResNet3D -> LSSFPN3D -> head) against a torch fixture built
with the REFERENCE's exact module tree and state_dict naming
(projects/FusionOcc/fusionocc/fusion_occ.py:431-920), with weights flowing
through the public importer `train.torch_import.import_state_dict`.

The sparse LiDAR encoder's torch equivalent runs dense convs on a masked
grid (submanifold conv == dense conv with zeroed inactive inputs, output
restricted to the active set; strided conv's active set == occupancy of the
receptive field — the exact spconv semantics, lidar_encoder.py:125-220).

This test fails if ANY module wiring, permute/layout convention, or importer
rule is wrong anywhere in the composition, and additionally asserts the
importer consumed every torch key and covered every flax leaf.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from test_swin_golden import TBlock, TPatchMerging
from test_torch_golden import (TorchBasicBlock, TorchBasicBlock3D,
                               TorchConvModule3d, TorchDepthSegNet,
                               TorchCrossModalFusion, conv_bn_relu,
                               _randomize)

from fusionocc_tpu.config import midsize_model_config, tiny_model_config
from fusionocc_tpu.data.synthetic import synthetic_batch
from fusionocc_tpu.geometry import (frustum_to_ego, get_mlp_input,
                                    make_frustum)
from fusionocc_tpu.models.fusion_occ import FusionOcc
from fusionocc_tpu.train.torch_import import import_state_dict


# ---------------------------------------------------------------------------
# torch reference-structure fixtures
# ---------------------------------------------------------------------------

class TSwinFull(nn.Module):
    """mmcv-named Swin with arbitrary depths/out_indices (swin.py:688-985)."""

    def __init__(self, embed, depths, heads, w, mlp_ratio, out_indices):
        super().__init__()
        self.out_indices = out_indices
        dims = [embed * 2 ** i for i in range(len(depths))]

        class PE(nn.Module):
            def __init__(self):
                super().__init__()
                self.projection = nn.Conv2d(3, embed, 4, 4)
                self.norm = nn.LayerNorm(embed)
        self.patch_embed = PE()

        class Stage(nn.Module):
            def __init__(self, dim, depth, h, downsample):
                super().__init__()
                self.blocks = nn.ModuleList(
                    [TBlock(dim, h, w, j % 2 == 1, mlp_ratio)
                     for j in range(depth)])
                self.downsample = downsample
        self.stages = nn.ModuleList([
            Stage(dims[i], depths[i], heads[i],
                  TPatchMerging(dims[i], dims[i + 1])
                  if i < len(depths) - 1 else None)
            for i in range(len(depths))])
        for i in out_indices:
            setattr(self, f'norm{i}', nn.LayerNorm(dims[i]))

    def forward(self, x):
        x = self.patch_embed.projection(x)
        hw = (x.shape[2], x.shape[3])
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        outs = []
        for i, st in enumerate(self.stages):
            for blk in st.blocks:
                x = blk(x, hw)
            if i in self.out_indices:
                out = getattr(self, f'norm{i}')(x)
                B = out.shape[0]
                outs.append(out.view(B, *hw, -1).permute(0, 3, 1, 2))
            if st.downsample is not None:
                x, hw = st.downsample(x, hw)
        return outs


class TFPN(nn.Module):
    """FPN_LSS (lss_fpn.py:53-72): upsample deep x2, concat, 2x(conv,bn,relu)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(cin, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

    def forward(self, feats):
        x2, x1 = feats
        x1 = F.interpolate(x1, size=x2.shape[2:], mode='bilinear',
                           align_corners=True)
        return self.conv(torch.cat([x2, x1], dim=1))


class TCrossModalLSS(nn.Module):
    """fusion_view_transformer.py:147-251 wiring + names (pooling external)."""

    def __init__(self, cin, mid, D, feat_ch, nseg, aspp_mid):
        super().__init__()
        self.img_reduce_conv = conv_bn_relu(cin, mid)
        self.depth_encoder = nn.Sequential(
            nn.Conv2d(D, mid, 3, 1, 1, bias=False),
            nn.BatchNorm2d(mid), nn.ReLU(inplace=True),
            nn.Conv2d(mid, mid, 3, 1, 1, bias=False),
            nn.BatchNorm2d(mid), nn.ReLU(inplace=True))
        self.cross_model_fusion = TorchCrossModalFusion(mid)
        self.further_fuse = TorchBasicBlock(2 * mid)
        self.depth_seg_net = TorchDepthSegNet(2 * mid, mid, D, feat_ch, nseg,
                                              aspp_mid)

    def forward(self, img, onehot, mlp_input):
        f_c = self.img_reduce_conv(img)
        f_d = self.depth_encoder(onehot)
        c2d, d2c = self.cross_model_fusion(f_c, f_d)
        fused = self.further_fuse(torch.cat([c2d, d2c], 1))
        depth, feature, seg = self.depth_seg_net(fused, mlp_input)
        return torch.softmax(depth, 1), feature, seg


class SpConvDense(nn.Module):
    """Dense stand-in for a spconv conv: weight stored in spconv2's native
    (O, k0, k1, k2, I) layout so state_dict keys/layout match the reference
    checkpoints (write_spconv2.py:42-60)."""

    def __init__(self, cin, cout, k=3, stride=1):
        super().__init__()
        self.weight = nn.Parameter(torch.zeros(cout, k, k, k, cin))
        self.stride, self.k = stride, k

    def forward(self, x):
        w = self.weight.permute(0, 4, 1, 2, 3)
        return F.conv3d(x, w, stride=self.stride, padding=self.k // 2)


class TLidarDense(nn.Module):
    """CustomSparseEncoder (lidar_encoder.py:31-246) as dense-masked convs."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.conv_input = nn.Sequential(
            SpConvDense(cfg.in_channels, cfg.base_channels, k=1))
        layers = nn.Module()
        n_stage = len(cfg.encoder_channels)
        cin = cfg.base_channels
        for i, blocks in enumerate(cfg.encoder_channels):
            mods = []
            n_subm = len(blocks) - 1 if i < n_stage - 1 else len(blocks)
            for j in range(n_subm):
                mods.append(nn.Sequential(
                    SpConvDense(cin, blocks[j]),
                    nn.BatchNorm3d(blocks[j], eps=1e-3)))
                cin = blocks[j]
            if i < n_stage - 1:
                mods.append(nn.Sequential(
                    SpConvDense(cin, blocks[-1], stride=2),
                    nn.BatchNorm3d(blocks[-1], eps=1e-3)))
                cin = blocks[-1]
            setattr(layers, f'encoder_layer{i + 1}', nn.Sequential(*mods))
        self.encoder_layers = layers
        self.conv_out = nn.Sequential(
            SpConvDense(cin, cfg.output_channels, k=1))

    def forward(self, dense, mask):
        """dense: (B, C, X, Y, Z) mean-voxelized points; mask: (B,1,X,Y,Z)."""
        x = self.conv_input[0](dense) * mask
        n_stage = len(self.cfg.encoder_channels)
        for i, blocks in enumerate(self.cfg.encoder_channels):
            stage = getattr(self.encoder_layers, f'encoder_layer{i + 1}')
            n_subm = len(blocks) - 1 if i < n_stage - 1 else len(blocks)
            for j in range(n_subm):
                sp, bn = stage[j][0], stage[j][1]
                x = F.relu(bn(sp(x))) * mask
            if i < n_stage - 1:
                sp, bn = stage[-1][0], stage[-1][1]
                y = sp(x)
                # spconv strided active set: any active input in the
                # receptive field (sparse_conv.py:80-126 semantics)
                mask = (F.conv3d(mask, torch.ones(1, 1, 3, 3, 3),
                                 stride=2, padding=1) > 0).float()
                x = F.relu(bn(y)) * mask
        return self.conv_out[0](x) * mask


class TConvModule1x1x1(nn.Module):
    """mmcv ConvModule Conv3d 1x1x1 + BN + ReLU (.conv/.bn naming)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, 1, bias=False)
        self.bn = nn.BatchNorm3d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TFusionOcc(nn.Module):
    """Reference module tree (fusion_occ.py:431-920) at tiny scale."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        sw = cfg.swin
        dims = sw.num_features
        self.img_backbone = TSwinFull(sw.embed_dims, sw.depths, sw.num_heads,
                                      sw.window_size, sw.mlp_ratio,
                                      sw.out_indices)
        self.img_neck = TFPN(dims[sw.out_indices[0]] + dims[sw.out_indices[1]],
                             cfg.img_neck_out_channels)
        D = cfg.grid.num_depth_bins
        self.img_view_transformer = TCrossModalLSS(
            cfg.img_neck_out_channels, cfg.vt.mid_channels, D,
            cfg.vt.feature_channels, cfg.vt.seg_num_classes,
            cfg.vt.aspp_mid_channels)

        def resblock3d(cin, cout, stride):
            return TorchBasicBlock3D(
                cin, cout, stride, TorchConvModule3d(cin, cout, stride,
                                                     act=False))
        pre = nn.Module()
        pre.layers = nn.Sequential(nn.Sequential(
            resblock3d(cfg.vt.feature_channels, cfg.img_channels, 1)))
        self.pre_process_net = pre

        bev = nn.Module()
        seqs, cin = [], cfg.fusion_channels
        for c, n, s in zip(cfg.bev_channels, cfg.bev_num_layer,
                           cfg.bev_strides):
            blocks = [resblock3d(cin, c, s)]
            blocks += [TorchBasicBlock3D(c, c, 1, None) for _ in range(n - 1)]
            seqs.append(nn.Sequential(*blocks))
            cin = c
        bev.layers = nn.Sequential(*seqs)
        self.img_bev_encoder_backbone = bev

        neck = nn.Module()
        neck.conv = TConvModule1x1x1(sum(cfg.bev_channels), cfg.occ_channels)
        self.img_bev_encoder_neck = neck

        self.lidar_encoder = TLidarDense(cfg.lidar)

        fc = nn.Module()
        fc.conv = nn.Conv3d(cfg.occ_channels, cfg.occ_channels, 3, 1, 1,
                            bias=True)
        self.final_conv = fc
        self.predicter = nn.Sequential(
            nn.Linear(cfg.occ_channels, cfg.occ_channels * 2), nn.Softplus(),
            nn.Linear(cfg.occ_channels * 2, cfg.num_classes))

    def image_encoder(self, imgs):
        B, N = imgs.shape[:2]
        x = imgs.flatten(0, 1)                   # (B*N, 3, H, W)
        return self.img_neck(self.img_backbone(x))

    def forward(self, imgs, onehot, mlp_inputs, coors, lidar_dense,
                lidar_mask, grid):
        feats, depth0, seg0 = [], None, None
        for fid in range(self.cfg.num_frame - 1, -1, -1):
            x = self.image_encoder(imgs[:, fid])
            depth, feature, seg = self.img_view_transformer(
                x, onehot, mlp_inputs[fid])
            voxel = torch_bev_pool(depth, feature, coors[fid], grid,
                                   imgs.shape[0])
            voxel = self.pre_process_net.layers(voxel)
            feats.append(voxel)
            if fid == 0:
                depth0, seg0 = depth, seg
        lidar = self.lidar_encoder(lidar_dense, lidar_mask)
        lidar = lidar.permute(0, 1, 4, 3, 2)     # (B,C,X,Y,Z)->(B,C,Z,Y,X)
        x = torch.cat(feats + [lidar], dim=1)
        xs = []
        for layer in self.img_bev_encoder_backbone.layers:
            x = layer(x)
            xs.append(x)
        x8, x16, x32 = xs
        up16 = F.interpolate(x16, scale_factor=2, mode='trilinear',
                             align_corners=True)
        up32 = F.interpolate(x32, scale_factor=4, mode='trilinear',
                             align_corners=True)
        x = self.img_bev_encoder_neck.conv(torch.cat([x8, up16, up32], 1))
        x = F.relu(self.final_conv.conv(x))
        x = x.permute(0, 4, 3, 2, 1)             # (B,C,Z,Y,X)->(B,X,Y,Z,C)
        logits = self.predicter(x)
        return logits, depth0, seg0


def torch_bev_pool(depth, feature, coor, grid, B):
    """Dense scatter-add pooling (the CUDA kernel's math,
    bev_pool_cuda.cu:21-48). depth: (B*N, D, h, w) torch; feature:
    (B*N, C, h, w); coor: (B, N, D, h, w, 3) numpy ego coords."""
    gx, gy, gz = grid.grid_size
    BN, D, h, w = depth.shape
    N = BN // B
    C = feature.shape[1]
    v = np.floor((coor - np.asarray(grid.lower_bound))
                 / np.asarray(grid.interval)).astype(np.int64)
    inside = ((v[..., 0] >= 0) & (v[..., 0] < gx) &
              (v[..., 1] >= 0) & (v[..., 1] < gy) &
              (v[..., 2] >= 0) & (v[..., 2] < gz))
    b_idx = np.arange(B).reshape(B, 1, 1, 1, 1)
    rank = ((b_idx * gz + v[..., 2]) * gy + v[..., 1]) * gx + v[..., 0]
    rank = np.where(inside, rank, B * gz * gy * gx)
    prod = (depth.reshape(B, N, D, h, w, 1)
            * feature.reshape(B, N, C, 1, h, w).permute(0, 1, 3, 4, 5, 2)
            ).reshape(-1, C)
    out = torch.zeros(B * gz * gy * gx + 1, C)
    out.index_add_(0, torch.from_numpy(rank.reshape(-1)), prod)
    out = out[:-1].view(B, gz, gy, gx, C)
    return out.permute(0, 4, 1, 2, 3)            # (B, C, Z, Y, X)


def np_voxelize_mean(points, mask, pcr, vs, shape):
    """Mean point features per voxel -> dense (X, Y, Z, C) + occupancy."""
    pts = points[mask]
    ijk = np.floor((pts[:, :3] - np.asarray(pcr[:3]))
                   / np.asarray(vs)).astype(np.int64)
    ok = np.all((ijk >= 0) & (ijk < np.asarray(shape)), axis=1)
    pts, ijk = pts[ok], ijk[ok]
    key = (ijk[:, 0] * shape[1] + ijk[:, 1]) * shape[2] + ijk[:, 2]
    n = shape[0] * shape[1] * shape[2]
    sums = np.zeros((n, pts.shape[1]), np.float32)
    cnts = np.zeros((n,), np.float32)
    np.add.at(sums, key, pts)
    np.add.at(cnts, key, 1.0)
    occ = cnts > 0
    means = np.where(occ[:, None], sums / np.maximum(cnts, 1.0)[:, None], 0.0)
    return (means.reshape(*shape, -1),
            occ.reshape(*shape).astype(np.float32))


def np_depth_onehot(sparse_depth, ds, grid):
    """Linear GT depth binning (view_transformer.py:747-786)."""
    B, N, H, W = sparse_depth.shape
    D = grid.num_depth_bins
    x = sparse_depth.reshape(B, N, H // ds, ds, W // ds, ds)
    x = np.where(x == 0.0, 1e5, x).min(axis=(3, 5))
    lo, _, step = grid.depth
    binf = (x - (lo - step)) / step
    binf = np.where((binf < D + 1) & (binf >= 0.0), binf, 0.0).astype(np.int64)
    onehot = np.eye(D + 1, dtype=np.float32)[binf][..., 1:]
    return onehot                                 # (B, N, h, w, D)


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module', params=['tiny', 'midsize'])
def full_setup(request):
    """Full-composition parity at two scales: 'tiny' (fast, COO sparse
    backend) and 'midsize' (production window-12 padding on non-divisible
    grids, D=88/downsample-16 frustum, zfold backend with a non-full last
    fold — the structural edges the tiny config cannot reach)."""
    cfg = (tiny_model_config() if request.param == 'tiny'
           else midsize_model_config())
    batch = synthetic_batch(cfg, 1, 0, num_points=96)
    # cluster the points so every stage's active set fits the static
    # capacities with no truncation (dense == sparse then holds exactly)
    rng = np.random.RandomState(11)
    pts = batch.points.copy()
    pts[..., 0] = rng.uniform(-2.0, -0.5, pts.shape[:2])
    pts[..., 1] = rng.uniform(0.5, 2.0, pts.shape[:2])
    pts[..., 2] = rng.uniform(-0.4, 0.4, pts.shape[:2])
    batch = batch._replace(points=pts.astype(np.float32),
                           points_mask=np.ones(pts.shape[:2], bool))

    torch.manual_seed(0)
    tmod = _randomize(TFusionOcc(cfg), seed=42).eval()
    sd = {k: v.numpy() for k, v in tmod.state_dict().items()}

    model = FusionOcc(cfg)
    variables = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(batch)
    params, stats, report = import_state_dict(
        sd, variables['params'], variables['batch_stats'], cfg)
    return cfg, batch, tmod, model, params, stats, report


def test_importer_covers_everything(full_setup):
    """Every flax leaf has a rule, every torch key is consumed."""
    *_, report = full_setup
    assert report['missing_rule'] == [], report['missing_rule']
    assert report['missing_torch'] == [], report['missing_torch']
    assert report['shape_mismatch'] == [], report['shape_mismatch']
    assert report['unused_torch'] == [], report['unused_torch']


def test_full_forward_matches_torch(full_setup):
    cfg, batch, tmod, model, params, stats, _ = full_setup
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        {'params': params, 'batch_stats': stats}, batch)

    # torch-side inputs
    grid = cfg.grid
    frustum = make_frustum(grid.depth, cfg.input_size, cfg.vt.downsample,
                           cfg.vt.sid)
    coors, mlps = [], []
    for fid in range(cfg.num_frame):
        coors.append(np.asarray(frustum_to_ego(
            frustum, batch.sensor2keyego[:, fid], batch.intrins[:, fid],
            batch.post_rots[:, fid], batch.post_trans[:, fid], batch.bda)))
        mlps.append(torch.from_numpy(np.asarray(get_mlp_input(
            batch.sensor2keyego[:, 0], batch.intrins[:, fid],
            batch.post_rots[:, fid], batch.post_trans[:, fid], batch.bda))))
    onehot = np_depth_onehot(batch.sparse_depth, cfg.vt.downsample, grid)
    B, N, h, w, D = onehot.shape
    onehot_t = torch.from_numpy(onehot).reshape(B * N, h, w, D).permute(
        0, 3, 1, 2)
    shape = cfg.lidar.sparse_shape(grid)
    dense, occ = np_voxelize_mean(batch.points[0], batch.points_mask[0],
                                  grid.point_cloud_range,
                                  cfg.lidar.voxel_size, shape)
    dense_t = torch.from_numpy(dense).permute(3, 0, 1, 2)[None]
    mask_t = torch.from_numpy(occ)[None, None]
    imgs_t = torch.from_numpy(np.asarray(batch.imgs)).permute(
        0, 1, 2, 5, 3, 4)

    with torch.no_grad():
        tlogits, tdepth, tseg = tmod(imgs_t, onehot_t, mlps, coors,
                                     dense_t, mask_t, grid)

    got = np.asarray(out['occ_logits'])
    ref = tlogits.numpy()
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)

    got_d = np.asarray(out['depth']).reshape(B * N, h, w, D)
    np.testing.assert_allclose(got_d, tdepth.permute(0, 2, 3, 1).numpy(),
                               rtol=5e-3, atol=1e-4)
    got_s = np.asarray(out['seg_logits']).reshape(B * N, h, w, -1)
    np.testing.assert_allclose(got_s, tseg.permute(0, 2, 3, 1).numpy(),
                               rtol=5e-3, atol=5e-3)


def test_full_losses_match_torch(full_setup):
    """The three training losses, computed on each side's own outputs,
    agree — importer + forward + loss formulas compose correctly
    (fusion_occ.py:843-875, fusion_view_transformer.py:189-224)."""
    cfg, batch, tmod, model, params, stats, _ = full_setup
    from fusionocc_tpu.train.losses import total_loss
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        {'params': params, 'batch_stats': stats}, batch)
    _, logs = total_loss(out, batch, cfg)

    # torch formulas on the flax outputs' torch twins (same inputs as the
    # forward test, recomputed via the fixture)
    grid = cfg.grid
    frustum = make_frustum(grid.depth, cfg.input_size, cfg.vt.downsample,
                           cfg.vt.sid)
    coors, mlps = [], []
    for fid in range(cfg.num_frame):
        coors.append(np.asarray(frustum_to_ego(
            frustum, batch.sensor2keyego[:, fid], batch.intrins[:, fid],
            batch.post_rots[:, fid], batch.post_trans[:, fid], batch.bda)))
        mlps.append(torch.from_numpy(np.asarray(get_mlp_input(
            batch.sensor2keyego[:, 0], batch.intrins[:, fid],
            batch.post_rots[:, fid], batch.post_trans[:, fid], batch.bda))))
    onehot = np_depth_onehot(batch.sparse_depth, cfg.vt.downsample, grid)
    B, N, h, w, D = onehot.shape
    onehot_t = torch.from_numpy(onehot).reshape(B * N, h, w, D).permute(
        0, 3, 1, 2)
    shape = cfg.lidar.sparse_shape(grid)
    dense, occ = np_voxelize_mean(batch.points[0], batch.points_mask[0],
                                  grid.point_cloud_range,
                                  cfg.lidar.voxel_size, shape)
    with torch.no_grad():
        tlogits, tdepth, tseg = tmod(
            torch.from_numpy(np.asarray(batch.imgs)).permute(0, 1, 2, 5, 3, 4),
            onehot_t, mlps, coors,
            torch.from_numpy(dense).permute(3, 0, 1, 2)[None],
            torch.from_numpy(occ)[None, None], grid)

    # occ: masked CE mean
    flat = tlogits.reshape(-1, cfg.num_classes)
    lab = torch.from_numpy(np.asarray(batch.voxel_semantics)).reshape(-1).long()
    nll = F.cross_entropy(flat, lab, reduction='none')
    m = torch.from_numpy(np.asarray(batch.mask_camera)).reshape(-1).float()
    t_occ = float((nll * m).sum() / m.sum())
    # depth: BCE over fg pixels
    labels = torch.from_numpy(onehot).reshape(-1, D)
    fg = labels.max(1).values > 0
    pred = tdepth.permute(0, 2, 3, 1).reshape(-1, D)
    t_depth = float(F.binary_cross_entropy(
        pred.clamp(1e-7, 1 - 1e-7), labels, reduction='none'
    )[fg].sum() / fg.sum())
    # seg: CE over non-free subsampled labels
    ds = cfg.vt.downsample
    seg_lab = torch.from_numpy(
        np.asarray(batch.segs)[:, :, ::ds, ::ds]).reshape(-1).long()
    seg_logit = tseg.permute(0, 2, 3, 1).reshape(-1, cfg.vt.seg_num_classes)
    keep = seg_lab != 17
    t_seg = float(F.cross_entropy(seg_logit[keep], seg_lab[keep]))

    w_f = cfg.fuse_loss_weight
    assert abs(float(logs['loss_occ']) - t_occ) < 2e-3, (
        float(logs['loss_occ']), t_occ)
    assert abs(float(logs['depth_loss'])
               - t_depth * w_f * cfg.depth_loss_weight) < 2e-3
    assert abs(float(logs['seg_loss']) - t_seg * w_f) < 2e-3
