"""Base LSS family: shapes, depth normalization, stereo cost volume, and
image-only FusionOcc mode."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.config import GridConfig, tiny_model_config
from fusionocc_tpu.data.synthetic import synthetic_batch
from fusionocc_tpu.geometry import frustum_to_ego, make_frustum
from fusionocc_tpu.models.lss_base import (LSSViewTransformer,
                                           LSSViewTransformerBEVDepth,
                                           stereo_cost_volume)
from fusionocc_tpu.ops.bev_pool import prepare_pooling_index


def _pool_setup():
    grid = GridConfig(x=(-4, 4, 1.0), y=(-4, 4, 1.0), z=(-1, 3, 1.0),
                      depth=(1.0, 5.0, 1.0))
    B, N = 1, 2
    rng = np.random.RandomState(0)
    frustum = make_frustum(grid.depth, (16, 32), 4)
    intr = np.tile(np.array([[20.0, 0, 16], [0, 20.0, 8], [0, 0, 1]],
                            np.float32), (B, N, 1, 1))
    s2e = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    pr = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    pt = np.zeros((B, N, 3), np.float32)
    bda = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    coor = frustum_to_ego(frustum, jnp.asarray(s2e), jnp.asarray(intr),
                          jnp.asarray(pr), jnp.asarray(pt), jnp.asarray(bda))
    return grid, prepare_pooling_index(coor, grid), (B, N, 4, 8)


def test_plain_lss_shapes():
    grid, idx, (B, N, h, w) = _pool_setup()
    vt = LSSViewTransformer(grid, out_channels=6)
    x = jnp.asarray(np.random.RandomState(0).randn(B, N, h, w, 12),
                    jnp.float32)
    v = vt.init(jax.random.PRNGKey(0), x, idx)
    voxel, depth = vt.apply(v, x, idx)
    assert voxel.shape == (B, grid.size_z, grid.size_y, grid.size_x, 6)
    np.testing.assert_allclose(np.asarray(depth.sum(-1)), 1.0, atol=1e-5)


def test_bevdepth_lss_shapes():
    grid, idx, (B, N, h, w) = _pool_setup()
    vt = LSSViewTransformerBEVDepth(grid, out_channels=6, mid_channels=8,
                                    aspp_mid_channels=8)
    x = jnp.asarray(np.random.RandomState(0).randn(B, N, h, w, 12),
                    jnp.float32)
    mlp_input = jnp.asarray(np.random.RandomState(1).randn(B, N, 27),
                            jnp.float32)
    v = vt.init(jax.random.PRNGKey(0), x, mlp_input, idx)
    voxel, depth = vt.apply(v, x, mlp_input, idx)
    assert voxel.shape == (B, grid.size_z, grid.size_y, grid.size_x, 6)
    assert np.all(np.isfinite(np.asarray(voxel)))


def test_stereo_cost_volume_identity_pose():
    """Identical frames + identity relative pose -> zero matching cost at
    every candidate depth -> uniform softmax over depth."""
    B, N, hs, ws, C = 1, 1, 16, 32, 4
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(B * N, hs, ws, C), jnp.float32)
    # cost-volume frustum lives at the stage-0 feature resolution
    # (cv_frustum downsample=4, fusion_view_transformer.py:156-158)
    frustum = make_frustum((1.0, 5.0, 1.0), (hs * 4, ws * 4), 4)
    D, H, W = frustum.shape[:3]
    intr = jnp.asarray(np.tile(np.array(
        [[30.0, 0, 64], [0, 30.0, 32], [0, 0, 1]], np.float32),
        (B, N, 1, 1)))
    k2s = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)))
    pr = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)))
    pt = jnp.zeros((B, N, 3), jnp.float32)
    cost = stereo_cost_volume(feat, feat, frustum, k2s, intr, pr, pt)
    assert cost.shape == (B * N, H, W, D)
    # interior pixels: warp is identity at every depth -> uniform over D
    np.testing.assert_allclose(np.asarray(cost[0, 4:12, 8:24]), 1.0 / D,
                               atol=1e-3)


def test_image_only_fusionocc():
    cfg = dataclasses.replace(tiny_model_config(), use_lidar=False)
    from fusionocc_tpu.models.fusion_occ import FusionOcc
    model = FusionOcc(cfg)
    batch = synthetic_batch(cfg, 1, 0, num_points=64)
    v = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(batch)
    assert 'lidar_encoder' not in v['params']
    out = jax.jit(lambda vv, b: model.apply(vv, b, train=False))(v, batch)
    assert out['occ_logits'].shape == (1,) + cfg.grid.grid_size + (18,)
