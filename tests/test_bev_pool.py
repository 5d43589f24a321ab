"""bev_pool: forward vs dense-einsum reference + reference toy grad check.

The toy case reproduces the values asserted by the reference kernel's
self-test (mmdet3d/ops/bev_pool_v2/bev_pool.py:145-176): loss 4.4, known
depth/feat gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionocc_tpu.config import GridConfig
from fusionocc_tpu.geometry import frustum_to_ego, make_frustum
from fusionocc_tpu.ops.bev_pool import (PoolingIndex, _bev_pool_flat, bev_pool,
                                        bev_pool_dense_reference,
                                        prepare_pooling_index)


def test_toy_matches_reference_kernel_selftest():
    # The reference self-test uses 4 active points out of 8 frustum points.
    # Our op carries the full static point set (prepare_pooling_index keeps
    # every point; inactive ones get the sentinel bev rank and every pixel
    # appears exactly D times), so the toy problem is embedded in the full
    # 8-point layout: P=8, Pf=4 pixels, D=2.
    depth = jnp.asarray([0.3, 0.4, 0.2, 0.1, 0.7, 0.6, 0.8, 0.9], jnp.float32)
    feat = jnp.ones((4, 2), jnp.float32)  # 4 pixel rows x 2 channels
    num_voxels = 8
    # active: depths (0,4)->voxel0/pix0, (1)->voxel1/pix1, (6)->voxel1/pix2
    # padding: depths 2,3,5,7 on pixels 1,2,3,3 with the sentinel rank
    ranks_depth = jnp.asarray([0, 4, 1, 6, 2, 3, 5, 7], jnp.int32)
    ranks_feat = jnp.asarray([0, 0, 1, 2, 1, 2, 3, 3], jnp.int32)
    ranks_bev = jnp.asarray([0, 0, 1, 1] + [num_voxels] * 4, jnp.int32)
    order_by_feat = jnp.argsort(ranks_feat).astype(jnp.int32)
    bounds = jnp.searchsorted(
        ranks_bev, jnp.arange(num_voxels + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    def loss_fn(d, f):
        out = _bev_pool_flat(d, f, ranks_depth, ranks_feat, ranks_bev,
                             order_by_feat, bounds, num_voxels)
        return jnp.sum(out)

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(depth, feat)
    assert np.isclose(float(loss), 4.4, atol=1e-6)
    g_depth, g_feat = grads
    np.testing.assert_allclose(
        np.asarray(g_depth), [2, 2, 0, 0, 2, 0, 2, 0], atol=1e-6)
    # feat grad: rows 0,1,2 receive depth sums 1.0, 0.4, 0.8 in each channel
    np.testing.assert_allclose(
        np.asarray(g_feat), [[1.0, 1.0], [0.4, 0.4], [0.8, 0.8], [0, 0]],
        atol=1e-6)


@pytest.mark.parametrize("batch", [1, 2])
def test_full_pipeline_matches_dense_reference(batch):
    grid = GridConfig(x=(-4, 4, 1.0), y=(-4, 4, 1.0), z=(-1, 3, 1.0),
                      depth=(1.0, 5.0, 1.0))
    B, N, downsample = batch, 2, 4
    input_size = (16, 32)
    frustum = make_frustum(grid.depth, input_size, downsample)
    rng = np.random.RandomState(0)

    intrins = np.tile(np.array([[20.0, 0, 16], [0, 20.0, 8], [0, 0, 1]],
                               np.float32), (B, N, 1, 1))
    s2e = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    s2e[..., :3, 3] = rng.uniform(-0.5, 0.5, (B, N, 3))
    post_rots = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    post_trans = np.zeros((B, N, 3), np.float32)
    bda = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))

    coor = frustum_to_ego(frustum, jnp.asarray(s2e), jnp.asarray(intrins),
                          jnp.asarray(post_rots), jnp.asarray(post_trans),
                          jnp.asarray(bda))
    D, Hf, Wf = frustum.shape[:3]
    depth = jax.nn.softmax(
        jnp.asarray(rng.randn(B, N, D, Hf, Wf), jnp.float32), axis=2)
    feat = jnp.asarray(rng.randn(B, N, Hf, Wf, 3), jnp.float32)

    idx = prepare_pooling_index(coor, grid)
    out = bev_pool(depth, feat, idx, grid)
    ref = bev_pool_dense_reference(depth, feat, coor, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert out.shape == (B, grid.size_z, grid.size_y, grid.size_x, 3)

    # eval-only trimmed index (valid prefix, block-rounded): identical pool
    from fusionocc_tpu.ops.bev_pool import trim_pooling_index
    tidx = trim_pooling_index(idx, block=64)
    n_valid = int(np.asarray(idx.bounds[-1]))
    assert n_valid < idx.ranks_bev.shape[0]     # geometry has OOB points
    assert tidx.ranks_bev.shape[0] <= idx.ranks_bev.shape[0]
    out_t = bev_pool(depth, feat, tidx, grid)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out),
                               rtol=1e-6, atol=1e-6)


def test_grad_matches_dense_reference():
    grid = GridConfig(x=(-2, 2, 1.0), y=(-2, 2, 1.0), z=(-1, 1, 1.0),
                      depth=(1.0, 4.0, 1.0))
    rng = np.random.RandomState(1)
    B, N, Hf, Wf, C = 1, 1, 3, 4, 2
    D = grid.num_depth_bins
    coor = jnp.asarray(rng.uniform(-2.5, 2.5, (B, N, D, Hf, Wf, 3)),
                       jnp.float32)
    depth = jnp.asarray(rng.rand(B, N, D, Hf, Wf), jnp.float32)
    feat = jnp.asarray(rng.randn(B, N, Hf, Wf, C), jnp.float32)
    idx = prepare_pooling_index(coor, grid)

    def f(d, x):
        return jnp.sum(bev_pool(d, x, idx, grid) ** 2)

    def f_ref(d, x):
        return jnp.sum(bev_pool_dense_reference(d, x, coor, grid) ** 2)

    g = jax.grad(f, argnums=(0, 1))(depth, feat)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(depth, feat)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
