"""Dense-conv crossover for late encoder stages (ops/dense_conv.py).

The dense tail must be numerically identical to the zfold sparse stages
with the SAME parameters (checkpoint interchangeability): the spconv
active-set semantics (SubM keeps the input set; strided dilates by the
stride-2 receptive-field rule) are reproduced densely by exact zeros at
inactive cells + mask dilation via max-pool.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.ops.dense_conv import (conv3d_ndhwc, conv3d_zbatch,
                                          strided_out_mask)


def test_conv3d_zbatch_matches_ndhwc():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 7, 8, 3), jnp.float32)
    w = jnp.asarray(rng.randn(27, 3, 5), jnp.float32) * 0.1
    for stride in (1, 2):
        ref = conv3d_ndhwc(x, w, stride)
        xz = jnp.transpose(x, (0, 3, 1, 2, 4))        # (B, Z, X, Y, C)
        got = conv3d_zbatch(xz, w, stride)
        got = jnp.transpose(got, (0, 2, 3, 1, 4))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=str(stride))


def test_conv3d_matches_gather_gemm():
    """Dense conv == the COO gather-GEMM on the densified grid."""
    from fusionocc_tpu.ops.sparse_conv import (build_subm_index,
                                               sparse_conv_apply,
                                               sparse_to_dense)
    from test_sparse_conv import _random_sparse
    rng = np.random.RandomState(1)
    shape, B, V, cin, cout = (8, 7, 16), 2, 96, 3, 5
    sp = _random_sparse(rng, B, V, shape, cin, density_pts=100)
    w = jnp.asarray(rng.randn(27, cin, cout), jnp.float32) * 0.1

    nbr = build_subm_index(sp, shape)
    ref = sparse_conv_apply(sp.feats, sp.mask, nbr, w)
    ref_d = sparse_to_dense(ref, sp.keys, sp.mask, shape)

    x = sparse_to_dense(sp.feats, sp.keys, sp.mask, shape)
    mask = sparse_to_dense(jnp.ones_like(sp.feats[..., :1]),
                           sp.keys, sp.mask, shape)[..., 0] > 0
    got = jnp.where(mask[..., None], conv3d_ndhwc(x, w, 1), 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_d),
                               rtol=1e-4, atol=1e-5)


def test_strided_out_mask_matches_downsample_rule():
    from fusionocc_tpu.ops.sparse_conv import build_strided_index
    from fusionocc_tpu.ops.sparse_conv import sparse_to_dense
    from test_sparse_conv import _random_sparse
    rng = np.random.RandomState(2)
    shape, B, V, cin = (12, 10, 16), 2, 128, 3
    sp = _random_sparse(rng, B, V, shape, cin, density_pts=150)
    (oc, ok, om, _), shape_out = build_strided_index(sp, shape, 256)
    ref = np.asarray(sparse_to_dense(
        jnp.ones((B, ok.shape[1], 1), jnp.float32), ok, om,
        shape_out))[..., 0] > 0
    mask = sparse_to_dense(jnp.ones_like(sp.feats[..., :1]),
                           sp.keys, sp.mask, shape)[..., 0] > 0
    got = np.asarray(strided_out_mask(mask, 0))
    np.testing.assert_array_equal(got, ref)


def _encoders(cfg, dense_from, dense_mode):
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder
    ample = dict(voxel_capacity=(4096, 8192, 4096, 2048),
                 zfold_capacity=(4096, 8192, 4096, 2048),
                 # pin the XLA z-band formulation: the round-5
                 # zconv='zwin' default would run interpret-mode
                 # Pallas at these capacities (minutes per conv on
                 # CPU); zwin equivalence has its own small-block
                 # tests in test_zwin.py
                 zconv='zband')
    lc_z = dataclasses.replace(cfg.lidar, backend='zfold', dense_from=4,
                               **ample)
    lc_d = dataclasses.replace(lc_z, dense_from=dense_from,
                               dense_mode=dense_mode)
    return (SparseEncoder(lc_z, cfg.grid, dtype=jnp.float32),
            SparseEncoder(lc_d, cfg.grid, dtype=jnp.float32))


def test_encoder_dense_tail_matches_zfold():
    """Full encoder: dense tail == all-sparse zfold, same params, for both
    conv formulations and several crossover points (incl. 0 = all dense)."""
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch

    cfg = tiny_model_config()
    b = synthetic_batch(cfg, batch_size=2, seed=0)
    enc_z, _ = _encoders(cfg, 4, 'zbatch')
    var = enc_z.init(jax.random.PRNGKey(0), b.points, b.points_mask,
                     train=False)
    ref = enc_z.apply(var, b.points, b.points_mask, train=False)
    for dense_from, mode in ((2, 'zbatch'), (2, 'xla3d'), (0, 'zbatch'),
                             (3, 'zbatch'), (1, 'zbatch')):
        _, enc_d = _encoders(cfg, dense_from, mode)
        got = enc_d.apply(var, b.points, b.points_mask, train=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4,
            err_msg=f'dense_from={dense_from} mode={mode}')


def test_encoder_dense_tail_train_stats_match():
    """BN batch statistics over active cells agree with the sparse path."""
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch

    cfg = tiny_model_config()
    b = synthetic_batch(cfg, batch_size=2, seed=1)
    enc_z, enc_d = _encoders(cfg, 2, 'zbatch')
    var = enc_z.init(jax.random.PRNGKey(0), b.points, b.points_mask,
                     train=False)
    ref, ref_st = enc_z.apply(var, b.points, b.points_mask, train=True,
                              mutable=['batch_stats'])
    got, got_st = enc_d.apply(var, b.points, b.points_mask, train=True,
                              mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    for (kr, vr), (kg, vg) in zip(
            jax.tree_util.tree_leaves_with_path(ref_st),
            jax.tree_util.tree_leaves_with_path(got_st)):
        assert kr == kg
        np.testing.assert_allclose(np.asarray(vg), np.asarray(vr),
                                   rtol=2e-4, atol=2e-4)


def test_encoder_dense_tail_grads_match():
    """Parameter gradients agree between the dense tail and the sparse
    path (same params, same loss), so training may use either backend."""
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch

    cfg = tiny_model_config()
    b = synthetic_batch(cfg, batch_size=1, seed=2)
    enc_z, enc_d = _encoders(cfg, 2, 'zbatch')
    var = enc_z.init(jax.random.PRNGKey(0), b.points, b.points_mask,
                     train=False)

    def loss(enc, v):
        out = enc.apply(v, b.points, b.points_mask, train=False)
        return jnp.sum(out ** 2)

    g_z = jax.grad(lambda v: loss(enc_z, v))(var)
    g_d = jax.grad(lambda v: loss(enc_d, v))(var)
    for (kr, vr), (kg, vg) in zip(
            jax.tree_util.tree_leaves_with_path(g_z),
            jax.tree_util.tree_leaves_with_path(g_d)):
        assert kr == kg
        np.testing.assert_allclose(np.asarray(vg), np.asarray(vr),
                                   rtol=5e-4, atol=5e-4)
