"""Fused windowed gather-GEMM sparse conv (ops/pallas/zwin_conv.py) vs the
XLA zband path: exact equivalence (the one-hot MXU gather copies rows
bit-for-bit), overflow fallback exactness, and custom-VJP gradients.

Runs the kernel in interpret mode on CPU (same code path as on TPU).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.ops.pallas.zwin_conv import (z_bands, _prepare,
                                                zwin_conv_apply)
from fusionocc_tpu.ops.sparse_conv import stage_indices_table
from fusionocc_tpu.ops.voxelize import SparseVoxels
from fusionocc_tpu.ops.zfold import (as_sparse, expand_weight, super_shape,
                                     zband_conv_apply, zfold_regroup)

from test_sparse_conv import _random_sparse


def _zfold_fixture(rng, shape, B, V, cin, capacity, density_pts):
    sp = _random_sparse(rng, B, V, shape, cin, density_pts=density_pts)
    zv = zfold_regroup(sp, shape, capacity=capacity, fold=8)
    sshape = super_shape(shape, 8)
    return zv, sshape


def test_z_bands_cover_all_taps():
    for f_in, f_out, stride in ((8, 8, 1), (8, 8, 2), (4, 4, 1), (8, 2, 2)):
        bands = z_bands(f_in, f_out, stride)
        n_pairs = sum(1 for zo in range(f_out) for dz in range(3)
                      for ds in range(3)
                      if (stride * zo + dz - 1) // f_in + 1 == ds)
        assert n_pairs == 3 * f_out
        # every nonzero lifted-weight row lies inside its ds band
        w = jnp.asarray(np.random.RandomState(0).randn(27, 2, 3), jnp.float32)
        w_e = np.asarray(expand_weight(w, f_in, f_out, stride))
        w_e = w_e.reshape(9, 3, f_in, 2, f_out * 3)
        for ds, (zi_lo, nzi) in enumerate(bands):
            band = w_e[:, ds]
            outside = np.concatenate(
                [band[:, :zi_lo], band[:, zi_lo + max(nzi, 0):]], axis=1)
            assert np.all(outside == 0.0)


def test_zwin_matches_zband_subm():
    rng = np.random.RandomState(3)
    shape = (10, 6, 16)
    zv, sshape = _zfold_fixture(rng, shape, B=2, V=96, cin=3, capacity=96,
                                density_pts=140)
    nbr, _ = stage_indices_table(as_sparse(zv), sshape, None)
    w = jnp.asarray(rng.randn(27, 3, 5), jnp.float32) * 0.1
    ref = zband_conv_apply(zv.feats, zv.mask, nbr, w, 8, 8, 1)
    for merged in (False, True):
        got = zwin_conv_apply(zv.feats, zv.mask, nbr, w, 8, 8, 1,
                              block_v=8, n_win=4, merged=merged)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f'merged={merged}')


def test_zwin_matches_zband_strided():
    rng = np.random.RandomState(4)
    shape = (12, 10, 16)
    zv, sshape = _zfold_fixture(rng, shape, B=2, V=128, cin=3, capacity=128,
                                density_pts=170)
    _, ((oc, ok, om, snbr), sshape_out) = stage_indices_table(
        as_sparse(zv), sshape, 64)
    w = jnp.asarray(rng.randn(27, 3, 4), jnp.float32) * 0.1
    ref = zband_conv_apply(zv.feats, om, snbr, w, 8, 8, 2)
    for merged in (False, True):
        got = zwin_conv_apply(zv.feats, om, snbr, w, 8, 8, 2,
                              block_v=8, n_win=4, merged=merged)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f'merged={merged}')


def test_zwin_overflow_patch_path_exact():
    """A 1-block window is too small for real neighbor spans: per-block
    overflow flags must fire, and with bad_frac=1.0 the compacted-zband
    patch path must recompute those blocks exactly."""
    rng = np.random.RandomState(5)
    shape = (12, 10, 16)
    zv, sshape = _zfold_fixture(rng, shape, B=1, V=96, cin=2, capacity=96,
                                density_pts=150)
    nbr, _ = stage_indices_table(as_sparse(zv), sshape, None)
    _, _, bad_blk = _prepare(nbr, zv.feats.shape[1], block_v=8, n_win=1)
    n_bad = int(np.asarray(bad_blk).sum())
    assert n_bad > 0, 'fixture must actually overflow a 1-block window'
    assert n_bad < bad_blk.shape[1], \
        'fixture must also exercise non-overflowed kernel blocks'
    w = jnp.asarray(rng.randn(27, 2, 3), jnp.float32) * 0.1
    ref = zband_conv_apply(zv.feats, zv.mask, nbr, w, 8, 8, 1)
    got = zwin_conv_apply(zv.feats, zv.mask, nbr, w, 8, 8, 1,
                          block_v=8, n_win=1, bad_frac=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_zwin_global_fallback_exact():
    """More overflowed blocks than the bad_frac capacity: the whole layer
    must lax.cond to the exact XLA path."""
    rng = np.random.RandomState(5)
    shape = (12, 10, 16)
    zv, sshape = _zfold_fixture(rng, shape, B=1, V=96, cin=2, capacity=96,
                                density_pts=150)
    nbr, _ = stage_indices_table(as_sparse(zv), sshape, None)
    _, _, bad_blk = _prepare(nbr, zv.feats.shape[1], block_v=8, n_win=1)
    nb = bad_blk.shape[1]
    assert int(np.asarray(bad_blk).sum()) > max(1, nb // nb), \
        'fixture must exceed a 1-block bad capacity'
    w = jnp.asarray(rng.randn(27, 2, 3), jnp.float32) * 0.1
    ref = zband_conv_apply(zv.feats, zv.mask, nbr, w, 8, 8, 1)
    got = zwin_conv_apply(zv.feats, zv.mask, nbr, w, 8, 8, 1,
                          block_v=8, n_win=1, bad_frac=1.0 / nb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_zwin_no_overflow_on_fixture():
    """The happy-path fixtures must actually exercise the Pallas branch."""
    rng = np.random.RandomState(3)
    shape = (10, 6, 16)
    zv, sshape = _zfold_fixture(rng, shape, B=2, V=96, cin=3, capacity=96,
                                density_pts=140)
    nbr, _ = stage_indices_table(as_sparse(zv), sshape, None)
    _, _, bad_blk = _prepare(nbr, zv.feats.shape[1], block_v=8, n_win=4)
    assert not bool(np.asarray(bad_blk).any())


def test_zwin_grads_match_zband():
    rng = np.random.RandomState(6)
    shape = (10, 6, 16)
    zv, sshape = _zfold_fixture(rng, shape, B=1, V=96, cin=2, capacity=96,
                                density_pts=120)
    nbr, _ = stage_indices_table(as_sparse(zv), sshape, None)
    w = jnp.asarray(rng.randn(27, 2, 3), jnp.float32) * 0.1

    def loss_zwin(f, w):
        return jnp.sum(zwin_conv_apply(f, zv.mask, nbr, w, 8, 8, 1,
                                       block_v=8, n_win=4) ** 2)

    def loss_zband(f, w):
        return jnp.sum(zband_conv_apply(f, zv.mask, nbr, w, 8, 8, 1) ** 2)

    gf, gw = jax.grad(loss_zwin, argnums=(0, 1))(zv.feats, w)
    rf, rw = jax.grad(loss_zband, argnums=(0, 1))(zv.feats, w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-5, atol=1e-6)


def test_encoder_zwin_matches_zband():
    """Full SparseEncoder wiring: zconv='zwin' == zconv='zband' with the
    same parameters (subm + strided convs, all stages)."""
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder

    cfg = tiny_model_config()
    b = synthetic_batch(cfg, batch_size=1, seed=3)
    lc_ref = dataclasses.replace(cfg.lidar, backend='zfold', zconv='zband')
    lc_win = dataclasses.replace(cfg.lidar, backend='zfold', zconv='zwin',
                                 zwin_block=16, zwin_nwin=4)
    enc_ref = SparseEncoder(lc_ref, cfg.grid, dtype=jnp.float32)
    enc_win = SparseEncoder(lc_win, cfg.grid, dtype=jnp.float32)
    var = enc_ref.init(jax.random.PRNGKey(0), b.points, b.points_mask,
                       train=False)
    ref = enc_ref.apply(var, b.points, b.points_mask, train=False)
    got = enc_win.apply(var, b.points, b.points_mask, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_zwin_static_fallback_shapes():
    """Non-tiling shapes must route to the XLA path (same result)."""
    rng = np.random.RandomState(7)
    shape = (10, 6, 16)
    zv, sshape = _zfold_fixture(rng, shape, B=1, V=96, cin=2, capacity=96,
                                density_pts=100)
    nbr, _ = stage_indices_table(as_sparse(zv), sshape, None)
    w = jnp.asarray(rng.randn(27, 2, 3), jnp.float32) * 0.1
    ref = zband_conv_apply(zv.feats, zv.mask, nbr, w, 8, 8, 1)
    got = zwin_conv_apply(zv.feats, zv.mask, nbr, w, 8, 8, 1,
                          block_v=7, n_win=2)   # 96 % 7 != 0 -> fallback
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_encoder_zwin_fused_epilogue_matches_unfused():
    """Eval-mode fused BN+ReLU+lane-mask kernel epilogue + shared stage
    plan (zwin_fuse=True, ops/pallas/zwin_conv.py::zwin_conv_infer) ==
    the unfused zwin path, all stages sparse (dense_from=4)."""
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder

    cfg = tiny_model_config()
    b = synthetic_batch(cfg, batch_size=1, seed=5)
    base = dataclasses.replace(cfg.lidar, backend='zfold', zconv='zwin',
                               zwin_block=16, zwin_nwin=4, dense_from=4)
    lc_fused = dataclasses.replace(base, zwin_fuse=True)
    lc_plain = dataclasses.replace(base, zwin_fuse=False)
    enc_f = SparseEncoder(lc_fused, cfg.grid, dtype=jnp.float32)
    enc_p = SparseEncoder(lc_plain, cfg.grid, dtype=jnp.float32)
    var = enc_p.init(jax.random.PRNGKey(1), b.points, b.points_mask,
                     train=False)
    # non-trivial BN statistics so the affine really is exercised
    var = jax.tree.map(
        lambda v: v + 0.1 if v.ndim == 1 else v, var)
    ref = enc_p.apply(var, b.points, b.points_mask, train=False)
    got = enc_f.apply(var, b.points, b.points_mask, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
