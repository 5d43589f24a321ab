"""z-folded sparse backend (ops/zfold.py) vs the COO gather-GEMM path.

The two backends share parameter trees (same module names, same
(27, Cin, Cout) kernels), so the SAME variables must produce the SAME
densified encoder output; plus op-level checks for the regroup, the
lifted weight, and the strided lane mask.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.ops.sparse_conv import (build_subm_index,
                                           sparse_conv_apply,
                                           sparse_to_dense,
                                           stage_indices_table)
from fusionocc_tpu.ops.voxelize import SparseVoxels
from fusionocc_tpu.ops.zfold import (as_sparse, expand_lane_mask,
                                     expand_weight, strided_lane_mask,
                                     super_shape, zband_conv_apply,
                                     zfold_regroup, zfold_to_dense,
                                     zslice_conv_apply)

from test_sparse_conv import _random_sparse


def test_regroup_roundtrip():
    """regroup -> densify must equal the cell-level densify."""
    rng = np.random.RandomState(0)
    shape, B, V, cin = (10, 6, 16), 2, 96, 4
    sp = _random_sparse(rng, B, V, shape, cin, density_pts=120)
    zv = zfold_regroup(sp, shape, capacity=96, fold=8)
    dz = zfold_to_dense(zv, shape, cin)
    dc = sparse_to_dense(sp.feats, sp.keys, sp.mask, shape)
    np.testing.assert_allclose(np.asarray(dz), np.asarray(dc), rtol=1e-6)
    # super keys sorted ascending with sentinel padding
    k = np.asarray(zv.keys)
    m = np.asarray(zv.mask)
    for b in range(B):
        valid = k[b][m[b]]
        assert np.all(np.diff(valid) > 0)
        assert np.all(k[b][~m[b]] == shape[0] * shape[1] * (shape[2] // 8))


def test_expanded_subm_conv_matches_cell_conv():
    """zfold subm conv (super taps + lifted weight) == cell-level conv."""
    rng = np.random.RandomState(1)
    shape, B, V, cin, cout = (8, 7, 16), 2, 96, 3, 5
    sp = _random_sparse(rng, B, V, shape, cin, density_pts=100)
    w = jnp.asarray(rng.randn(27, cin, cout), jnp.float32) * 0.1

    nbr_c = build_subm_index(sp, shape)
    ref = sparse_conv_apply(sp.feats, sp.mask, nbr_c, w)
    ref_d = sparse_to_dense(ref, sp.keys, sp.mask, shape)

    F = 8
    zv = zfold_regroup(sp, shape, capacity=96, fold=F)
    sshape = super_shape(shape, F)
    nbr_s, _ = stage_indices_table(as_sparse(zv), sshape, None)
    w_e = expand_weight(w, F, F, 1)
    out = sparse_conv_apply(zv.feats, zv.mask, nbr_s, w_e)
    out = out * expand_lane_mask(zv.lane_mask, cout, out.dtype)
    got_d = zfold_to_dense(zv._replace(feats=out), shape, cout)

    active = np.asarray(sparse_to_dense(
        jnp.ones_like(sp.feats[..., :1]), sp.keys, sp.mask, shape))[..., 0] > 0
    np.testing.assert_allclose(np.asarray(got_d)[active],
                               np.asarray(ref_d)[active],
                               rtol=1e-4, atol=1e-4)


def test_strided_super_conv_matches_cell_conv():
    """zfold strided conv + exact lane mask == the COO strided conv, on the
    densified grids (the zfold out-super set is a conservative superset of
    the true set; lane masking must zero the difference)."""
    from fusionocc_tpu.ops.sparse_conv import build_strided_index
    rng = np.random.RandomState(2)
    shape, B, V, cin, cout = (12, 10, 16), 2, 128, 3, 4
    sp = _random_sparse(rng, B, V, shape, cin, density_pts=150)
    w = jnp.asarray(rng.randn(27, cin, cout), jnp.float32) * 0.1

    (oc, ok, om, nbr), shape_out = build_strided_index(sp, shape, 256)
    ref = sparse_conv_apply(sp.feats, om, nbr, w)
    ref_d = sparse_to_dense(ref, ok, om, shape_out)

    F = 8
    zv = zfold_regroup(sp, shape, capacity=128, fold=F)
    sshape = super_shape(shape, F)
    _, ((soc, sok, som, snbr), sshape_out) = stage_indices_table(
        as_sparse(zv), sshape, 256)
    f_out = min(F, shape_out[2])
    assert sshape_out == super_shape(shape_out, f_out)
    out_lane = strided_lane_mask(zv.lane_mask, som, snbr, F, f_out)
    w_e = expand_weight(w, F, f_out, 2)
    out = sparse_conv_apply(zv.feats, som, snbr, w_e)
    out = out * expand_lane_mask(out_lane, cout, out.dtype)
    got = zfold_to_dense(
        type(zv)(out, jnp.where(som[..., None], soc, 0), sok, som,
                 out_lane, f_out),
        shape_out, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_d),
                               rtol=1e-4, atol=1e-4)
    # lane mask must reproduce the exact active-cell set
    act_ref = np.asarray(sparse_to_dense(
        jnp.ones_like(ref[..., :1]), ok, om, shape_out))[..., 0] > 0
    act_got = np.asarray(zfold_to_dense(
        type(zv)(jnp.ones_like(out[..., :f_out]).astype(jnp.float32),
                 soc, sok, som, out_lane, f_out),
        shape_out, 1))[..., 0] > 0
    np.testing.assert_array_equal(act_got, act_ref)


def test_zslice_subm_matches_lifted():
    """zslice formulation == lifted-weight formulation (subm, stride 1),
    for every col_chunk."""
    rng = np.random.RandomState(3)
    shape, B, V, cin, cout = (8, 7, 16), 2, 96, 3, 5
    sp = _random_sparse(rng, B, V, shape, cin, density_pts=100)
    w = jnp.asarray(rng.randn(27, cin, cout), jnp.float32) * 0.1
    F = 8
    zv = zfold_regroup(sp, shape, capacity=96, fold=F)
    nbr, _ = stage_indices_table(as_sparse(zv), super_shape(shape, F), None)
    ref = sparse_conv_apply(zv.feats, zv.mask, nbr, expand_weight(w, F, F, 1))
    for cc in (1, 3, 9):
        got = zslice_conv_apply(zv.feats, zv.mask, nbr, w, F, F, 1,
                                col_chunk=cc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_zslice_strided_matches_lifted():
    """zslice == lifted for stride-2 convs, incl. the f_out < f_in case
    (output grid with a single super in z)."""
    rng = np.random.RandomState(4)
    for shape, fold in (((12, 10, 16), 8), ((12, 10, 8), 8)):
        B, V, cin, cout = 2, 128, 3, 4
        sp = _random_sparse(rng, B, V, shape, cin, density_pts=150)
        w = jnp.asarray(rng.randn(27, cin, cout), jnp.float32) * 0.1
        F = min(fold, shape[2])
        zv = zfold_regroup(sp, shape, capacity=128, fold=F)
        _, ((_, _, som, snbr), _) = stage_indices_table(
            as_sparse(zv), super_shape(shape, F), 256)
        from fusionocc_tpu.ops.sparse_conv import out_shape_strided
        f_out = min(fold, out_shape_strided(shape)[2])
        ref = sparse_conv_apply(zv.feats, som, snbr,
                                expand_weight(w, F, f_out, 2))
        got = zslice_conv_apply(zv.feats, som, snbr, w, F, f_out, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_zband_matches_lifted():
    """zband formulation == lifted, subm and strided, incl. f_out < f_in."""
    rng = np.random.RandomState(5)
    shape, B, V, cin, cout = (12, 10, 16), 2, 128, 3, 4
    sp = _random_sparse(rng, B, V, shape, cin, density_pts=150)
    w = jnp.asarray(rng.randn(27, cin, cout), jnp.float32) * 0.1
    F = 8
    zv = zfold_regroup(sp, shape, capacity=128, fold=F)
    nbr, ((_, _, som, snbr), _) = stage_indices_table(
        as_sparse(zv), super_shape(shape, F), 256)
    # subm
    ref = sparse_conv_apply(zv.feats, zv.mask, nbr, expand_weight(w, F, F, 1))
    got = zband_conv_apply(zv.feats, zv.mask, nbr, w, F, F, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # strided
    from fusionocc_tpu.ops.sparse_conv import out_shape_strided
    f_out = min(F, out_shape_strided(shape)[2])
    ref = sparse_conv_apply(zv.feats, som, snbr, expand_weight(w, F, f_out, 2))
    got = zband_conv_apply(zv.feats, som, snbr, w, F, f_out, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # strided down to a single out super in z
    shape2 = (12, 10, 8)
    sp2 = _random_sparse(rng, B, V, shape2, cin, density_pts=150)
    zv2 = zfold_regroup(sp2, shape2, capacity=128, fold=8)
    _, ((_, _, som2, snbr2), _) = stage_indices_table(
        as_sparse(zv2), super_shape(shape2, 8), 256)
    f_out2 = min(8, out_shape_strided(shape2)[2])
    ref = sparse_conv_apply(zv2.feats, som2, snbr2,
                            expand_weight(w, 8, f_out2, 2))
    got = zband_conv_apply(zv2.feats, som2, snbr2, w, 8, f_out2, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_encoder_zfold_zconvs_match_lifted():
    """Full encoder: zconv in ('zslice', 'zband') == 'lifted', same params."""
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder

    cfg = tiny_model_config()
    b = synthetic_batch(cfg, batch_size=2, seed=1)
    lc_l = dataclasses.replace(cfg.lidar, backend='zfold', zconv='lifted')
    enc_l = SparseEncoder(lc_l, cfg.grid, dtype=jnp.float32)
    var = enc_l.init(jax.random.PRNGKey(0), b.points, b.points_mask,
                     train=False)
    ref = enc_l.apply(var, b.points, b.points_mask, train=False)
    for zconv in ('zslice', 'zband'):
        lc = dataclasses.replace(cfg.lidar, backend='zfold', zconv=zconv)
        enc = SparseEncoder(lc, cfg.grid, dtype=jnp.float32)
        got = enc.apply(var, b.points, b.points_mask, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5, err_msg=zconv)


def test_encoder_remat_conv_same_grads():
    """remat_conv=True must not change the encoder's value or gradients
    (it only moves the gather temps out of the jvp residual set)."""
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder

    cfg = tiny_model_config()
    b = synthetic_batch(cfg, batch_size=1, seed=2)
    # remat OFF explicitly for the baseline: inheriting the config default
    # would make this comparison vacuous if the default ever flips
    # (advisor finding, round 3)
    lc = dataclasses.replace(cfg.lidar, backend='zfold', zconv='zband',
                             remat_conv=False)
    lc_r = dataclasses.replace(lc, remat_conv=True)
    enc = SparseEncoder(lc, cfg.grid, dtype=jnp.float32)
    enc_r = SparseEncoder(lc_r, cfg.grid, dtype=jnp.float32)
    var = enc.init(jax.random.PRNGKey(0), b.points, b.points_mask,
                   train=False)

    def loss(e, v):
        out = e.apply(v, b.points, b.points_mask, train=False)
        return jnp.sum(out ** 2)

    g = jax.grad(lambda v: loss(enc, v))(var)
    g_r = jax.grad(lambda v: loss(enc_r, v))(var)
    for (kr, vr), (kg, vg) in zip(
            jax.tree_util.tree_leaves_with_path(g),
            jax.tree_util.tree_leaves_with_path(g_r)):
        assert kr == kg
        np.testing.assert_allclose(np.asarray(vg), np.asarray(vr),
                                   rtol=1e-5, atol=1e-6)


def test_encoder_zfold_matches_coo():
    """Full SparseEncoder: zfold backend == COO backend with the SAME
    parameters (checkpoint interchangeability)."""
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder

    cfg = tiny_model_config()
    b = synthetic_batch(cfg, batch_size=2, seed=0)
    # ample capacities: under overflow the two backends truncate at
    # different granularities (cells vs supers) and can't match bit-wise
    ample = dict(voxel_capacity=(4096, 8192, 4096, 2048),
                 zfold_capacity=(4096, 8192, 4096, 2048),
                 # pin the XLA z-band formulation: the round-5
                 # zconv='zwin' default would run interpret-mode
                 # Pallas at these capacities (minutes per conv on
                 # CPU); zwin equivalence has its own small-block
                 # tests in test_zwin.py
                 zconv='zband')
    lc_coo = dataclasses.replace(cfg.lidar, backend='coo', **ample)
    lc_z = dataclasses.replace(cfg.lidar, backend='zfold', **ample)

    enc_coo = SparseEncoder(lc_coo, cfg.grid, dtype=jnp.float32)
    enc_z = SparseEncoder(lc_z, cfg.grid, dtype=jnp.float32)
    var = enc_coo.init(jax.random.PRNGKey(0), b.points, b.points_mask,
                       train=False)
    ref = enc_coo.apply(var, b.points, b.points_mask, train=False)
    got = enc_z.apply(var, b.points, b.points_mask, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # and the training path (BN batch stats over active cells) agrees
    ref_t, ref_st = enc_coo.apply(var, b.points, b.points_mask, train=True,
                                  mutable=['batch_stats'])
    got_t, got_st = enc_z.apply(var, b.points, b.points_mask, train=True,
                                mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               rtol=2e-4, atol=2e-4)
    for (kr, vr), (kg, vg) in zip(
            jax.tree_util.tree_leaves_with_path(ref_st),
            jax.tree_util.tree_leaves_with_path(got_st)):
        assert kr == kg
        np.testing.assert_allclose(np.asarray(vg), np.asarray(vr),
                                   rtol=2e-4, atol=2e-4)
