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
                                     super_shape, zfold_regroup,
                                     zfold_to_dense)

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
                 zfold_capacity=(4096, 8192, 4096, 2048))
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
