"""Static capacities must hold the full-scale active voxel sets.

Round 2 shipped voxel_capacity=(2^17, 2^16, 2^15, 2^14) while the stride-2
dilation grows the stage-1 active set to ~1.8x the input (beam-model cloud:
88k -> 160k -> 83k -> 34k) — stages 1..3 silently truncated ~60% of their
voxels.  This pins capacity >= measured actives with headroom, derived from
the same synthetic cloud the benchmark uses.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.config import full_model_config
from fusionocc_tpu.data.synthetic import synthetic_batch
from fusionocc_tpu.ops.sparse_conv import (_downsample_coords_one,
                                           out_shape_strided)
from fusionocc_tpu.ops.voxelize import voxelize_mean


def test_full_scale_capacities_hold_actives():
    cfg = full_model_config()
    lc = cfg.lidar
    shape = lc.sparse_shape(cfg.grid)
    b = synthetic_batch(cfg, batch_size=1, seed=0)

    sp = jax.jit(functools.partial(
        voxelize_mean, point_cloud_range=cfg.grid.point_cloud_range,
        voxel_size=lc.voxel_size, shape=shape,
        capacity=lc.voxel_capacity[0]))(
        b.points.astype(jnp.float32), b.points_mask)

    coords, mask = sp.coords[0], sp.mask[0]
    n = int(mask.sum())
    assert n <= 0.9 * lc.voxel_capacity[0], (n, lc.voxel_capacity[0])

    cur_shape = shape
    for i in range(1, len(lc.voxel_capacity)):
        shape_out = out_shape_strided(cur_shape)
        # count true output actives with a roomy capacity, then assert the
        # configured one holds them (with some margin for cloud variation)
        probe_cap = lc.voxel_capacity[0] * 2
        oc, okeys, om = jax.jit(functools.partial(
            _downsample_coords_one, shape_in=cur_shape,
            shape_out=shape_out, capacity=probe_cap))(coords, mask)
        n = int(om.sum())
        assert n <= 0.9 * lc.voxel_capacity[i], (
            f'stage {i}: {n} actives vs capacity {lc.voxel_capacity[i]}')
        coords, mask, cur_shape = oc, om, shape_out


def test_zfold_capacities_hold_candidate_supers():
    """zfold_capacity must hold each stage's CANDIDATE super set (the
    super-level dilation rule is a conservative superset — see
    ops/zfold.py): measured 67260/72628/63083/24624 on the beam cloud."""
    cfg = full_model_config()
    lc = cfg.lidar
    shape = lc.sparse_shape(cfg.grid)
    b = synthetic_batch(cfg, batch_size=1, seed=0)

    sp = jax.jit(functools.partial(
        voxelize_mean, point_cloud_range=cfg.grid.point_cloud_range,
        voxel_size=lc.voxel_size, shape=shape,
        capacity=lc.voxel_capacity[0]))(
        b.points.astype(jnp.float32), b.points_mask)

    # super coords at stage 0
    F = lc.zfold
    keys = np.asarray(sp.keys[0][sp.mask[0]])
    skeys = np.unique(keys // F)
    n = len(skeys)
    assert n <= 0.9 * lc.zfold_capacity[0], (n, lc.zfold_capacity[0])

    sshape = (shape[0], shape[1], shape[2] // F)
    sc = np.stack([skeys // (sshape[1] * sshape[2]),
                   (skeys // sshape[2]) % sshape[1],
                   skeys % sshape[2]], -1).astype(np.int32)
    smask = np.ones((n,), bool)
    cur_shape = sshape
    coords, mask = jnp.asarray(sc), jnp.asarray(smask)
    for i in range(1, len(lc.zfold_capacity)):
        shape_out = out_shape_strided(cur_shape)
        probe_cap = lc.zfold_capacity[0] * 2
        oc, okeys, om = jax.jit(functools.partial(
            _downsample_coords_one, shape_in=cur_shape,
            shape_out=shape_out, capacity=probe_cap))(coords, mask)
        nn_ = int(om.sum())
        assert nn_ <= 0.9 * lc.zfold_capacity[i], (
            f'stage {i}: {nn_} candidate supers vs {lc.zfold_capacity[i]}')
        coords, mask, cur_shape = oc, om, shape_out
