"""Per-piece latency of the tile sparse-conv backend on the real chip.

Times each jitted piece of the tile pipeline (fold, neighbor build, each
stage's subm convs and strided prepare/apply, densify) with the
barrier-fetch method, to locate where the end-to-end 3.6 s (f32, round-3
first measurement) goes.  Usage: python tools/profile_tile_stages.py [bf16]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import full_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.ops import tile_sparse as tsp
    from fusionocc_tpu.ops.voxelize import voxelize_mean

    dtype = jnp.bfloat16 if 'bf16' in sys.argv[1:] else jnp.float32
    from fusionocc_tpu.utils.timing import best_call_seconds, scalar_barrier

    def timed(name, fn, *args, n=3):
        fn_j = jax.jit(fn)
        scalar_barrier(fn_j(*args))
        dt = best_call_seconds(fn_j, *args, n=n, warm=False)
        print(f'{name:34s} {dt * 1e3:9.1f} ms', flush=True)
        return fn_j(*args)

    cfg = full_model_config()
    lc = cfg.lidar
    ts = lc.tile_size
    shape = lc.sparse_shape(cfg.grid)
    b = jax.device_put(synthetic_batch(cfg, batch_size=1, seed=0))

    sp = timed('voxelize(tile-major)', functools.partial(
        voxelize_mean, point_cloud_range=cfg.grid.point_cloud_range,
        voxel_size=lc.voxel_size, shape=shape,
        capacity=lc.voxel_capacity[0], tile_size=ts),
        b.points.astype(jnp.float32), b.points_mask)

    feats = sp.feats.astype(dtype)
    rng = np.random.RandomState(0)

    tv = timed('tiles_from_sorted', functools.partial(
        tsp.tiles_from_sorted, shape=shape, capacity=lc.tile_capacity[0],
        ts=ts), feats, sp.keys, sp.mask)

    # stage channel plan: conv_input 5->16 happens in COO form upstream;
    # emulate with 16-channel features from the start
    chans = [c[-1] for c in lc.encoder_channels]   # (16, 32, 48, 64)-ish
    cin0 = lc.encoder_channels[0][0]
    f16 = jnp.tile(tv.feats, (1, 1, 1, 1, -(-cin0 // feats.shape[-1])))
    f16 = f16[..., :ts * cin0]
    tv = tv._replace(feats=f16.astype(dtype))

    cur_shape = shape
    cin = cin0
    for i, blocks in enumerate(lc.encoder_channels):
        nbr = timed(f'stage{i} neighbor_slots',
                    functools.partial(tsp.neighbor_slots,
                                      tgrid=tsp.tile_grid(cur_shape, ts)), tv)
        n_subm = len(blocks) - 1 if i < len(lc.encoder_channels) - 1 \
            else len(blocks)
        for j in range(n_subm):
            w = jnp.asarray(rng.randn(27, cin, blocks[j]), dtype) * 0.05
            f = timed(f'stage{i} subm{j} {cin}->{blocks[j]}',
                      tsp.tile_subm_conv, tv.feats, tv.mask, nbr, w)
            tv = tv._replace(feats=f)
            cin = blocks[j]
        if i < len(lc.encoder_channels) - 1:
            from fusionocc_tpu.ops.sparse_conv import out_shape_strided
            geom, _ = timed(
                f'stage{i} strided_prepare',
                functools.partial(tsp.tile_strided_prepare,
                                  shape_in=cur_shape,
                                  capacity_out=lc.tile_capacity[i + 1]), tv)
            out_shape = out_shape_strided(cur_shape)
            w = jnp.asarray(rng.randn(27, cin, blocks[-1]), dtype) * 0.05
            f = timed(f'stage{i} strided_apply {cin}->{blocks[-1]}',
                      tsp.tile_strided_apply, tv.feats, geom, w)
            tv = tsp.TileVoxels(f, geom.out_mask, geom.tile_coords,
                                geom.tile_keys, geom.tile_mask, geom.table)
            cur_shape = out_shape
            cin = blocks[-1]

    timed('tiles_to_dense', functools.partial(tsp.tiles_to_dense,
                                              shape=cur_shape), tv)


if __name__ == '__main__':
    main()
