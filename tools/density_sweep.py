"""Capacity / overflow robustness on denser-than-benchmark clouds
(VERDICT r4 item 7).

All honest capacities and the zwin overflow budget were tuned on the
synthetic benchmark cloud; real nuScenes density could shift both.  This
tool runs the voxelize -> stage pyramid at 1x / 1.5x / 2x the benchmark
point count and reports, per stage:

  - true actives vs voxel/zfold capacity (silent-truncation check);
  - zwin bad-block fraction vs the zwin_bad_frac patch budget and
    whether the whole-layer fallback would fire;
  - encoder e2e latency at each density (static shapes per density).

Run on the TPU (bash tools/run_onchip.sh queues it).  Results table goes
to BENCH.md; the capacity pins live in tests/test_capacity.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import full_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder
    from fusionocc_tpu.ops import sparse_conv as sc
    from fusionocc_tpu.ops import zfold as zf
    from fusionocc_tpu.ops.pallas.zwin_conv import zwin_plan
    from fusionocc_tpu.ops.voxelize import voxelize_mean
    from fusionocc_tpu.utils.timing import best_call_seconds, scalar_barrier

    cfg = full_model_config()
    lcfg = cfg.lidar
    shape = lcfg.sparse_shape(cfg.grid)
    pcr = cfg.grid.point_cloud_range
    fold = min(lcfg.zfold, shape[2])
    base_pts = lcfg.point_capacity

    enc = SparseEncoder(lcfg, cfg.grid, dtype=cfg.dtype)

    for scale in (1.0, 1.5, 2.0):
        n_pts = int(base_pts * scale)
        # denser cloud at the SAME scene extent: more points -> more
        # unique occupied voxels (beam pattern keeps realistic clustering)
        cfg_d = dataclasses.replace(
            cfg, lidar=dataclasses.replace(lcfg, point_capacity=n_pts))
        b = jax.device_put(synthetic_batch(cfg_d, batch_size=1, seed=0))
        print(f'--- density x{scale}: {n_pts} points ---', flush=True)

        @jax.jit
        def stage_stats(points, mask):
            sp = voxelize_mean(points.astype(jnp.float32), mask, pcr,
                               lcfg.voxel_size, shape,
                               lcfg.voxel_capacity[0])
            out = {'actives0': sp.mask.sum()}
            zv = zf.zfold_regroup(sp, shape, lcfg.zfold_capacity[0], fold)
            out['supers0'] = zv.mask.sum()
            cur = zf.as_sparse(zv)
            cells = shape
            for i in range(4):
                sshape = zf.super_shape(cells, fold)
                down = None if i == 3 else lcfg.zfold_capacity[i + 1]
                nbr, strided = sc.stage_indices_table(cur, sshape, down)
                plan = zwin_plan(nbr, cur.keys.shape[1], lcfg.zwin_block,
                                 lcfg.zwin_nwin, lcfg.zwin_bad_frac)
                nb = nbr.shape[1] // lcfg.zwin_block
                out[f'bad_blocks{i}'] = plan.n_bad
                out[f'bad_cap{i}'] = plan.bad_ids.shape[1]
                out[f'nb{i}'] = nb
                if strided is None:
                    break
                (oc, okeys, om, _), _ = strided
                out[f'supers{i + 1}'] = om.sum()
                cur = type(cur)(jnp.zeros(om.shape + (1,), jnp.float32),
                                jnp.where(om[..., None], oc, 0), okeys, om)
                cells = sc.out_shape_strided(cells)
            return out

        stats = jax.device_get(stage_stats(b.points, b.points_mask))
        for i in range(4):
            cap = lcfg.zfold_capacity[i]
            sup = int(stats.get(f'supers{i}', -1))
            trunc = ' TRUNCATED!' if sup >= cap else ''
            line = (f'  stage{i}: supers {sup}/{cap}'
                    f' ({sup / cap:5.1%}){trunc}')
            if f'bad_blocks{i}' in stats:
                bb = int(stats[f'bad_blocks{i}'])
                bc = int(stats[f'bad_cap{i}'])
                nb = int(stats[f'nb{i}'])
                fb = ' -> WHOLE-LAYER FALLBACK' if bb > bc else ''
                line += f'  zwin bad {bb}/{nb} blocks (cap {bc}){fb}'
            print(line, flush=True)

        var = jax.jit(lambda p, m: enc.init(
            jax.random.PRNGKey(0), p, m, train=False))(
                b.points, b.points_mask)
        fn = jax.jit(lambda v, p, m: enc.apply(v, p, m, train=False))
        out = fn(var, b.points, b.points_mask)
        scalar_barrier(out)
        dt = best_call_seconds(fn, var, b.points, b.points_mask, n=3,
                               warm=False)
        print(f'  encoder e2e: {dt * 1e3:9.1f} ms', flush=True)


if __name__ == '__main__':
    main()
