"""On-chip bisection of the per-stage index-table builds (VERDICT r4 #3).

The round-4 zbisect showed ~43 ms/frame of table cost (table0 alone
26.6 ms) rebuilt every frame.  This tool breaks table0..3 into their
constituent ops on REAL regrouped voxels so the hot part is known
before optimizing:

  - _row_table_one        (dense cell->row scatter, n_cells fill)
  - subm _index_from_table_one   (27 gathers)
  - _downsample_out_set_table_one (occ scatter + cumsum + searchsorted)
  - strided _index_from_table_one
  - stage_indices_table end-to-end per stage

Timing: sum-reduce barrier (see tools/profile_forward.py — the only
trustworthy timing over the axon tunnel).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np  # noqa: F401

    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import full_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder
    from fusionocc_tpu.ops import sparse_conv as sc
    from fusionocc_tpu.ops import zfold as zf
    from fusionocc_tpu.utils.timing import best_call_seconds, scalar_barrier
    import dataclasses

    cfg = full_model_config()
    lcfg = dataclasses.replace(cfg.lidar, backend='zfold')
    shape = lcfg.sparse_shape(cfg.grid)
    b = jax.device_put(synthetic_batch(cfg, batch_size=1, seed=0))

    def timed(name, fn, *args, n=3):
        try:
            out = fn(*args)
            scalar_barrier(out)
        except Exception as e:
            print(f'{name:52s} FAILED {type(e).__name__}: {str(e)[:160]}',
                  flush=True)
            return None
        dt = best_call_seconds(fn, *args, n=n, warm=False)
        print(f'{name:52s} {dt * 1e3:9.2f} ms', flush=True)
        return out

    # real voxel sets per stage: run the encoder truncated at each stage
    # to capture coords/keys/masks with real statistics
    enc = SparseEncoder(lcfg, cfg.grid, dtype=cfg.dtype)
    var = jax.jit(lambda p, m: enc.init(
        jax.random.PRNGKey(0), p, m, train=False))(b.points, b.points_mask)
    print('init done', flush=True)

    # regroup -> stage-0 super voxels
    from fusionocc_tpu.ops.voxelize import voxelize_mean
    pcr = cfg.grid.point_cloud_range
    vox_fn = jax.jit(lambda p, m: voxelize_mean(
        p.astype(jnp.float32), m, pcr, lcfg.voxel_size, shape,
        lcfg.voxel_capacity[0]))
    sp = vox_fn(b.points, b.points_mask)
    fold = min(lcfg.zfold, shape[2])
    zv = jax.jit(lambda s: zf.zfold_regroup(
        s, shape, lcfg.zfold_capacity[0], fold))(sp)

    # walk the stage pyramid, timing each component at each stage's
    # real active set
    cur = zf.as_sparse(zv)
    cur_cells = shape
    for i in range(4):
        sshape = zf.super_shape(cur_cells, fold)
        n_cells = sshape[0] * sshape[1] * sshape[2]
        v_in = cur.keys.shape[1]
        down_cap = None if i == 3 else lcfg.zfold_capacity[i + 1]
        print(f'--- stage{i}: sshape={sshape} n_cells={n_cells/1e6:.1f}M '
              f'V={v_in} ---', flush=True)

        rt_fn = jax.jit(lambda k, m, nc=n_cells: jax.vmap(
            lambda kk, mm: sc._row_table_one(kk, mm, nc))(k, m))
        table = timed('row_table (fill+scatter)', rt_fn, cur.keys, cur.mask)

        subm_fn = jax.jit(lambda t, c, m, ss=sshape, vi=v_in: jax.vmap(
            lambda tt, cc, mm: sc._index_from_table_one(
                tt, cc, mm, ss, 1, vi))(t, c, m))
        timed('subm index_from_table (27 gathers)', subm_fn,
              table, cur.coords, cur.mask)

        if down_cap is not None:
            so = sc.out_shape_strided(sshape)
            dn_fn = jax.jit(lambda c, m, soo=so, cap=down_cap: jax.vmap(
                lambda cc, mm: sc._downsample_out_set_table_one(
                    cc, mm, soo, cap))(c, m))
            down = timed('downsample_out_set (occ+cumsum+ss)', dn_fn,
                         cur.coords, cur.mask)
            if down is not None:
                oc, okeys, om = down
                st_fn = jax.jit(lambda t, c, m, ss=sshape, vi=v_in: jax.vmap(
                    lambda tt, cc, mm: sc._index_from_table_one(
                        tt, cc, mm, ss, 2, vi))(t, c, m))
                timed('strided index_from_table', st_fn, table, oc, om)

        full_fn = jax.jit(lambda s, ss=sshape, dc=down_cap:
                          sc.stage_indices_table(s, ss, dc)[0])
        timed('stage_indices_table END-TO-END', full_fn, cur)

        if down_cap is None:
            break
        # advance to the next stage's REAL active set
        adv = jax.jit(lambda s, ss=sshape, dc=down_cap:
                      sc.stage_indices_table(s, ss, dc)[1][0])
        oc, okeys, om, _ = adv(cur)
        cur = type(cur)(jnp.zeros(om.shape + (1,), jnp.float32),
                        jnp.where(om[..., None], oc, 0), okeys, om)
        cur_cells = sc.out_shape_strided(cur_cells)


if __name__ == '__main__':
    main()
