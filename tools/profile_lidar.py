"""Micro-bisection of the LiDAR branch primitives on the real chip.

Identifies where the lidar-branch latency goes: voxelize sort, neighbor-map
builds (sort-merge vs dense-row-table), gather-GEMMs, densify — plus the
full encoder end-to-end under both index backends.
Timing uses the sum-reduce barrier (see tools/profile_forward.py).

Measured 2026-08-18 (v5e via tunnel, ~30 ms launch floor included in every
row): merge subm build stage0 113.8 ms; row-gather conv 41.0 ms (B=4:
174.7 — linear, volume-bound); block-gather conv 85.9 ms and OOMs the
compile helper at B=4 (pred[B,V,9] temps pad 14.2x) — negative result.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import full_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder
    from fusionocc_tpu.ops import sparse_conv as sc
    from fusionocc_tpu.ops.voxelize import SparseVoxels, voxelize_mean

    from fusionocc_tpu.utils.timing import best_call_seconds, scalar_barrier

    times = {}

    def timed(name, fn, *args, n=3):
        try:
            out = fn(*args)
            scalar_barrier(out)
        except Exception as e:
            print(f'{name:44s} FAILED {type(e).__name__}: {str(e)[:200]}',
                  flush=True)
            return None
        dt = best_call_seconds(fn, *args, n=n, warm=False)
        times[name] = dt
        print(f'{name:44s} {dt * 1e3:9.1f} ms', flush=True)
        return out

    cfg = full_model_config()
    lcfg = cfg.lidar
    shape = lcfg.sparse_shape(cfg.grid)
    pcr = cfg.grid.point_cloud_range
    b = jax.device_put(synthetic_batch(cfg, batch_size=1, seed=0))
    print(f'sparse_shape={shape} point_cap={b.points.shape} '
          f'voxel_caps={lcfg.voxel_capacity}', flush=True)

    vox_fn = jax.jit(lambda p, m: voxelize_mean(
        p.astype(jnp.float32), m, pcr, lcfg.voxel_size, shape,
        lcfg.voxel_capacity[0]))
    sp = timed('voxelize_mean (sort+unique+segmean)', vox_fn,
               b.points, b.points_mask)

    # --- index builds: merge vs table --------------------------------------
    subm_fn = jax.jit(lambda s: sc.build_subm_index(s, shape))
    nbr = timed('merge: build_subm_index stage0', subm_fn, sp)

    stride_fn = jax.jit(lambda s: sc.build_strided_index(
        s, shape, lcfg.voxel_capacity[1])[0])
    timed('merge: build_strided_index stage0->1', stride_fn, sp)

    tab_fn = jax.jit(lambda s: sc.stage_indices_table(
        s, shape, lcfg.voxel_capacity[1])[0])
    timed('table: stage0 subm+strided (all maps)', tab_fn, sp)
    tab1_fn = jax.jit(lambda s: sc.stage_indices_table(s, shape, None)[0])
    timed('table: stage0 subm only', tab1_fn, sp)

    # --- conv applies --------------------------------------------------------
    cin, cout = 16, 16
    f0 = jax.device_put(np.random.rand(
        1, lcfg.voxel_capacity[0], cin).astype(np.float32))
    w = jax.device_put(np.random.rand(27, cin, cout).astype(np.float32))
    conv_fn = jax.jit(lambda f, m, i, w: sc.sparse_conv_apply(f, m, i, w))
    timed('sparse_conv_apply stage0 (gatherGEMM)', conv_fn,
          f0, sp.mask, nbr, w)
    C = 4
    fc = jnp.broadcast_to(f0, (C,) + f0.shape[1:])
    mc = jnp.broadcast_to(sp.mask, (C,) + sp.mask.shape[1:])
    ic = jnp.broadcast_to(nbr, (C,) + nbr.shape[1:])
    timed(f'sparse_conv_apply stage0 B={C}', conv_fn, fc, mc, ic, w)

    # --- zfold-internal bisection ------------------------------------------
    # where the zfold encoder's time goes: regroup, per-stage table builds,
    # per-stage lifted conv applies (random neighbor maps are
    # gather-representative)
    from fusionocc_tpu.ops import zfold as zf
    fold = min(lcfg.zfold, shape[2])
    reg_fn = jax.jit(lambda s: zf.zfold_regroup(
        s, shape, lcfg.zfold_capacity[0], fold))
    zv = timed('zfold: regroup', reg_fn, sp)
    if zv is not None:
        sshape = zf.super_shape(shape, fold)
        ztab_fn = jax.jit(lambda z: sc.stage_indices_table(
            zf.as_sparse(z), sshape, lcfg.zfold_capacity[1])[0])
        timed('zfold: table stage0 (subm+strided)', ztab_fn, zv)
        ztab1_fn = jax.jit(lambda z: sc.stage_indices_table(
            zf.as_sparse(z), sshape, None)[0])
        timed('zfold: table stage0 (subm only)', ztab1_fn, zv)
        rng = np.random.RandomState(0)
        sz_s = shape[2]
        for si, ch in enumerate(lcfg.encoder_channels):
            c_s = ch[0]
            f_s = min(lcfg.zfold, sz_s)
            S = lcfg.zfold_capacity[si]
            fz = jax.device_put(rng.rand(1, S, f_s * c_s).astype(np.float32))
            wz = jax.device_put(np.asarray(zf.expand_weight(
                jnp.asarray(rng.rand(27, c_s, c_s).astype(np.float32)),
                f_s, f_s, 1)))
            nbrz = jax.device_put(
                rng.randint(0, S, size=(1, S, 27)).astype(np.int32))
            mz = jax.device_put(np.ones((1, S), bool))
            timed(f'zfold: subm conv stage{si} (S={S}, {f_s}x{c_s})',
                  conv_fn, fz, mz, nbrz, wz)
            sz_s //= 2

    # --- full encoder end-to-end: zconv A/B + zfold vs coo ------------------
    import dataclasses
    variants = [('zfold/zwin', dict(backend='zfold', zconv='zwin')),
                ('zfold/zwin v256k2',
                 dict(backend='zfold', zconv='zwin', zwin_block=256,
                      zwin_nwin=2)),
                ('zfold/zwin v128k6',
                 dict(backend='zfold', zconv='zwin', zwin_nwin=6)),
                ('zfold/zwin v256k3',
                 dict(backend='zfold', zconv='zwin', zwin_block=256,
                      zwin_nwin=3)),
                ('zfold/zband', dict(backend='zfold', zconv='zband')),
                ('zfold/lifted', dict(backend='zfold', zconv='lifted')),
                ('zfold/lifted tap_chunk=0',
                 dict(backend='zfold', zconv='lifted', tap_chunk=0)),
                ('zfold/zslice cc=9', dict(backend='zfold', zconv='zslice',
                                           col_chunk=9))]
    # all backends share one parameter tree (checkpoint interchangeability)
    enc_i = SparseEncoder(dataclasses.replace(lcfg, **variants[0][1]),
                          cfg.grid, dtype=cfg.dtype)
    var = jax.jit(lambda p, m: enc_i.init(
        jax.random.PRNGKey(0), p, m, train=False))(b.points, b.points_mask)
    for label, kw in variants:
        lc = dataclasses.replace(lcfg, **kw)
        enc = SparseEncoder(lc, cfg.grid, dtype=cfg.dtype)
        enc_fn = jax.jit(lambda v, p, m, e=enc: e.apply(v, p, m,
                                                        train=False))
        timed(f'encoder end-to-end [{label}]', enc_fn,
              var, b.points, b.points_mask)
        # chunk-folded: streaming time-fold runs the encoder at B=chunk
        if label == 'zfold/zband':
            pc = jnp.broadcast_to(b.points, (4,) + b.points.shape[1:])
            mc2 = jnp.broadcast_to(b.points_mask,
                                   (4,) + b.points_mask.shape[1:])
            timed(f'encoder end-to-end [{label}] B=4', enc_fn, var, pc, mc2)

    # --- zfold stage bisection: cumulative truncated encoders --------------
    # successive deltas cancel the ~30 ms launch floor and measure each
    # phase with REAL data and REAL neighbor maps (config.stop_after)
    lc0 = dataclasses.replace(lcfg, backend='zfold')
    var0 = var
    stops = ['vox', 'regroup', 'table0', 'stage0', 'table1', 'stage1',
             'table2', 'stage2', 'stage3', '']
    prev = 0.0
    for stop in stops:
        lc = dataclasses.replace(lc0, stop_after=stop)
        enc = SparseEncoder(lc, cfg.grid, dtype=cfg.dtype)
        fn = jax.jit(lambda v, p, m, e=enc: e.apply(v, p, m, train=False))
        name = f'zfold cumulative [{stop or "full"}]'
        timed(name, fn, var0, b.points, b.points_mask)
        if name in times:
            print(f'    delta: {(times[name] - prev) * 1e3:9.1f} ms',
                  flush=True)
            prev = times[name]

    final_shape = tuple(s // 8 for s in shape[:2]) + (shape[2] // 8,)
    v3 = lcfg.voxel_capacity[3]
    f3 = jax.device_put(np.random.rand(1, v3, 32).astype(np.float32))
    k3 = jax.device_put(np.sort(np.random.choice(
        final_shape[0] * final_shape[1] * final_shape[2], v3,
        replace=False)).astype(np.int32)[None])
    m3 = jax.device_put(np.ones((1, v3), bool))
    dense_fn = jax.jit(lambda f, k, m: sc.sparse_to_dense(
        f, k, m, final_shape))
    timed('sparse_to_dense final (640k srch)', dense_fn, f3, k3, m3)


if __name__ == '__main__':
    main()
