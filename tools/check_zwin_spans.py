"""Diagnose the zwin kernel's window-overflow behavior on the benchmark
cloud: for every conv layer's neighbor map (subm + strided, all stages),
compute the per-block neighbor-row spans and the overflow flag for a grid
of (block_v, n_win) tilings.

If overflow=True for a layer, zwin_conv_apply lax.cond's to the XLA zband
path for that WHOLE layer — so 'zwin ~= zband + prepare cost' in the A/B
means the windows are too small, and this tool says how big they must be.
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
    from fusionocc_tpu.ops import sparse_conv as sc
    from fusionocc_tpu.ops import zfold as zf
    from fusionocc_tpu.ops.voxelize import voxelize_mean
    from fusionocc_tpu.ops.sparse_conv import out_shape_strided

    cfg = full_model_config()
    lcfg = cfg.lidar
    shape = lcfg.sparse_shape(cfg.grid)
    b = jax.device_put(synthetic_batch(cfg, batch_size=1, seed=0))

    sp = jax.jit(lambda p, m: voxelize_mean(
        p.astype(jnp.float32), m, cfg.grid.point_cloud_range,
        lcfg.voxel_size, shape, lcfg.voxel_capacity[0]))(
            b.points, b.points_mask)
    fold = min(lcfg.zfold, shape[2])
    zv = jax.jit(lambda s: zf.zfold_regroup(
        s, shape, lcfg.zfold_capacity[0], fold))(sp)
    zv = zv._replace(fold=fold)  # jit returns the static fold as a tracer

    tilings = [(128, 2), (128, 4), (128, 6), (128, 8), (256, 2), (256, 3),
               (256, 4), (512, 2), (512, 3)]

    def span_stats(nbr_idx, s_in, label):
        """Per-block max neighbor span (rows) for each block_v; then the
        overflow verdict per tiling (window usable rows = n_win*block_v
        from an aligned-down base, exactly _prepare's logic)."""
        nbr = np.asarray(nbr_idx)[0]              # (S, 27)
        found = nbr < s_in
        print(f'\n{label}: s_out={nbr.shape[0]} s_in={s_in} '
              f'found={found.mean():.3f}')
        for block_v in (128, 256, 512):
            s_out = nbr.shape[0]
            nb = s_out // block_v
            if nb * block_v != s_out:
                print(f'  block_v={block_v}: s_out not divisible'); continue
            r = nbr[:nb * block_v].reshape(nb, block_v, 3, 9)
            f = found[:nb * block_v].reshape(nb, block_v, 3, 9)
            big = 2 ** 30
            lo = np.where(f, r, big).min(axis=(1, 3))       # (nb, 3)
            hi = np.where(f, r, -1).max(axis=(1, 3))        # (nb, 3)
            base = np.clip(lo // block_v, 0, None) * block_v
            span = np.where(hi >= 0, hi - base + 1, 0)      # rows needed
            mx = span.max()
            q = np.percentile(span, [50, 99])
            verdicts = []
            for bv, nw in tilings:
                if bv != block_v:
                    continue
                # span is measured from the aligned-down base, so this is
                # exactly the kernel's per-block bad condition
                bad = (span > nw * block_v).mean(axis=None)
                verdicts.append(f'n{nw}:{bad * 100:.1f}%')
            print(f'  block_v={block_v}: span p50={q[0]:.0f} '
                  f'p99={q[1]:.0f} max={mx}  bad% {" ".join(verdicts)}')

    cur_cells = shape
    num_stages = len(lcfg.encoder_channels)
    for i in range(num_stages):
        last = i == num_stages - 1
        sshape = zf.super_shape(cur_cells, zv.fold)
        down_cap = None if last else lcfg.zfold_capacity[i + 1]
        nbr, strided = jax.jit(
            lambda s, ss=sshape, dc=down_cap: sc.stage_indices_table(
                s, ss, dc))(zf.as_sparse(zv))
        s_in = zv.feats.shape[1]
        span_stats(nbr, s_in, f'stage{i} subm (S={s_in})')
        if not last:
            (oc, okeys, om, snbr), _ = strided
            span_stats(snbr, s_in, f'stage{i} strided')
            out_cells = out_shape_strided(cur_cells)
            f_out = min(lcfg.zfold, out_cells[2])
            out_lane = zf.strided_lane_mask(zv.lane_mask, om, snbr,
                                            zv.fold, f_out)
            feats = jnp.zeros(
                (1, om.shape[1], f_out * 1), jnp.float32)
            zv = zf.ZFoldVoxels(feats, jnp.where(om[..., None], oc, 0),
                                okeys, om, out_lane, f_out)
            cur_cells = out_cells


if __name__ == '__main__':
    main()
