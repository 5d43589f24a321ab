"""Focused on-chip A/B: zwin fused windowed gather-GEMM Pallas kernel
(ops/pallas/zwin_conv.py) vs the zband XLA baseline, full-size encoder
end-to-end at honest capacities.

A trimmed cut of tools/profile_lidar.py (which bisects everything and
takes ~30+ min); this answers ONE question fast: does zwin beat zband,
and at which tiling? Timing uses the sum-reduce barrier
(tools/profile_forward.py rationale — block_until_ready is broken over
the tunnel).
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401
    import numpy as np  # noqa: F401

    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import full_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder
    from fusionocc_tpu.utils.timing import best_call_seconds, scalar_barrier

    cfg = full_model_config()
    lcfg = cfg.lidar
    b = jax.device_put(synthetic_batch(cfg, batch_size=1, seed=0))
    print(f'sparse_shape={lcfg.sparse_shape(cfg.grid)} '
          f'zfold_caps={lcfg.zfold_capacity}', flush=True)

    # all zwin variants now use the block-granular overflow patch
    # (bad blocks recomputed by compacted zband; global fallback only past
    # bad_frac) — span data: tools/check_zwin_spans.py.
    # Round-5 sweep: larger blocks at HELD usable span.  Round 4 showed the
    # kernel is bound by fixed per-op cost (~27 taps x 2 matmuls per block),
    # not window FLOPs; the round-4 b256 row used n2 (256-row usable span,
    # overflow-dominated).  Usable span = (n_win-1)*block_v: b256n4 and
    # b512n3 match/beat b128n6's 640 rows while halving/quartering the
    # block count (fixed cost per conv ~ blocks x taps).
    # Round-5 second sweep, after three changes (all default-on):
    #   - fused eval BN+ReLU+lane-mask kernel epilogue + shared per-stage
    #     window plan (zwin_fuse, zwin_conv.py::zwin_conv_infer)
    #   - dense-conv tail from stage 3 (dense_from=3)
    #   - 3-wide slice-gather tap reads in the index-table builds
    # Earlier round-5 numbers (results/round5_zwin.log, pre-changes):
    # all-sparse unfused 303.6 ms, dense3 unfused 293.5 ms.
    # Third round-5 sweep: the overflow-patch zband pass runs at STATIC
    # capacity ceil(bad_frac*nb) blocks every conv (~42 blocks = 5376
    # compacted rows at b128 bf.0625) whether or not blocks actually
    # overflow — its 27-tap row gathers are a fixed per-conv tax.  Sweep
    # bad_frac down; plan-sharing (zwin_plan) is now default-on.
    base = dict(backend='zfold', zconv='zwin', zwin_nwin=6,
                zwin_bad_frac=0.0625, dense_from=3)
    variants = [
        ('DEFAULT plan+dense3 bf.0625', dict(base)),
        ('bf.03125 (21-block patch)', dict(base, zwin_bad_frac=0.03125)),
        ('bf.015625 (11-block patch)', dict(base, zwin_bad_frac=0.015625)),
        ('bf.0078 (6-block patch)', dict(base, zwin_bad_frac=0.0078125)),
        ('n4 bf.03125', dict(base, zwin_nwin=4, zwin_bad_frac=0.03125)),
        # diagnostic: BN+ReLU stripped from all sparse convs (numbers
        # INVALID — isolates the per-conv XLA elementwise glue share)
        ('NO-BN diagnostic', dict(base, zwin_bad_frac=0.03125,
                                  profile_no_bn=True)),
    ]
    # launch-floor reference: a scalar-output reduce of a small on-device
    # array.  Every single-call row in this tool includes this floor;
    # subtract it to read true device time (it drifts session to session:
    # round-2 measured ~30 ms, interpret today's rows against THIS row).
    small = jax.device_put(np.ones((128, 128), np.float32))
    floor_fn = jax.jit(lambda x: jnp.sum(x) * 1.000001)
    scalar_barrier(floor_fn(small))
    dt = best_call_seconds(floor_fn, small, n=5, warm=False)
    print(f'launch floor (scalar sum)      {dt * 1e3:9.1f} ms', flush=True)

    enc_i = SparseEncoder(dataclasses.replace(lcfg, **variants[0][1]),
                          cfg.grid, dtype=cfg.dtype)
    var = jax.jit(lambda p, m: enc_i.init(
        jax.random.PRNGKey(0), p, m, train=False))(b.points, b.points_mask)
    print('init done', flush=True)

    for label, kw in variants:
        lc = dataclasses.replace(lcfg, **kw)
        enc = SparseEncoder(lc, cfg.grid, dtype=cfg.dtype)
        v_use = var
        if kw.get('profile_no_bn'):   # different param tree: own init
            v_use = jax.jit(lambda p, m, e=enc: e.init(
                jax.random.PRNGKey(0), p, m, train=False))(
                    b.points, b.points_mask)
        enc_fn = jax.jit(lambda v, p, m, e=enc: e.apply(v, p, m,
                                                        train=False))
        try:
            out = enc_fn(v_use, b.points, b.points_mask)
            scalar_barrier(out)
        except Exception as e:
            print(f'{label:28s} FAILED {type(e).__name__}: {str(e)[:300]}',
                  flush=True)
            continue
        dt = best_call_seconds(enc_fn, v_use, b.points, b.points_mask,
                               n=3, warm=False)
        print(f'encoder e2e [{label:28s}] {dt * 1e3:9.1f} ms', flush=True)


if __name__ == '__main__':
    main()
