"""Two-pass eval throughput vs batch size on the real chip.

The reference evaluates at samples_per_gpu=1 (configs/fusion_occ.py:58);
on this chip the ~30 ms program-launch floor and the LiDAR branch's
latency-bound sorts (B=8 sort costs ~B=1) mean batching samples per
program raises fps/chip even for the conventional two-pass forward
(fusion_occ.py:289-316 eval semantics, both temporal frames through the
camera branch).  Reports an fps-vs-batch table; the best honest batch
belongs in BENCH.md next to the streaming headline.

Usage: python tools/ab_twopass_batch.py [--batches 1,2,4] [--iters 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', default='1,2,4')
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--tiny', action='store_true',
                    help='tiny shapes on CPU: smoke-test the flow only')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    if args.tiny:
        jax.config.update('jax_platforms', 'cpu')

    from fusionocc_tpu.config import full_model_config, tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.fusion_occ import (
        FusionOcc, batched_frames_pooling_index)
    from fusionocc_tpu.ops.bev_pool import trim_pooling_index
    from fusionocc_tpu.utils.timing import burst_best_mean

    cfg = tiny_model_config() if args.tiny else full_model_config()
    model = FusionOcc(cfg)
    b1 = jax.device_put(synthetic_batch(cfg, 1, seed=0))
    variables = jax.jit(
        lambda b: model.init({'params': jax.random.PRNGKey(0),
                              'dropout': jax.random.PRNGKey(1)},
                             b, train=False))(b1)
    del b1

    table = {}
    for B in [int(x) for x in args.batches.split(',')]:
        try:
            batches = [jax.device_put(synthetic_batch(cfg, B, seed=s))
                       for s in range(2)]

            pool = trim_pooling_index(jax.block_until_ready(jax.jit(
                lambda bb: batched_frames_pooling_index(cfg, bb))(
                    batches[0])))

            @jax.jit
            def step(v, b, pi):
                return model.apply(v, b, batch_frames=True,
                                   pool_idx_folded=pi,
                                   method=FusionOcc.predict)

            def run(b):
                return step(variables, b, pool)

            np.asarray(run(batches[0]))
            np.asarray(run(batches[1]))
            dt = burst_best_mean(run, batches, iters=args.iters) / B
            table[B] = dt
            print(f'B={B}: {dt * 1e3:8.1f} ms/frame  ({1.0 / dt:.3f} fps)',
                  flush=True)
            del batches
        except Exception as e:   # OOM at large B: report what works
            print(f'# B={B} failed: {type(e).__name__}: {e}', flush=True)

    if table:
        best = min(table, key=table.get)
        print(json.dumps({
            'twopass_fps_by_batch': {str(k): round(1.0 / v, 3)
                                     for k, v in table.items()},
            'best_batch': best,
            'best_fps': round(1.0 / table[best], 3),
        }))


if __name__ == '__main__':
    main()
