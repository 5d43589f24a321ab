"""Full-size training-step throughput with the barrier-fetch methodology.

The reference records training s/iter via mmengine's BenchmarkHook
(mmdet3d/engine/hooks/benchmark_hook.py:14-38: wall time over iters,
skipping warmup).  On the tunnel-attached TPU, wall-clocking a python loop
measures dispatch, not execution (CLAUDE.md), so this harness enqueues a
burst of steps and barriers by fetching the SCALAR loss of the last one —
device programs run in launch order, so that fetch bounds the whole burst.

Usage:
  python tools/profile_train.py [--steps 8] [--bursts 3] [--accum 8] [--tiny]
Prints one JSON line {train_s_per_iter, ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=8, help='steps per burst')
    ap.add_argument('--bursts', type=int, default=3)
    ap.add_argument('--accum', type=int, default=8,
                    help='gradient accumulation (unified recipe: 8)')
    ap.add_argument('--batch-size', type=int, default=1)
    ap.add_argument('--tiny', action='store_true')
    ap.add_argument('--remat-conv', action=argparse.BooleanOptionalAction,
                    default=True,
                    help='jax.checkpoint each sparse-conv apply so the '
                         'backward recomputes gathers instead of holding '
                         '(B,S,taps*F*Cin) residuals; --no-remat-conv '
                         'reproduces the BENCH.md round-3 OOM')
    args = ap.parse_args()

    import jax
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import (OptimConfig, TrainConfig,
                                      full_model_config, tiny_model_config)
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.train.loop import create_train_state, make_jitted_steps

    model_cfg = tiny_model_config() if args.tiny else full_model_config()
    import dataclasses
    model_cfg = dataclasses.replace(
        model_cfg, lidar=dataclasses.replace(model_cfg.lidar,
                                             remat_conv=args.remat_conv))
    cfg = TrainConfig(model=model_cfg,
                      optim=OptimConfig(accumulate_steps=args.accum))
    batches = [jax.device_put(synthetic_batch(model_cfg, args.batch_size,
                                              seed=s)) for s in range(2)]
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    train_step, _, _ = make_jitted_steps(model, cfg)
    rng = jax.random.PRNGKey(1)

    t0 = time.time()
    state, metrics = train_step(state, batches[0], rng)
    loss0 = float(np.asarray(metrics['loss']))
    print(f'# compile + first step: {time.time() - t0:.1f}s '
          f'loss={loss0:.4f}', flush=True)
    state, metrics = train_step(state, batches[1], rng)
    np.asarray(metrics['loss'])

    best = float('inf')
    for _ in range(args.bursts):
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics = train_step(state, batches[i % 2], rng)
        last = float(np.asarray(metrics['loss']))       # barrier
        best = min(best, (time.perf_counter() - t0) / args.steps)
        time.sleep(2.0)

    out = {'metric': 'fusionocc_train_s_per_iter', 'value': round(best, 3),
           'unit': 's/iter', 'accumulate_steps': args.accum,
           'batch_size': args.batch_size,
           'samples_per_sec': round(args.batch_size / best, 3),
           'remat_conv': args.remat_conv,
           'last_loss': round(last, 4)}
    print(json.dumps(out))


if __name__ == '__main__':
    main()
