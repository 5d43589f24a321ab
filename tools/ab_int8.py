"""A/B the int8 MXU image-backbone serving mode on the real chip.

Measures the full-size two-pass forward (reference eval semantics,
fusion_occ.py:289-316 analog) with the image backbone's Dense matmuls in
bf16 vs real int8 x int8 -> int32 MXU ops (quant.int8_dot_general), same
parameters (weights are quantized inline at dot time, so the A/B is
apples-to-apples).  Reports ms/frame, fps, and the logit drift between the
two modes — the engine-level counterpart of the reference's TRT
--int8-engines path (tools/test.py:162-168, precision_utils.py:30-131).

Usage: python tools/ab_int8.py [--iters 6] [--streaming]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=6)
    ap.add_argument('--streaming', action='store_true',
                    help='A/B the time-folded streaming step instead of '
                         'the two-pass forward')
    ap.add_argument('--tiny', action='store_true',
                    help='tiny shapes on CPU: smoke-test the flow, '
                         'numbers meaningless')
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
    cfg8 = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, int8_dense=True))
    batches = [jax.device_put(synthetic_batch(cfg, 1, seed=s))
               for s in range(4)]
    b0 = batches[0]

    model = FusionOcc(cfg)
    variables = jax.jit(
        lambda b: model.init({'params': jax.random.PRNGKey(0),
                              'dropout': jax.random.PRNGKey(1)},
                             b, train=False))(b0)

    pool_two = trim_pooling_index(jax.block_until_ready(jax.jit(
        lambda bb: batched_frames_pooling_index(cfg, bb))(b0)))

    results = {}
    logits = {}
    for tag, c in (('bf16', cfg), ('int8', cfg8)):
        m = FusionOcc(c)

        @jax.jit
        def two_step(v, b, pi, m=m):
            return m.apply(v, b, batch_frames=True, pool_idx_folded=pi,
                           method=FusionOcc.predict)

        def run(b, step=two_step):
            return step(variables, b, pool_two)

        np.asarray(run(b0))           # compile + warm
        np.asarray(run(batches[1]))
        dt = burst_best_mean(run, batches, iters=args.iters)
        results[tag] = dt
        # prediction agreement on one batch (predict returns class ids)
        logits[tag] = np.asarray(run(b0))
        print(f'{tag}: {dt * 1e3:8.1f} ms/frame  ({1.0 / dt:.3f} fps)',
              flush=True)

    agree = float((logits['bf16'] == logits['int8']).mean())
    out = {
        'bf16_ms': round(results['bf16'] * 1e3, 1),
        'int8_ms': round(results['int8'] * 1e3, 1),
        'speedup': round(results['bf16'] / results['int8'], 3),
        'argmax_agreement': round(agree, 4),
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
