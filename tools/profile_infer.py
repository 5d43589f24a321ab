"""Profile full-size inference variants on the real chip.

Measures burst medians for: streaming with cached pooling index, streaming
with in-graph index, and conventional two-pass with cached key index —
quantifying the accelerate-path win (view_transformer.py:175-194 analog).

Usage: python tools/profile_infer.py [--modes s_cached,s_graph,two_cached]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def burst_median(fn, inputs, iters=10, bursts=3, sleep=2.0):
    """Best-burst mean via the shared barrier-fetch helper (per-call wall
    timing without a barrier measures dispatch on the tunnel backend)."""
    from fusionocc_tpu.utils.timing import burst_best_mean
    return burst_best_mean(fn, inputs, iters=iters, bursts=bursts,
                           sleep=sleep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--modes', default='s_cached,s_graph,two_cached')
    ap.add_argument('--iters', type=int, default=10)
    args = ap.parse_args()
    modes = args.modes.split(',')

    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import full_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.fusion_occ import (FusionOcc,
                                                 frame_pooling_index)

    cfg = full_model_config()
    model = FusionOcc(cfg)
    batches = [synthetic_batch(cfg, 1, seed=s) for s in range(4)]
    b0 = batches[0]
    # init takes the batch as an ARGUMENT: closing over it would embed the
    # ~100 MB image tensor as a jit constant (compile hang, CLAUDE.md)
    variables = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(b0)
    results = {}

    pool_idx = None
    if 's_cached' in modes or 'two_cached' in modes:
        t0 = time.perf_counter()
        pool_idx = jax.block_until_ready(jax.jit(
            lambda bb: frame_pooling_index(
                cfg, bb.sensor2keyego[:, 0], bb.intrins[:, 0],
                bb.post_rots[:, 0], bb.post_trans[:, 0], bb.bda))(b0))
        results['pool_index_build_s'] = round(time.perf_counter() - t0, 2)
        print('pool index built', results['pool_index_build_s'], flush=True)

    if 's_cached' in modes:
        state = model.apply(variables, 1,
                            method=FusionOcc.init_streaming_state)

        @jax.jit
        def step_c(v, batch, s, pi):
            pred, _, ns = model.apply(v, batch, s, pool_idx=pi,
                                      method=FusionOcc.predict_streaming)
            return pred, ns

        holder = [state]
        def run(batch):
            pred, holder[0] = step_c(variables, batch, holder[0], pool_idx)
            return pred
        run(b0); run(batches[1])
        results['streaming_cached_ms'] = round(
            burst_median(run, batches, args.iters) * 1000, 1)
        print('s_cached', results['streaming_cached_ms'], flush=True)

    if 's_graph' in modes:
        state = model.apply(variables, 1,
                            method=FusionOcc.init_streaming_state)

        @jax.jit
        def step_g(v, batch, s):
            pred, _, ns = model.apply(v, batch, s,
                                      method=FusionOcc.predict_streaming)
            return pred, ns

        holder = [state]
        def run_g(batch):
            pred, holder[0] = step_g(variables, batch, holder[0])
            return pred
        run_g(b0); run_g(batches[1])
        results['streaming_graph_ms'] = round(
            burst_median(run_g, batches, args.iters) * 1000, 1)
        print('s_graph', results['streaming_graph_ms'], flush=True)

    if 'two_cached' in modes:
        pool_idxs = (pool_idx,) + (None,) * (cfg.num_frame - 1)

        @jax.jit
        def two(v, batch, pi):
            return model.apply(v, batch, pool_idxs=pi,
                               method=FusionOcc.predict)

        def run_t(batch):
            return two(variables, batch, pool_idxs)
        run_t(b0); run_t(batches[1])
        results['twopass_cached_ms'] = round(
            burst_median(run_t, batches, args.iters) * 1000, 1)
        print('two_cached', results['twopass_cached_ms'], flush=True)

    if 'two_graph' in modes:
        @jax.jit
        def two_g(v, batch):
            return model.apply(v, batch, method=FusionOcc.predict)

        def run_tg(batch):
            return two_g(variables, batch)
        run_tg(b0); run_tg(batches[1])
        results['twopass_graph_ms'] = round(
            burst_median(run_tg, batches, args.iters) * 1000, 1)
        print('two_graph', results['twopass_graph_ms'], flush=True)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
