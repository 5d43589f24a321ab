"""Interleaved A/B: streaming step with cached vs in-graph pooling index.

Alternates the two programs within the same measurement loop so shared-TPU
contention affects both equally — the honest way to measure the accelerate
path's win on this machine.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np
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
    variables = jax.jit(lambda: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b0, train=False))()
    pool_idx = jax.block_until_ready(jax.jit(
        lambda bb: frame_pooling_index(
            cfg, bb.sensor2keyego[:, 0], bb.intrins[:, 0],
            bb.post_rots[:, 0], bb.post_trans[:, 0], bb.bda))(b0))
    state0 = model.apply(variables, 1, method=FusionOcc.init_streaming_state)

    @jax.jit
    def step_c(v, batch, s, pi):
        pred, _, ns = model.apply(v, batch, s, pool_idx=pi,
                                  method=FusionOcc.predict_streaming)
        return pred, ns

    @jax.jit
    def step_g(v, batch, s):
        pred, _, ns = model.apply(v, batch, s,
                                  method=FusionOcc.predict_streaming)
        return pred, ns

    sc = [state0]
    sg = [state0]

    def run_c(b):
        p, sc[0] = step_c(variables, b, sc[0], pool_idx)
        jax.block_until_ready(p)

    def run_g(b):
        p, sg[0] = step_g(variables, b, sg[0])
        jax.block_until_ready(p)

    for b in batches[:2]:   # compile + warm
        run_c(b), run_g(b)

    lat_c, lat_g = [], []
    for r in range(30):
        b = batches[r % 4]
        t0 = time.perf_counter(); run_c(b); lat_c.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_g(b); lat_g.append(time.perf_counter() - t0)
    mc = float(np.median(lat_c)) * 1000
    mg = float(np.median(lat_g)) * 1000
    print(json.dumps({'streaming_cached_ms': round(mc, 1),
                      'streaming_graph_ms': round(mg, 1),
                      'p10_cached_ms': round(float(np.percentile(lat_c, 10)) * 1000, 1),
                      'p10_graph_ms': round(float(np.percentile(lat_g, 10)) * 1000, 1),
                      'speedup': round(mg / mc, 3)}))


if __name__ == '__main__':
    main()
