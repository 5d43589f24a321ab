"""Sweep the batched-streaming chunk size on the real chip.

predict_streaming_batch folds the T-frame clip into the batch axis in
chunks; bigger chunks amortize launch floors and latency-bound ops but cost
HBM.  Prints ms/frame per chunk plus the scan baseline.
Usage: python tools/profile_streaming.py [T] [chunk,chunk,...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import full_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.fusion_occ import (
        FusionOcc, frame_pooling_index, streaming_fold_pooling_index)
    from fusionocc_tpu.ops.bev_pool import trim_pooling_index

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    # each entry: "chunk" or "chunk:cam_chunk" (camera microbatch)
    spec = (sys.argv[2].split(',') if len(sys.argv) > 2
            else ['2', '4', '8', '8:2', '8:4'])
    chunks = []
    for e in spec:
        c, _, cc = e.partition(':')
        chunks.append((int(c), int(cc) if cc else 0))

    cfg = full_model_config()
    model = FusionOcc(cfg)
    batches = [jax.device_put(synthetic_batch(cfg, batch_size=1, seed=s))
               for s in range(T)]
    b0 = batches[0]
    variables = jax.jit(
        lambda b: model.init({'params': jax.random.PRNGKey(0),
                              'dropout': jax.random.PRNGKey(1)},
                             b, train=False))(b0)
    state0 = model.apply(variables, 1, method=FusionOcc.init_streaming_state)
    stacked = jax.device_put(jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], 0), *batches))
    resets = jax.device_put(np.zeros((T, 1), bool))

    from fusionocc_tpu.utils.timing import best_call_seconds

    def timeit(run, iters=3):
        return best_call_seconds(run, n=iters)

    # scan baseline
    pool1 = trim_pooling_index(jax.block_until_ready(jax.jit(
        lambda bb: frame_pooling_index(
            cfg, bb.sensor2keyego[:, 0], bb.intrins[:, 0],
            bb.post_rots[:, 0], bb.post_trans[:, 0], bb.bda))(b0)))

    @jax.jit
    def scan_step(v, f, s, r, pi):
        return model.apply(v, f, s, resets=r, pool_idx=pi,
                           method=FusionOcc.predict_streaming_scan)

    dt = timeit(lambda: scan_step(variables, stacked, state0, resets,
                                  pool1)[0])
    print(f'scan             {dt / T * 1e3:8.1f} ms/frame '
          f'({dt * 1e3:.0f} total)', flush=True)

    for chunk, cam_chunk in chunks:
        pool_c = trim_pooling_index(jax.block_until_ready(jax.jit(
            lambda st, c=chunk, cc=cam_chunk:
            streaming_fold_pooling_index(cfg, st, c, cc))(stacked)))

        @jax.jit
        def bat_step(v, f, s, r, pi, c=chunk, cc=cam_chunk):
            return model.apply(v, f, s, resets=r, pool_idx=pi, chunk=c,
                               cam_chunk=cc,
                               method=FusionOcc.predict_streaming_batch)

        label = f'{chunk}' + (f':{cam_chunk}' if cam_chunk else '')
        try:
            dt = timeit(lambda: bat_step(variables, stacked, state0, resets,
                                         pool_c)[0])
            print(f'batch chunk={label:5s} {dt / T * 1e3:8.1f} ms/frame '
                  f'({dt * 1e3:.0f} total)', flush=True)
        except Exception as e:
            print(f'batch chunk={label:5s} FAILED: {type(e).__name__}: '
                  f'{str(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()
