"""A/B the SparseEncoder backends (COO gather-GEMM vs block-sparse tiles)
at full scale on the real chip.

The tile path exists to kill the ~405 ms/frame of XLA sort machinery the
COO neighbor-map builds cost (BENCH.md round 2); this prints the end-to-end
encoder latency for both backends on the beam-model synthetic cloud, using
the sum-reduce barrier-fetch timing (block_until_ready lies on the tunnel —
see tools/profile_forward.py).
"""
from __future__ import annotations

import dataclasses
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
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder

    from fusionocc_tpu.utils.timing import best_call_seconds, scalar_barrier

    def timed(name, fn, *args, n=5):
        out = fn(*args)                     # compile + warm
        scalar_barrier(out)
        dt = best_call_seconds(fn, *args, n=n, warm=False)
        print(f'{name:30s} {dt * 1e3:9.1f} ms', flush=True)
        return out

    cfg = full_model_config()
    b = jax.device_put(synthetic_batch(cfg, batch_size=1, seed=0))
    pts, pmask = b.points, b.points_mask

    outs = {}
    for backend in (sys.argv[1:] or ['coo', 'tile']):
        lcfg = dataclasses.replace(cfg.lidar, backend=backend)
        enc = SparseEncoder(lcfg, cfg.grid)
        variables = jax.jit(enc.init)(jax.random.PRNGKey(0), pts, pmask)
        fn = jax.jit(lambda v, p, m, e=enc: e.apply(v, p, m))
        outs[backend] = timed(f'encoder[{backend}]', fn, variables, pts,
                              pmask)

    if len(outs) == 2:
        d = jnp.max(jnp.abs(outs['coo'] - outs['tile']))
        r = jnp.max(jnp.abs(outs['coo']))
        print(f'max |coo - tile| = {np.asarray(d):.2e} '
              f'(max |coo| = {np.asarray(r):.2e})', flush=True)


if __name__ == '__main__':
    main()
