"""A/B the fused window-attention policies on the real chip.

Measures compile time and steady-state runtime of the full-size 12-image
Swin-B forward (the camera-branch workload of the batched two-pass eval)
under different fusion policies:

  unfused          plain XLA attention
  fused-all        every stage fused
  fused-hi         only stages with <= 8 heads (the shipped default)

Measured (v5e, bf16, shared chip, device-resident inputs + barrier
fetch): unfused 252 ms median / 84 s compile; fused-hi 235 ms / 44 s.

Usage: python tools/ab_swin_fused.py [--policies fused-hi,unfused]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--policies', default='unfused,fused-all,fused-hi')
    ap.add_argument('--iters', type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fusionocc_tpu.config import full_model_config
    from fusionocc_tpu.nn.swin import SwinTransformer

    base = full_model_config()
    H, W = base.input_size
    imgs = [jax.device_put(np.random.RandomState(s).rand(
        12, H, W, 3).astype(np.float32)) for s in range(4)]

    policies = {
        'unfused': dict(fused_attn=False),
        'fused-all': dict(fused_attn=True, fused_attn_max_heads=99),
        'fused-hi': dict(fused_attn=True, fused_attn_max_heads=8),
    }
    for name in args.policies.split(','):
        scfg = dataclasses.replace(base.swin, **policies[name])
        model = SwinTransformer(scfg, dtype=jnp.bfloat16)
        v = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x,
                                         deterministic=True))(imgs[0])

        @jax.jit
        def fwd(v, x):
            outs = model.apply(v, x, deterministic=True)
            return [jnp.sum(o.astype(jnp.float32)) for o in outs]

        t0 = time.perf_counter()
        np.asarray(fwd(v, imgs[0])[0])   # 4-byte fetch = true barrier
        compile_s = time.perf_counter() - t0
        lat = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(fwd(v, imgs[i % len(imgs)])[0])
            lat.append(time.perf_counter() - t0)
        print(f'{name:14s} compile {compile_s:7.1f}s  '
              f'median {np.median(lat)*1e3:7.1f} ms  '
              f'min {np.min(lat)*1e3:7.1f} ms', flush=True)


if __name__ == '__main__':
    main()
