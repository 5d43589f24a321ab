"""Per-stage / per-op bisection of the camera branch on the real chip.

Swin-B at 12 images x 512x1408 is ~5-6 TFLOP dense (stage 2's 18 blocks
alone are ~3.8 TFLOP), so the measured ~235 ms full-backbone pass is
~25% MFU — this tool locates which stages/ops sit below that, reporting
per-block achieved TFLOP/s next to the analytic FLOPs: each Swin stage's
blocks (shifted + unshifted, fused and unfused attention), the window
attention alone, the MLP matmuls alone (the MXU-ideal comparison), patch
merging, and the FPN.

Shapes mirror the full-size eval config (12 images = 6 cams x 2 temporal
frames, reference fusion_occ.py:289-316 two-pass semantics).
Timing: barrier-fetch (fusionocc_tpu/utils/timing.py) — the only honest
method on the tunnel backend.

Usage: python tools/profile_camera.py [--images 12]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=12)
    ap.add_argument('--n', type=int, default=3, help='timing reps')
    ap.add_argument('--tiny', action='store_true',
                    help='tiny shapes on CPU (flow smoke test)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import flax.linen as nn

    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    if args.tiny:
        jax.config.update('jax_platforms', 'cpu')

    from fusionocc_tpu.config import full_model_config, tiny_model_config
    from fusionocc_tpu.nn.swin import PatchMerging, SwinBlock, WindowMSA
    from fusionocc_tpu.utils.timing import best_call_seconds, scalar_barrier

    def timed(name, fn, *xs, n=args.n):
        out = fn(*xs)
        scalar_barrier(out)
        dt = best_call_seconds(fn, *xs, n=n, warm=False)
        print(f'{name:44s} {dt * 1e3:9.2f} ms', flush=True)
        return dt

    cfg = tiny_model_config() if args.tiny else full_model_config()
    sw = cfg.swin
    H, W = cfg.input_size
    NI = args.images
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    ws = sw.window_size

    h0, w0 = H // sw.patch_size, W // sw.patch_size
    print(f'{NI} images {H}x{W}; stages '
          f'{[(h0 >> i, w0 >> i, sw.embed_dims << i) for i in range(len(sw.depths))]}',
          flush=True)

    stage_ms = []
    for i, depth in enumerate(sw.depths):
        hw = (h0 >> i, w0 >> i)
        C = sw.embed_dims << i
        heads = sw.num_heads[i]
        x = jax.device_put(jax.random.normal(
            rng, (NI, hw[0] * hw[1], C), dtype))

        # analytic dense FLOPs per block: qkv + proj + 2 attn matmuls + MLP
        tok = NI * hw[0] * hw[1]
        nw_pad = -(-hw[0] // ws) * -(-hw[1] // ws)
        tok_pad = NI * nw_pad * ws * ws
        gflop_blk = 2 * (tok * C * (3 * C) + tok * C * C
                         + 2 * tok_pad * (ws * ws) * C
                         + 2 * tok * C * (sw.mlp_ratio * C)) / 1e9
        print(f'  stage{i}: {gflop_blk:.1f} GFLOP/block x {depth}',
              flush=True)

        per_block = {}
        # sweep fused attention on EVERY stage: the head-blocked Pallas
        # grid exists to make the 16/32-head late stages compile flat, and
        # this A/B is the data for raising fused_attn_max_heads
        for fused in (False, True):
            for shift in (False, True):
                blk = SwinBlock(dim=C, num_heads=heads, window_size=ws,
                                shift=shift, mlp_ratio=sw.mlp_ratio,
                                qkv_bias=sw.qkv_bias, drop_path_rate=0.0,
                                dtype=dtype, fused_attn=fused)
                tag = ('fused' if fused else 'plain') + \
                    ('/shift' if shift else '')
                try:
                    v = jax.jit(lambda xx, b=blk: b.init(
                        jax.random.PRNGKey(1), xx, hw))(x)
                    f = jax.jit(lambda vv, xx, b=blk: b.apply(vv, xx, hw))
                    dt = timed(
                        f'  stage{i} block {tag} ({hw[0]}x{hw[1]}x{C})',
                        f, v, x)
                except Exception as e:      # Mosaic compile blowup etc.
                    print(f'  stage{i} block {tag}: failed '
                          f'({type(e).__name__})', flush=True)
                    continue
                per_block[(fused, shift)] = dt
                print(f'    -> {gflop_blk / dt / 1e3:8.2f} TFLOP/s '
                      f'achieved', flush=True)

        use_fused = sw.fused_attn and heads <= sw.fused_attn_max_heads

        def pick(shift):
            for k in ((use_fused, shift), (not use_fused, shift)):
                if k in per_block:
                    return per_block[k]
            return float('nan')
        pair = pick(False) + pick(True)
        stage_ms.append(pair / 2 * depth)
        print(f'  stage{i} total ~{stage_ms[-1] * 1e3:9.2f} ms '
              f'({depth} blocks)', flush=True)

        # window attention alone at this stage's window count
        nw = (hw[0] // ws + (hw[0] % ws > 0)) * (hw[1] // ws + (hw[1] % ws > 0))
        xw = jax.device_put(jax.random.normal(
            rng, (NI * nw, ws * ws, C), dtype))
        msa = WindowMSA(dim=C, num_heads=heads, window_size=ws,
                        qkv_bias=sw.qkv_bias, dtype=dtype)
        vmsa = jax.jit(lambda xx: msa.init(jax.random.PRNGKey(2), xx))(xw)
        timed(f'  stage{i} WindowMSA alone ({NI * nw}w)',
              jax.jit(lambda vv, xx: msa.apply(vv, xx)), vmsa, xw)

        # the MXU-ideal: this stage's MLP matmuls as two plain Denses
        mlp = nn.Sequential([nn.Dense(C * sw.mlp_ratio, dtype=dtype),
                             nn.gelu, nn.Dense(C, dtype=dtype)])
        vm = jax.jit(lambda xx: mlp.init(jax.random.PRNGKey(3), xx))(x)
        timed(f'  stage{i} MLP matmuls alone',
              jax.jit(lambda vv, xx: mlp.apply(vv, xx)), vm, x)

        if i < len(sw.depths) - 1:
            pm = PatchMerging(out_channels=2 * C, dtype=dtype)
            vp = jax.jit(lambda xx: pm.init(
                jax.random.PRNGKey(4), xx, hw))(x)
            timed(f'  stage{i} PatchMerging',
                  jax.jit(lambda vv, xx: pm.apply(vv, xx, hw)), vp, x)

    print('--- stage totals (block path): ' +
          ', '.join(f's{i}={v * 1e3:.1f}ms' for i, v in enumerate(stage_ms)),
          flush=True)

    # --- neck + depth/seg + lift-splat pooling at full scale ---------------
    from fusionocc_tpu.models.fpn import FPN_LSS
    feats = [jax.device_put(jax.random.normal(
        rng, (NI, h0 >> i, w0 >> i, sw.embed_dims << i), dtype))
        for i in sw.out_indices]
    fpn = FPN_LSS(out_channels=cfg.img_neck_out_channels, dtype=dtype)
    vf = jax.jit(lambda a, b: fpn.init(jax.random.PRNGKey(5), (a, b)))(
        feats[0], feats[1])
    timed('FPN_LSS', jax.jit(lambda vv, a, b: fpn.apply(vv, (a, b))),
          vf, feats[0], feats[1])


if __name__ == '__main__':
    main()
