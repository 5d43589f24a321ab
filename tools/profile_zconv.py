"""Micro-bisection of the in-encoder zfold conv composition.

tools/profile_lidar.py's stage bisection (results/onchip_r3c) showed the
zfold encoder's FEATURE path (convs + BN) costs ~416 ms of the 525 ms
total while the isolated one-shot gather-GEMM micro rows are ~5-13 ms
real per conv.  This tool A/Bs each ingredient the encoder adds on top of
the bare GEMM — tap_chunk scan, expand_weight inside the jit, masked BN +
relu, bf16 vs fp32, real-map found-rates — at the real stage shapes, to
find the multiplier.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import full_model_config
    from fusionocc_tpu.nn.layers import MaskedBatchNorm
    from fusionocc_tpu.ops import zfold as zf
    from fusionocc_tpu.ops.sparse_conv import sparse_conv_apply
    from fusionocc_tpu.utils.timing import best_call_seconds, scalar_barrier

    def timed(name, fn, *args, n=3):
        try:
            out = fn(*args)
            scalar_barrier(out)
        except Exception as e:
            print(f'{name:52s} FAILED {type(e).__name__}: {str(e)[:160]}',
                  flush=True)
            return None
        dt = best_call_seconds(fn, *args, n=n, warm=False)
        print(f'{name:52s} {dt * 1e3:9.1f} ms', flush=True)
        return out

    cfg = full_model_config()
    lcfg = cfg.lidar
    F = lcfg.zfold
    rng = np.random.RandomState(0)

    # stage 1 and 2 shapes dominate the measured budget
    for si, c in ((1, 32), (2, 48)):
        S = lcfg.zfold_capacity[si]
        L = F * c
        feats32 = jax.device_put(rng.rand(1, S, L).astype(np.float32))
        feats16 = jax.device_put(np.asarray(feats32, np.float32)
                                 .astype(jnp.bfloat16))
        w_cell = jax.device_put(rng.rand(27, c, c).astype(np.float32))
        w_lift = jax.device_put(np.asarray(
            zf.expand_weight(jnp.asarray(w_cell), F, F, 1)))
        # real-ish map: ~75% found taps, z-sorted neighborhoods
        nbr = rng.randint(0, S, size=(1, S, 27)).astype(np.int32)
        miss = rng.rand(1, S, 27) < 0.25
        nbr[miss] = S
        nbr = jax.device_put(nbr)
        mask = jax.device_put(np.ones((1, S), bool))
        lane = jax.device_put(rng.rand(1, S, F) < 0.3)

        print(f'--- stage{si}: S={S}, lanes={L} ---', flush=True)
        for tag, f in (('fp32', feats32), ('bf16', feats16)):
            fd = f.dtype
            wl = jnp.asarray(w_lift, fd)

            timed(f's{si} {tag} conv one-shot (pre-lifted w)',
                  jax.jit(lambda x, nb, w: sparse_conv_apply(
                      x, mask, nb, w)), f, nbr, wl)
            timed(f's{si} {tag} conv tap_chunk=9 (pre-lifted w)',
                  jax.jit(lambda x, nb, w: sparse_conv_apply(
                      x, mask, nb, w, tap_chunk=9)), f, nbr, wl)
            timed(f's{si} {tag} conv tap_chunk=3 (pre-lifted w)',
                  jax.jit(lambda x, nb, w: sparse_conv_apply(
                      x, mask, nb, w, tap_chunk=3)), f, nbr, wl)
            timed(f's{si} {tag} conv one-shot + expand_weight in-jit',
                  jax.jit(lambda x, nb, w: sparse_conv_apply(
                      x, mask, nb,
                      zf.expand_weight(w.astype(fd), F, F, 1))),
                  f, nbr, jnp.asarray(w_cell))

            bn = MaskedBatchNorm(fold=F, dtype=fd)
            bnv = bn.init(jax.random.PRNGKey(0), f, lane, train=False)

            def conv_bn_relu(x, nb, w, v, tc):
                y = sparse_conv_apply(x, mask, nb, w, tap_chunk=tc)
                y = bn.apply(v, y, lane, train=False)
                return jax.nn.relu(y)

            timed(f's{si} {tag} conv+BN+relu one-shot',
                  jax.jit(lambda x, nb, w, v: conv_bn_relu(x, nb, w, v, 0)),
                  f, nbr, wl, bnv)
            timed(f's{si} {tag} conv+BN+relu tap_chunk=9',
                  jax.jit(lambda x, nb, w, v: conv_bn_relu(x, nb, w, v, 9)),
                  f, nbr, wl, bnv)

            def three_convs(x, nb, w, v, tc):
                for _ in range(3):
                    x = conv_bn_relu(x, nb, w, v, tc)
                return x

            timed(f's{si} {tag} 3x(conv+BN+relu) one-shot',
                  jax.jit(lambda x, nb, w, v: three_convs(x, nb, w, v, 0)),
                  f, nbr, wl, bnv)
            timed(f's{si} {tag} 3x(conv+BN+relu) tap_chunk=9',
                  jax.jit(lambda x, nb, w, v: three_convs(x, nb, w, v, 9)),
                  f, nbr, wl, bnv)


if __name__ == '__main__':
    main()
