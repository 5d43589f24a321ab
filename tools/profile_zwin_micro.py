"""Single-conv zwin microbench: where do the ~50 ms/conv go?

Round-5 finding: merged-tap (6 matmuls/block instead of 54) bought
NOTHING end-to-end, so the per-matmul fixed-cost theory is wrong.
Candidate bottlenecks, isolated here on a stage-1-shaped problem
(S=86016, l_in=8*32, l_out=8*32) with a REAL encoder neighbor map:

  a. zband XLA gather baseline
  b. zwin kernel as shipped (tap-by-tap)       [scalar-prefetch windows]
  c. zwin merged-tap
  d. NULL kernel, same grid/specs              [DMA+grid overhead only]
  e. static-window kernel (index map ignores blk_ref -> Mosaic can
     pipeline without scalar dependence)       [scalar-prefetch penalty]
  f. compute-only kernel (windows read from ONE static block)
                                               [pure matmul cost]

Timing: sum-reduce barrier (tools/profile_forward.py rationale).
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import full_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.ops import sparse_conv as sc
    from fusionocc_tpu.ops import zfold as zf
    from fusionocc_tpu.ops.pallas import zwin_conv as zw
    from fusionocc_tpu.ops.voxelize import voxelize_mean
    from fusionocc_tpu.utils.timing import best_call_seconds, scalar_barrier

    cfg = full_model_config()
    lcfg = cfg.lidar
    shape = lcfg.sparse_shape(cfg.grid)
    b = jax.device_put(synthetic_batch(cfg, batch_size=1, seed=0))

    def timed(name, fn, *args, n=5):
        try:
            out = fn(*args)
            scalar_barrier(out)
        except Exception as e:
            print(f'{name:46s} FAILED {type(e).__name__}: {str(e)[:160]}',
                  flush=True)
            return None
        dt = best_call_seconds(fn, *args, n=n, warm=False)
        print(f'{name:46s} {dt * 1e3:9.2f} ms', flush=True)
        return out

    # --- real stage-1 voxel set + neighbor map -----------------------------
    pcr = cfg.grid.point_cloud_range
    fold = min(lcfg.zfold, shape[2])

    @jax.jit
    def stage1_inputs(points, mask):
        sp = voxelize_mean(points.astype(jnp.float32), mask, pcr,
                           lcfg.voxel_size, shape, lcfg.voxel_capacity[0])
        zv = zf.zfold_regroup(sp, shape, lcfg.zfold_capacity[0], fold)
        sshape = zf.super_shape(shape, fold)
        _, strided = sc.stage_indices_table(
            zf.as_sparse(zv), sshape, lcfg.zfold_capacity[1])
        (oc, okeys, om, _), sshape_out = strided
        cells1 = sc.out_shape_strided(shape)
        sshape1 = zf.super_shape(cells1, fold)
        sp1 = type(zf.as_sparse(zv))(
            jnp.zeros(om.shape + (1,), jnp.float32),
            jnp.where(om[..., None], oc, 0), okeys, om)
        nbr1, _ = sc.stage_indices_table(sp1, sshape1, None)
        return nbr1, om

    nbr1, om = stage1_inputs(b.points, b.points_mask)
    s1 = lcfg.zfold_capacity[1]
    cin = cout = 32
    l_in = fold * cin
    rng = np.random.RandomState(0)
    feats = jax.device_put(
        (rng.rand(1, s1, l_in).astype(np.float32) - 0.5).astype(jnp.bfloat16))
    weight = jax.device_put(
        (0.1 * rng.randn(27, cin, cout)).astype(np.float32))
    print(f'stage1 shape: S={s1} l_in={l_in} nbr={nbr1.shape}', flush=True)

    # --- a/b/c: shipped paths ---------------------------------------------
    zb_fn = jax.jit(lambda f, m, i, w: zf.zband_conv_apply(
        f, m, i, w, fold, fold, 1))
    timed('a. zband (XLA gather)', zb_fn, feats, om, nbr1, weight)

    for label, kw in (('b. zwin b128n6', dict(block_v=128, n_win=6)),
                      ('c. zwin b128n6 MERGED',
                       dict(block_v=128, n_win=6, merged=True)),
                      ('b2. zwin b256n4', dict(block_v=256, n_win=4)),
                      ('b3. zwin b512n2', dict(block_v=512, n_win=2))):
        fn = jax.jit(functools.partial(
            zw.zwin_conv_apply, f_in=fold, f_out=fold, stride=1,
            bad_frac=0.0625, **kw))
        timed(label, fn, feats, om, nbr1, weight)

    # --- d/e/f: instrumented variants of the kernel ------------------------
    block_v, n_win = 128, 6
    win_rows = n_win * block_v
    dtype = feats.dtype
    bands = zw.z_bands(fold, fold, 1)
    w_e = zf.expand_weight(weight, fold, fold, 1).astype(dtype)
    taps, w_slices, w_off = [], [], 0
    for t in range(27):
        ds = t % 3
        dx = t // 9
        zi_lo, nzi = bands[ds]
        if nzi == 0:
            continue
        taps.append((t, dx, zi_lo, nzi, w_off))
        w_slices.append(w_e[t, zi_lo * cin:(zi_lo + nzi) * cin, :])
        w_off += nzi * cin
    w_cat = jnp.concatenate(w_slices, axis=0)
    l_out = fold * cout
    nb = s1 // block_v
    n_pad_blocks = -(-s1 // block_v) + n_win
    interp = jax.default_backend() != 'tpu'

    def run_variant(label, kernel, static_windows, n_inputs=None):
        k = n_win
        n_inputs = 3 * k if n_inputs is None else n_inputs

        def win_spec(dx, j):
            if static_windows:
                return pl.BlockSpec(
                    (1, block_v, l_in),
                    lambda bi, i, blk_ref, dx=dx, j=j:
                        (bi, (i + j) % n_pad_blocks, 0))
            return pl.BlockSpec(
                (1, block_v, l_in),
                lambda bi, i, blk_ref, dx=dx, j=j:
                    (bi, blk_ref[bi, i, dx] + j, 0))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, nb),
            in_specs=(
                [pl.BlockSpec((1, block_v, 27),
                              lambda bi, i, blk_ref: (bi, i, 0))]
                + [win_spec(dx, j) for dx in range(3) for j in range(k)
                   ][:n_inputs]
                + [pl.BlockSpec(w_cat.shape,
                                lambda bi, i, blk_ref: (0, 0))]),
            out_specs=pl.BlockSpec((1, block_v, l_out),
                                   lambda bi, i, blk_ref: (bi, i, 0)),
        )

        def call(feats, nbr):
            blk, rel, _ = zw._prepare(nbr, s1, block_v, n_win)
            pad = n_pad_blocks * block_v - s1
            fp = jnp.concatenate(
                [feats, jnp.zeros((1, pad, l_in), dtype)], axis=1)
            wins = [fp] * n_inputs
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((1, s1, l_out), dtype),
                interpret=interp)(blk, rel, *wins, w_cat)

        fn = jax.jit(call)
        timed(label, fn, feats, nbr1)

    def null_kernel(blk_ref, rel_ref, *refs):
        win_refs, w_ref, o_ref = refs[:3 * n_win], refs[-2], refs[-1]
        del blk_ref, w_ref
        acc = rel_ref[0, :, :1].astype(jnp.float32)          # touch rel
        s = jnp.zeros((block_v, l_out), jnp.float32)
        for r in win_refs:
            s = s + r[0, :, :l_out].astype(jnp.float32)      # touch windows
        o_ref[0] = (s + acc).astype(o_ref.dtype)

    run_variant('d. NULL kernel (DMA+grid only)', null_kernel,
                static_windows=False)
    run_variant('e. real kernel, STATIC windows',
                zw._make_kernel(taps, n_win, cin, block_v, win_rows, dtype),
                static_windows=True)
    run_variant('e2. merged kernel, STATIC windows',
                zw._make_kernel_merged(taps, n_win, cin, block_v, win_rows,
                                       dtype),
                static_windows=True)
    run_variant('d2. NULL kernel, STATIC windows', null_kernel,
                static_windows=True)


if __name__ == '__main__':
    main()
