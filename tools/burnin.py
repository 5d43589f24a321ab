"""Training burn-in: N full-size steps of the unified recipe with a loss
curve artifact and a mid-run checkpoint-resume consistency check.

Proves the reference's unified training recipe end to end
(configs/fusion_occ_occ3d_miou_unified.py:279-289: grad accumulation 8,
backbone/VT lr_mult 0.1) at full resolution: loss stays finite and trends
down, checkpoints written mid-run restore to a state that reproduces the
original run's subsequent losses exactly.

Usage:
  python tools/burnin.py --steps 200 --out work_dirs/burnin        # full size
  python tools/burnin.py --tiny --steps 8                           # smoke
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
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--tiny', action='store_true')
    ap.add_argument('--out', default='/tmp/fusionocc_burnin')
    ap.add_argument('--ckpt-at', type=int, default=None,
                    help='save a checkpoint at this step (default steps//2)')
    ap.add_argument('--resume-check-steps', type=int, default=5)
    ap.add_argument('--accum', type=int, default=8)
    ap.add_argument('--num-batches', type=int, default=16,
                    help='distinct synthetic batches cycled through')
    args = ap.parse_args()
    ckpt_at = args.ckpt_at or args.steps // 2

    import jax
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import (OptimConfig, TrainConfig,
                                      full_model_config, tiny_model_config)
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.train import checkpoint as ckpt
    from fusionocc_tpu.train.loop import create_train_state, make_jitted_steps

    model_cfg = tiny_model_config() if args.tiny else full_model_config()
    # the unified recipe: accumulation 8, low LR on backbone + VT
    optim = OptimConfig(warmup_iters=20, iters_per_epoch=max(args.steps, 1),
                        max_epochs=1, accumulate_steps=args.accum,
                        backbone_lr_mult=0.1)
    cfg = TrainConfig(model=model_cfg, optim=optim)

    n_pts = 512 if args.tiny else None
    batches = [synthetic_batch(model_cfg, 1, seed=s, num_points=n_pts)
               for s in range(args.num_batches)]
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    t_step, _, _ = make_jitted_steps(model, cfg)
    rng = jax.random.PRNGKey(7)

    os.makedirs(args.out, exist_ok=True)
    curve_path = os.path.join(args.out, 'loss_curve.jsonl')
    curve = open(curve_path, 'w')
    losses = []
    saved_tag = None
    t0 = time.time()
    for i in range(args.steps):
        state, logs = t_step(state, batches[i % len(batches)], rng)
        loss = float(logs['loss'])
        losses.append(loss)
        rec = {'step': i + 1, 'loss': round(loss, 4),
               'loss_occ': round(float(logs['loss_occ']), 4),
               'depth_loss': round(float(logs['depth_loss']), 5),
               'seg_loss': round(float(logs['seg_loss']), 5),
               'grad_norm': round(float(logs['grad_norm']), 3),
               't': round(time.time() - t0, 1)}
        curve.write(json.dumps(rec) + '\n')
        curve.flush()
        if (i + 1) % 10 == 0 or i == 0:
            print(rec, flush=True)
        assert np.isfinite(loss), f'non-finite loss at step {i + 1}'
        if i + 1 == ckpt_at:
            saved_tag = ckpt.save_checkpoint(args.out, state, step=i + 1)
            print(f'checkpoint saved: {saved_tag}', flush=True)
    curve.close()

    steps_per_sec = args.steps / (time.time() - t0)
    first = float(np.mean(losses[:max(args.steps // 10, 1)]))
    last = float(np.mean(losses[-max(args.steps // 10, 1):]))
    print(f'steps/sec: {steps_per_sec:.3f}  loss {first:.3f} -> {last:.3f}')
    if args.steps >= 50:   # short smoke runs can't out-train the warmup
        assert last < first, ('loss did not decrease over the burn-in: '
                              f'{first:.4f} -> {last:.4f}')

    # ---- mid-run resume consistency --------------------------------------
    if saved_tag is not None and ckpt_at < args.steps:
        abstract = jax.tree_util.tree_map(np.asarray, state)
        restored = ckpt.restore_checkpoint(saved_tag, abstract)
        restored = jax.tree_util.tree_map(jax.numpy.asarray, restored)
        n_chk = min(args.resume_check_steps, args.steps - ckpt_at)
        st = type(state)(*restored) if not isinstance(restored, type(state)) \
            else restored
        replay = []
        for i in range(ckpt_at, ckpt_at + n_chk):
            st, logs = t_step(st, batches[i % len(batches)], rng)
            replay.append(float(logs['loss']))
        orig = losses[ckpt_at:ckpt_at + n_chk]
        err = max(abs(a - b) for a, b in zip(orig, replay))
        print(f'resume replay max |dloss| over {n_chk} steps: {err:.2e}')
        assert err < 1e-3, (orig, replay)

    print(json.dumps({'metric': 'burnin_steps_per_sec',
                      'value': round(steps_per_sec, 3),
                      'loss_first': round(first, 4),
                      'loss_last': round(last, 4),
                      'resume_ok': saved_tag is not None}))


if __name__ == '__main__':
    main()
