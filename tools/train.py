"""Training CLI.

Equivalent of the reference's tools/train.py (mmengine Runner): config
selection, data loading, jitted train steps over a data mesh, periodic
checkpointing, optional periodic eval. Falls back to synthetic data when no
nuScenes pkl is available (--synthetic).

Usage:
  python tools/train.py --ann-file data/nuscenes/fusionocc-nuscenes_infos_train.pkl
  python tools/train.py --synthetic --steps 10        # smoke run
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ann-file', default=None)
    ap.add_argument('--data-root', default='')
    ap.add_argument('--img-seg-dir', default=None)
    ap.add_argument('--work-dir', default='./work_dirs/fusion_occ')
    ap.add_argument('--config', default=None,
                    help='named preset from fusionocc_tpu.configs '
                         '(e.g. fusion_occ, fusion_occ_unified, tiny)')
    ap.add_argument('--synthetic', action='store_true')
    ap.add_argument('--tiny', action='store_true',
                    help='tiny model config (debug)')
    ap.add_argument('--steps', type=int, default=0,
                    help='stop after N steps (0 = full schedule)')
    ap.add_argument('--batch-size', type=int, default=1)
    ap.add_argument('--epochs', type=int, default=None)
    ap.add_argument('--lr', type=float, default=None)
    ap.add_argument('--accumulate', type=int, default=None)
    ap.add_argument('--resume', default=None)
    ap.add_argument('--log-interval', type=int, default=50)
    ap.add_argument('--ckpt-interval-steps', type=int, default=0,
                    help='0 = once per epoch')
    ap.add_argument('--render-interval', type=int, default=0,
                    help='log a BEV render of the EMA prediction every N '
                         'steps to TensorBoard/PNG (0 = off)')
    # multi-host launch (the dist_train.sh / slurm_train.sh analog,
    # tools/launch_multihost.sh): one process per host, same command on
    # every host.  Defaults read SLURM variables so `srun python
    # tools/train.py ...` needs no explicit flags.
    ap.add_argument('--coordinator', default=os.environ.get(
        'FUSIONOCC_COORDINATOR'),
        help='host:port of process 0 (multi-host only)')
    ap.add_argument('--num-processes', type=int, default=int(os.environ.get(
        'SLURM_NTASKS', os.environ.get('FUSIONOCC_NUM_PROCESSES', 1))))
    ap.add_argument('--process-id', type=int, default=int(os.environ.get(
        'SLURM_PROCID', os.environ.get('FUSIONOCC_PROCESS_ID', 0))))
    args = ap.parse_args()

    import dataclasses
    import jax
    import numpy as np

    from fusionocc_tpu.config import (OptimConfig, TrainConfig,
                                      full_model_config, tiny_model_config)
    from fusionocc_tpu.configs import get_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.parallel.mesh import data_mesh, init_distributed
    from fusionocc_tpu.train import checkpoint as ckpt
    from fusionocc_tpu.train.loop import create_train_state, make_jitted_steps

    # must run before any other jax call so the backend sees every host
    init_distributed(args.coordinator, args.num_processes, args.process_id)

    if args.config:
        preset = get_config(args.config)
    elif args.tiny:
        preset = get_config('tiny')
    else:
        preset = get_config('fusion_occ')
    model_cfg = preset.model

    if args.synthetic:
        iters_per_epoch = max(args.steps, 1)
        def batches():
            while True:
                yield synthetic_batch(model_cfg, args.batch_size, seed=0)
    else:
        from fusionocc_tpu.data.dataset import (NuScenesOccDataset,
                                                data_loader, prefetch)
        ds = NuScenesOccDataset(args.ann_file, model_cfg,
                                data_root=args.data_root,
                                img_seg_dir=args.img_seg_dir, train=True)
        hosts = jax.process_count()
        iters_per_epoch = len(ds) // (args.batch_size * hosts)
        def batches():
            epoch = 0
            while True:
                ds.set_epoch(epoch)  # fresh per-epoch augs (sampler-seed hook)
                yield from prefetch(data_loader(
                    ds, args.batch_size, shuffle=True, seed=epoch,
                    host_id=jax.process_index(), host_count=hosts))
                epoch += 1

    optim = dataclasses.replace(
        preset.optim,
        iters_per_epoch=iters_per_epoch,
        **{k: v for k, v in (('lr', args.lr), ('max_epochs', args.epochs),
                             ('accumulate_steps', args.accumulate))
           if v is not None})
    cfg = TrainConfig(model=model_cfg, optim=optim,
                      batch_size=args.batch_size)

    gen = batches()
    sample = next(gen)
    rng = jax.random.PRNGKey(cfg.seed)
    model, state = create_train_state(cfg, rng, sample)

    if args.resume:
        path = (ckpt.latest_checkpoint(args.resume)
                if os.path.isdir(args.resume) else args.resume) or args.resume
        state = ckpt.restore_checkpoint(path, state)
        print(f'resumed from {path} at step {int(state.step)}')

    mesh = data_mesh()
    jt, je, tx, shard = make_jitted_steps(model, cfg, mesh)

    total = args.steps or cfg.optim.max_epochs * iters_per_epoch
    ckpt_every = args.ckpt_interval_steps or iters_per_epoch
    os.makedirs(args.work_dir, exist_ok=True)
    from fusionocc_tpu.utils.logging import MetricLogger
    mlog = MetricLogger(args.work_dir)
    t0 = time.perf_counter()
    for i in range(total):
        batch = shard(sample if i == 0 else next(gen))
        state, logs = jt(state, batch, rng)
        if (i + 1) % args.log_interval == 0 or i == 0:
            jax.block_until_ready(logs)
            dt = (time.perf_counter() - t0) / (i + 1)
            scalars = {k: float(v) for k, v in logs.items()}
            scalars['sec_per_iter'] = dt
            mlog.log(i + 1, scalars)
            line = ' '.join(f'{k}={v:.4f}' for k, v in scalars.items())
            print(f'step {i + 1}/{total} {line}', flush=True)
        if args.render_interval and (i + 1) % args.render_interval == 0:
            from fusionocc_tpu.utils.visualization import occupancy_bev_image
            pred = np.asarray(je(state, batch, True))
            mlog.log_image(i + 1, 'train/bev_pred',
                           occupancy_bev_image(pred[0]))
        if (i + 1) % ckpt_every == 0:
            path = ckpt.save_checkpoint(args.work_dir, jax.device_get(state))
            print(f'saved {path}', flush=True)
    path = ckpt.save_checkpoint(args.work_dir, jax.device_get(state))
    print(f'final checkpoint: {path}')


if __name__ == '__main__':
    main()
