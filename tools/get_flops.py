"""Model cost analysis: FLOPs / bytes / parameter breakdown.

Equivalent of the reference's tools/analysis_tools/get_flops.py +
parameter-memory report (tools/test.py:590-599), using XLA's compiled cost
analysis instead of torch module hooks.

Usage:
  python tools/get_flops.py [--tiny] [--train]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tiny', action='store_true')
    ap.add_argument('--train', action='store_true',
                    help='analyze the training step instead of inference')
    args = ap.parse_args()

    import jax

    from fusionocc_tpu.config import TrainConfig, full_model_config, \
        tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.fusion_occ import FusionOcc
    from fusionocc_tpu.utils.profiling import param_memory_report

    cfg = tiny_model_config() if args.tiny else full_model_config()
    model = FusionOcc(cfg)
    batch = synthetic_batch(cfg, 1, 0, num_points=512 if args.tiny else None)
    variables = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(batch)

    print('--- parameters ---')
    for k, v in param_memory_report(variables['params']).items():
        if k.startswith('total'):
            print(f'{k}: {v:,.1f}' if isinstance(v, float) else f'{k}: {v:,}')
        else:
            print(f'{k}: {v / 1e6:.2f} M')

    if args.train:
        import functools
        from fusionocc_tpu.train.loop import (create_train_state,
                                              make_optimizer, train_step)
        tcfg = TrainConfig(model=cfg)
        m, state = create_train_state(tcfg, jax.random.PRNGKey(0), batch)
        tx = make_optimizer(tcfg.optim)
        fn = jax.jit(functools.partial(train_step, m, tx, tcfg))
        lowered = fn.lower(state, batch, jax.random.PRNGKey(1))
    else:
        fn = jax.jit(lambda v, b: model.apply(v, b,
                                              method=FusionOcc.predict))
        lowered = fn.lower(variables, batch)

    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print('--- XLA cost analysis ---')
    for key in ('flops', 'bytes accessed', 'transcendentals'):
        if key in ca:
            v = ca[key]
            unit = 'GFLOP' if key == 'flops' else (
                'GiB' if 'bytes' in key else 'M ops')
            scale = 1e9 if key == 'flops' else (
                2 ** 30 if 'bytes' in key else 1e6)
            print(f'{key}: {v / scale:.2f} {unit}')
    mem = compiled.memory_analysis()
    if mem is not None:
        for attr in ('temp_size_in_bytes', 'argument_size_in_bytes',
                     'output_size_in_bytes'):
            v = getattr(mem, attr, None)
            if v is not None:
                print(f'{attr}: {v / 2**20:.1f} MiB')


if __name__ == '__main__':
    main()
