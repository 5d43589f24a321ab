"""Serving export: serialize the inference function as StableHLO.

TPU-native counterpart of the reference's ONNX/TensorRT export
(tools/fusionocc_export_onnx.py, stcocc_build_int8_engine.py,
fusionocc/utils/precision_utils.py): instead of ONNX graphs + TRT engines,
the jitted inference function is exported with jax.export (StableHLO bytes,
loadable by any XLA-based runtime / IFRT server) with a numerical
verification pass against the live model. Precision modes: fp32 / bf16
(default; the TPU analogue of the reference's fp16 mode).

Usage:
  python tools/export.py --out /tmp/fusionocc.stablehlo [--tiny] [--fp32]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', required=True)
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--tiny', action='store_true')
    ap.add_argument('--fp32', action='store_true')
    ap.add_argument('--int8-weights', action='store_true',
                    help='weight-only int8 post-training quantization '
                         'before export (the TRT-INT8 deployment analog)')
    ap.add_argument('--verify', action='store_true',
                    help='roundtrip-deserialize and compare outputs')
    ap.add_argument('--streaming', action='store_true',
                    help='export the streaming serving step instead '
                         '(predict_streaming: batch + StreamingState in, '
                         'prediction + new state out)')
    args = ap.parse_args()

    import jax
    import numpy as np
    from jax import export as jexport

    from fusionocc_tpu.config import (TrainConfig, full_model_config,
                                      tiny_model_config)
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.fusion_occ import FusionOcc
    from fusionocc_tpu.train import checkpoint as ckpt
    from fusionocc_tpu.train.loop import create_train_state

    cfg = tiny_model_config() if args.tiny else full_model_config()
    if args.fp32:
        import dataclasses
        cfg = dataclasses.replace(cfg, compute_dtype='float32')
    model = FusionOcc(cfg)
    batch = synthetic_batch(cfg, 1, 0,
                            num_points=512 if args.tiny else None)
    _, state = create_train_state(TrainConfig(model=cfg),
                                  jax.random.PRNGKey(0), batch)
    if args.checkpoint:
        path = (ckpt.latest_checkpoint(args.checkpoint)
                if os.path.isdir(args.checkpoint) else args.checkpoint)
        state = ckpt.restore_checkpoint(path, state)

    params = state.ema_params
    if args.int8_weights:
        from fusionocc_tpu.quant import (dequantize_tree, quantize_tree,
                                         quantized_size_bytes)
        q, meta = quantize_tree(params)
        print('int8 weights:', quantized_size_bytes(q, meta))
        params = dequantize_tree(q, meta, dtype=cfg.dtype)
    variables = {'params': params, 'batch_stats': state.batch_stats}

    from fusionocc_tpu.models.fusion_occ import Batch, StreamingState
    jexport.register_namedtuple_serialization(
        Batch, serialized_name='fusionocc_tpu.Batch')

    if args.streaming:
        # the deployed serving loop: one camera pass per frame, the
        # temporal BEV cache carried by the caller between calls
        jexport.register_namedtuple_serialization(
            StreamingState, serialized_name='fusionocc_tpu.StreamingState')
        state0 = model.apply(variables, 1,
                             method=FusionOcc.init_streaming_state)

        def infer(batch, stream_state):
            pred, _, ns = model.apply(variables, batch, stream_state,
                                      method=FusionOcc.predict_streaming)
            return pred, ns

        exported = jexport.export(jax.jit(infer))(batch, state0)
        example_extra = (state0,)
    else:
        def infer(batch):
            return model.apply(variables, batch, method=FusionOcc.predict)

        exported = jexport.export(jax.jit(infer))(batch)
        example_extra = ()
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    print(f'exported {len(blob) / 2**20:.1f} MiB StableHLO -> {args.out}')

    if args.verify:
        rt = jexport.deserialize(blob)
        got = rt.call(batch, *example_extra)
        ref = jax.jit(infer)(batch, *example_extra)
        got0 = jax.tree_util.tree_leaves(got)[0]
        ref0 = jax.tree_util.tree_leaves(ref)[0]
        assert np.array_equal(np.asarray(got0), np.asarray(ref0)), \
            'roundtrip mismatch'
        print('verify: roundtrip output matches')


if __name__ == '__main__':
    main()
