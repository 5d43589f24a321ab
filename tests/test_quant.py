"""Post-training quantization: round-trip accuracy, model-level drift,
storage ratio, int8 MXU matmul correctness."""
import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.config import tiny_model_config
from fusionocc_tpu.data.synthetic import synthetic_batch
from fusionocc_tpu.models.fusion_occ import FusionOcc
from fusionocc_tpu.quant import (dequantize_tree, int8_dot,
                                 quantize_tree, quantized_size_bytes)


def test_weight_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = {'m': {'kernel': rng.randn(3, 3, 16, 32).astype(np.float32)}}
    q, meta = quantize_tree(w)
    back = dequantize_tree(q, meta)
    err = np.abs(np.asarray(back['m']['kernel']) - w['m']['kernel'])
    # symmetric per-channel int8: error <= scale/2 = amax/254
    amax = np.abs(w['m']['kernel']).max(axis=(0, 1, 2))
    assert np.all(err <= amax / 254 + 1e-7)
    assert np.asarray(q['m']['kernel']).dtype == np.int8


def test_model_quantized_forward_drift():
    """Whole-model weight-only int8: occupancy argmax predictions barely
    move (the deployment-accuracy criterion of the reference's INT8 path)."""
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    batch = synthetic_batch(cfg, 1, 0, num_points=512)
    variables = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(batch)
    ref = jax.jit(lambda v, b: model.apply(
        v, b, train=False))(variables, batch)['occ_logits']

    q, meta = quantize_tree(variables['params'])
    deq = dequantize_tree(q, meta)
    got = jax.jit(lambda v, b: model.apply(
        v, b, train=False))({'params': deq,
                             'batch_stats': variables['batch_stats']},
                            batch)['occ_logits']
    ref_np, got_np = np.asarray(ref), np.asarray(got)
    agree = np.mean(np.argmax(got_np, -1) == np.argmax(ref_np, -1))
    assert agree > 0.99, agree
    mae = np.mean(np.abs(got_np - ref_np))
    assert mae < 0.05 * np.mean(np.abs(ref_np)) + 1e-3, mae

    sizes = quantized_size_bytes(q, meta)
    assert sizes['ratio'] > 2.0, sizes  # non-kernel leaves stay fp32


def test_subtree_include_filter():
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    batch = synthetic_batch(cfg, 1, 0, num_points=512)
    variables = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(batch)
    q, meta = quantize_tree(variables['params'], include=('img_backbone',))
    flat = jax.tree_util.tree_flatten_with_path(q)[0]
    for path, leaf in flat:
        keys = tuple(getattr(p, 'key', str(p)) for p in path)
        if np.asarray(leaf).dtype == np.int8:
            assert keys[0] == 'img_backbone', keys


def test_int8_dot_matches_float():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 64).astype(np.float32)
    w = rng.randn(64, 32).astype(np.float32)
    q, meta = quantize_tree({'kernel': w})
    got = np.asarray(int8_dot(jnp.asarray(x), jnp.asarray(q['kernel']),
                              jnp.asarray(meta['kernel'])))
    ref = x @ w
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel
    assert got.dtype == np.float32


def test_model_scale_int8_weight_ptq_ab():
    """Model-scale PTQ A/B: full forward with int8-quantized weights
    (camera backbone + neck + BEV trunk kernels) vs fp32 weights.

    Bounds the deployment numerics: occupancy logit drift stays small
    relative to logit scale and the argmax predictions agree on ~all
    voxels (the reference ships TRT INT8 engines and reports metric
    parity, precision_utils.py:30-131; this is the jit-native analog).
    """
    from fusionocc_tpu.quant import dequantize_tree
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    batch = synthetic_batch(cfg, 1, 0, num_points=512)
    variables = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(batch)

    q, meta = quantize_tree(variables['params'])
    deq = dequantize_tree(q, meta, dtype=jnp.float32)
    v_q = dict(variables, params=deq)

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False)['occ_logits'])
    ref = np.asarray(fwd(variables, batch))
    got = np.asarray(fwd(v_q, batch))

    scale = np.abs(ref).max()
    drift = np.abs(got - ref).max()
    assert drift / scale < 0.05, (drift, scale)
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.995, agree


def test_int8_dense_serving_ab():
    """Full forward with the Swin Dense layers routed through real int8 MXU
    matmuls (cfg.swin.int8_dense, quant.int8_dot_general) vs the bf16/fp32
    path: occupancy logits drift stays bounded and predictions agree on
    nearly all voxels — the numerics side of the reference's TRT INT8
    engine injection (tools/test.py --int8-engines)."""
    import dataclasses
    cfg = tiny_model_config()
    cfg_q = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, int8_dense=True))
    batch = synthetic_batch(cfg, 1, 0, num_points=512)
    model = FusionOcc(cfg)
    variables = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(batch)
    model_q = FusionOcc(cfg_q)

    ref = np.asarray(jax.jit(lambda v, b: model.apply(
        v, b, train=False)['occ_logits'])(variables, batch))
    got = np.asarray(jax.jit(lambda v, b: model_q.apply(
        v, b, train=False)['occ_logits'])(variables, batch))

    scale = np.abs(ref).max()
    drift = np.abs(got - ref).max()
    assert drift / scale < 0.08, (drift, scale)
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.99, agree
