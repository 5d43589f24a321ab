"""Torch importer: rule coverage + converter round-trips.

Builds a synthetic torch state_dict by inverting the rule table, imports it,
and asserts (a) every flax leaf has a rule, (b) every synthetic torch key is
consumed, (c) values land where expected after layout conversion.
"""
import jax
import numpy as np
import pytest

from fusionocc_tpu.config import tiny_model_config
from fusionocc_tpu.data.synthetic import synthetic_batch
from fusionocc_tpu.models.fusion_occ import FusionOcc
from fusionocc_tpu.train import torch_import as ti


@pytest.fixture(scope='module')
def trees():
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    batch = synthetic_batch(cfg, 1, 0, num_points=256)
    v = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(batch)
    return cfg, v['params'], v['batch_stats']


def _inverse_shape(conv, flax_shape):
    if conv is ti.conv2d:
        kh, kw, i, o = flax_shape
        return (o, i, kh, kw)
    if conv is ti.conv3d:
        kd, kh, kw, i, o = flax_shape
        return (o, i, kd, kh, kw)
    if conv is ti.linear:
        i, o = flax_shape
        return (o, i)
    if conv is ti.spconv:
        if len(flax_shape) == 3:
            _, i, o = flax_shape
            return (o, 3, 3, 3, i)
        i, o = flax_shape
        return (o, 1, 1, 1, i)
    return tuple(flax_shape)


def test_full_coverage_and_round_trip(trees):
    cfg, params, batch_stats = trees
    rules = ti.build_rules(cfg)
    rng = np.random.RandomState(0)

    sd = {}
    for kind, tree in (('params', params), ('batch_stats', batch_stats)):
        flat = ti._flatten(tree)
        for path, leaf in flat.items():
            rule = rules[kind].get(path)
            assert rule is not None, f'no import rule for {kind}:{path}'
            tkey, conv = rule
            if tkey not in sd:
                sd[tkey] = rng.randn(
                    *_inverse_shape(conv, tuple(leaf.shape))).astype(
                        np.float32)

    new_params, new_stats, report = ti.import_state_dict(
        sd, params, batch_stats, cfg)
    assert not report['missing_rule'], report['missing_rule'][:5]
    assert not report['missing_torch'], report['missing_torch'][:5]
    assert not report['shape_mismatch'], report['shape_mismatch'][:5]
    assert not report['unused_torch'], report['unused_torch'][:5]

    # spot-check conversions
    w = sd['final_conv.conv.weight']
    got = ti._flatten(new_params)['final_conv/kernel']
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(w, (2, 3, 4, 1, 0)))
    q = sd['img_backbone.stages.0.blocks.0.attn.w_msa.qkv.weight']
    got_q = ti._flatten(new_params)['img_backbone/stage0_block0/attn/qkv/kernel']
    np.testing.assert_allclose(np.asarray(got_q), q.T)
    sp = sd['lidar_encoder.encoder_layers.encoder_layer1.0.0.weight']
    got_sp = ti._flatten(new_params)['lidar_encoder/stage0_subm0/kernel']
    np.testing.assert_allclose(
        np.asarray(got_sp),
        np.transpose(sp.reshape(sp.shape[0], 27, sp.shape[-1]), (1, 2, 0)))


def test_imported_model_still_runs(trees):
    cfg, params, batch_stats = trees
    rules = ti.build_rules(cfg)
    rng = np.random.RandomState(1)
    sd = {}
    for kind, tree in (('params', params), ('batch_stats', batch_stats)):
        for path, leaf in ti._flatten(tree).items():
            tkey, conv = rules[kind][path]
            if tkey not in sd:
                sd[tkey] = (0.05 * rng.randn(
                    *_inverse_shape(conv, tuple(leaf.shape)))).astype(
                        np.float32)
            if 'running_var' in tkey or tkey.endswith('.weight') and \
                    'bn' in tkey.split('.')[-2]:
                sd[tkey] = np.abs(sd[tkey]) + 0.5
    new_params, new_stats, _ = ti.import_state_dict(
        sd, params, batch_stats, cfg, strict=False)
    model = FusionOcc(cfg)
    batch = synthetic_batch(cfg, 1, 0, num_points=256)
    out = jax.jit(lambda p, s, b: model.apply(
        {'params': p, 'batch_stats': s}, b, train=False)['occ_logits'])(
            new_params, new_stats, batch)
    assert np.all(np.isfinite(np.asarray(out)))
