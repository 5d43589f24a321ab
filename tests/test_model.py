"""End-to-end model smoke tests on the tiny config: init, forward shapes,
loss computation, gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionocc_tpu.config import tiny_model_config
from fusionocc_tpu.data.synthetic import synthetic_batch
from fusionocc_tpu.models.fusion_occ import FusionOcc
from fusionocc_tpu.train.losses import total_loss


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    batch = synthetic_batch(cfg, batch_size=1, seed=0, num_points=512)
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        batch, train=False)
    return cfg, model, batch, variables


def test_forward_shapes(setup):
    cfg, model, batch, variables = setup
    out = model.apply(variables, batch, train=False)
    gx, gy, gz = cfg.grid.grid_size
    assert out['occ_logits'].shape == (1, gx, gy, gz, cfg.num_classes)
    h, w = cfg.feat_size
    D = cfg.grid.num_depth_bins
    assert out['depth'].shape == (1, cfg.num_cams, h, w, D)
    assert out['seg_logits'].shape == (1, cfg.num_cams, h, w,
                                       cfg.vt.seg_num_classes)
    # depth is a distribution
    s = np.asarray(jnp.sum(out['depth'], axis=-1))
    np.testing.assert_allclose(s, np.ones_like(s), atol=1e-4)
    assert np.all(np.isfinite(np.asarray(out['occ_logits'])))


def test_train_mode_loss_and_grads(setup):
    cfg, model, batch, variables = setup

    def loss_fn(params):
        out, new_state = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, train=True,
            rngs={'dropout': jax.random.PRNGKey(2)},
            mutable=['batch_stats'])
        loss, logs = total_loss(out, batch, cfg)
        return loss, logs

    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables['params'])
    assert np.isfinite(float(loss))
    for k in ('depth_loss', 'seg_loss', 'loss_occ'):
        assert np.isfinite(float(logs[k])), k
    # gradient reaches every major subtree
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero_roots = set()
    for path, leaf in flat:
        if np.any(np.abs(np.asarray(leaf)) > 0):
            nonzero_roots.add(path[0].key)
    for root in ('img_backbone', 'img_neck', 'img_view_transformer',
                 'lidar_encoder', 'bev_backbone', 'bev_neck', 'final_conv',
                 'predicter_fc1', 'predicter_fc2', 'pre_process_net'):
        assert root in nonzero_roots, f'no gradient into {root}'


def test_predict_dtype(setup):
    cfg, model, batch, variables = setup
    pred = model.apply(variables, batch, method=FusionOcc.predict)
    assert pred.dtype == jnp.uint8
    assert pred.shape == (1,) + cfg.grid.grid_size
    assert int(np.max(np.asarray(pred))) < cfg.num_classes


def test_batched_frames_matches_loop():
    """Eval with all temporal frames folded into the batch axis
    (batch_frames=True) == the per-frame loop, bit-for-bit semantics."""
    import jax
    import numpy as np
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.fusion_occ import FusionOcc

    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    b = synthetic_batch(cfg, 2, 1, num_points=512)
    variables = jax.jit(lambda bb: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        bb, train=False))(b)
    ref = jax.jit(lambda v, bb: model.apply(v, bb, train=False))(
        variables, b)
    got = jax.jit(lambda v, bb: model.apply(
        v, bb, train=False, batch_frames=True))(variables, b)
    np.testing.assert_allclose(np.asarray(got['occ_logits']),
                               np.asarray(ref['occ_logits']),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got['depth']),
                               np.asarray(ref['depth']), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got['seg_logits']),
                               np.asarray(ref['seg_logits']), rtol=1e-4,
                               atol=1e-5)


def test_batched_frames_folded_pool_idx_matches_in_graph():
    """batch_frames=True with a PRECOMPUTED (B*F)-folded pooling index (the
    accelerate path bench.py uses) == the in-graph rank sort, bit-for-bit."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.fusion_occ import (FusionOcc,
                                                 frame_pooling_index)

    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    b = synthetic_batch(cfg, 2, 3, num_points=512)
    variables = jax.jit(lambda bb: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        bb, train=False))(b)

    def f2(a):
        return a.reshape((-1,) + a.shape[2:])
    pool = jax.jit(lambda bb: frame_pooling_index(
        cfg, f2(bb.sensor2keyego), f2(bb.intrins), f2(bb.post_rots),
        f2(bb.post_trans), jnp.repeat(bb.bda, cfg.num_frame, axis=0)))(b)

    ref = jax.jit(lambda v, bb: model.apply(
        v, bb, train=False, batch_frames=True))(variables, b)
    got = jax.jit(lambda v, bb, pi: model.apply(
        v, bb, train=False, batch_frames=True, pool_idx_folded=pi))(
        variables, b, pool)
    np.testing.assert_array_equal(np.asarray(got['occ_logits']),
                                  np.asarray(ref['occ_logits']))
