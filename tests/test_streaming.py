"""Streaming (cached-BEV) inference vs the full two-frame forward."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionocc_tpu.config import tiny_model_config
from fusionocc_tpu.data.synthetic import synthetic_batch
from fusionocc_tpu.models.fusion_occ import Batch, FusionOcc, StreamingState


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    batch = synthetic_batch(cfg, 1, 0, num_points=512)
    # make the adjacent frame IDENTICAL to the key frame
    b = batch._replace(
        imgs=np.repeat(batch.imgs[:, :1], 2, axis=1),
        sensor2keyego=np.repeat(batch.sensor2keyego[:, :1], 2, axis=1),
        intrins=np.repeat(batch.intrins[:, :1], 2, axis=1),
        post_rots=np.repeat(batch.post_rots[:, :1], 2, axis=1),
        post_trans=np.repeat(batch.post_trans[:, :1], 2, axis=1))
    variables = jax.jit(lambda bb: FusionOcc(cfg).init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        bb, train=False))(b)
    return cfg, model, b, variables


def test_streaming_first_frame_matches_full(setup):
    """With an invalid cache the current feature substitutes for the
    adjacent one — identical to the full forward when both frames are the
    same images/poses."""
    cfg, model, b, variables = setup
    full_logits = jax.jit(lambda v, bb: model.apply(
        v, bb, train=False))(variables, b)['occ_logits']

    state = model.apply(variables, 1,
                        method=FusionOcc.init_streaming_state)
    pred, out, new_state = jax.jit(lambda v, bb, s: model.apply(
        v, bb, s, method=FusionOcc.predict_streaming))(variables, b, state)
    np.testing.assert_allclose(np.asarray(out['occ_logits']),
                               np.asarray(full_logits), rtol=2e-2, atol=2e-2)
    assert bool(new_state.valid[0])
    assert new_state.voxel_feat.shape == state.voxel_feat.shape


def test_streaming_identity_motion_second_frame(setup):
    """Second streaming step with identical ego pose: the warped cache is a
    (bilinear-resampled) copy of the previous feature; prediction stays
    finite and shaped; the cache updates."""
    cfg, model, b, variables = setup
    state = model.apply(variables, 1, method=FusionOcc.init_streaming_state)
    step = jax.jit(lambda v, bb, s: model.apply(
        v, bb, s, method=FusionOcc.predict_streaming))
    pred1, _, s1 = step(variables, b, state)
    pred2, out2, s2 = step(variables, b, s1)
    assert pred2.shape == (1,) + cfg.grid.grid_size
    assert np.all(np.isfinite(np.asarray(out2['occ_logits'])))
    # identity-motion warp of the cached feature ~ the feature itself
    np.testing.assert_allclose(np.asarray(s2.voxel_feat),
                               np.asarray(s1.voxel_feat), atol=1e-5)


def test_shift_bev_translation(setup):
    """A +x ego translation shifts the sampled feature by the right number
    of grid cells."""
    cfg, model, b, variables = setup
    gx, gy, gz = cfg.grid.grid_size
    feat = np.zeros((1, gz, gy, gx, 2), np.float32)
    feat[0, :, 5, 8, :] = 1.0  # spike at x-index 8, y-index 5
    # dst ego is 2 cells (+2*interval) ahead in x: dst2src translates +x
    dx = 2 * float(np.asarray(cfg.grid.interval)[0])
    dst2src = np.eye(4, dtype=np.float32)[None].copy()
    dst2src[0, 0, 3] = dx
    warped = model.apply(variables, jnp.asarray(feat), jnp.asarray(dst2src),
                         method=FusionOcc._shift_bev)
    w = np.asarray(warped)
    # the spike should now appear at x-index 6 (dst cell whose src maps to 8)
    assert w[0, 0, 5, 6, 0] > 0.9, w[0, 0, 5, :, 0]
    assert w[0, 0, 5, 8, 0] < 0.1
