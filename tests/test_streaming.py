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


def test_streaming_scene_reset(setup):
    """reset=True at a scene boundary discards the cached feature: the
    prediction equals one from a fresh streaming state (tools/test.py resets
    on scene_token change, mirroring fusionocc_dataset.py:253-266)."""
    cfg, model, b, variables = setup
    b_new = synthetic_batch(cfg, 1, 3, num_points=512)
    step = jax.jit(lambda v, bb, s, r: model.apply(
        v, bb, s, reset=r, method=FusionOcc.predict_streaming))
    state = model.apply(variables, 1, method=FusionOcc.init_streaming_state)
    no_reset = jnp.zeros((1,), bool)

    # prime the cache with a frame from the "previous scene"
    _, _, s1 = step(variables, b, state, no_reset)
    assert bool(s1.valid[0])
    # new scene with reset: must equal a fresh-state prediction
    _, out_reset, s2 = step(variables, b_new, s1, jnp.ones((1,), bool))
    _, out_fresh, _ = step(variables, b_new, state, no_reset)
    np.testing.assert_allclose(np.asarray(out_reset['occ_logits']),
                               np.asarray(out_fresh['occ_logits']),
                               rtol=1e-5, atol=1e-5)
    assert bool(s2.valid[0])  # cache re-primed after the reset frame
    # control: carrying the stale cache across the boundary does NOT equal
    # the fresh prediction (the bug the reset fixes)
    _, out_stale, _ = step(variables, b_new, s1, no_reset)
    assert not np.allclose(np.asarray(out_stale['occ_logits']),
                           np.asarray(out_fresh['occ_logits']),
                           rtol=1e-5, atol=1e-5)


def test_streaming_vs_twopass_real_motion():
    """Under non-identity ego motion the streaming (warped-cache) prediction
    must agree with the conventional two-pass forward on most voxels: the
    cache path replaces re-pooling the previous images through the full
    geometry with a bilinear BEV warp (fusion_occ.py:329-428 semantics)."""
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    b0 = synthetic_batch(cfg, 1, 0, num_points=512)
    b1 = synthetic_batch(cfg, 1, 1, num_points=512)
    # frame t's adjacent images ARE frame t-1's key images; poses already
    # consistent (synthetic ego advances +0.5 m/frame, adj frame s2k -0.5 m)
    b1 = b1._replace(imgs=np.concatenate(
        [b1.imgs[:, :1], b0.imgs[:, :1]], axis=1))
    variables = jax.jit(lambda bb: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        bb, train=False))(b0)

    full = jax.jit(lambda v, bb: model.apply(
        v, bb, train=False))(variables, b1)['occ_logits']
    pred_full = np.argmax(np.asarray(full), -1)

    step = jax.jit(lambda v, bb, s: model.apply(
        v, bb, s, method=FusionOcc.predict_streaming))
    state = model.apply(variables, 1, method=FusionOcc.init_streaming_state)
    _, _, s1 = step(variables, b0, state)
    pred_s, out_s, _ = step(variables, b1, s1)

    agree = float(np.mean(np.argmax(np.asarray(out_s['occ_logits']), -1)
                          == pred_full))
    mae = float(np.mean(np.abs(np.asarray(out_s['occ_logits'])
                               - np.asarray(full))))
    scale = float(np.mean(np.abs(np.asarray(full))))
    assert agree > 0.95, f'streaming/two-pass voxel agreement {agree}'
    assert mae < 0.15 * scale, (mae, scale)


def test_predict_with_cached_pool_index_matches():
    """predict(pool_idxs=precomputed) == predict() — the accelerate path
    changes where the rank sort runs, not the math."""
    from fusionocc_tpu.models.fusion_occ import frame_pooling_index
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    b = synthetic_batch(cfg, 1, 2, num_points=512)
    variables = jax.jit(lambda bb: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        bb, train=False))(b)
    ref = jax.jit(lambda v, bb: model.apply(
        v, bb, method=FusionOcc.predict))(variables, b)
    idx_key = jax.jit(lambda bb: frame_pooling_index(
        cfg, bb.sensor2keyego[:, 0], bb.intrins[:, 0], bb.post_rots[:, 0],
        bb.post_trans[:, 0], bb.bda))(b)
    pool_idxs = (idx_key,) + (None,) * (cfg.num_frame - 1)
    got = jax.jit(lambda v, bb, pi: model.apply(
        v, bb, pool_idxs=pi, method=FusionOcc.predict))(variables, b,
                                                        pool_idxs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


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


def test_streaming_scan_matches_sequential():
    """predict_streaming_scan (whole clip in one program) == T sequential
    predict_streaming calls, including a mid-clip scene reset."""
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    frames = [synthetic_batch(cfg, 1, s, num_points=512) for s in range(3)]
    variables = jax.jit(lambda bb: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        bb, train=False))(frames[0])
    state = model.apply(variables, 1, method=FusionOcc.init_streaming_state)
    resets = np.array([[False], [False], [True]])

    step = jax.jit(lambda v, bb, s, r: model.apply(
        v, bb, s, reset=r, method=FusionOcc.predict_streaming))
    seq_preds, s_seq = [], state
    for b, r in zip(frames, resets):
        p, _, s_seq = step(variables, b, s_seq, jnp.asarray(r))
        seq_preds.append(np.asarray(p))

    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0), *frames)
    scan_fn = jax.jit(lambda v, f, s, r: model.apply(
        v, f, s, resets=r, method=FusionOcc.predict_streaming_scan))
    preds, s_scan = scan_fn(variables, stacked, state, jnp.asarray(resets))
    assert preds.shape[0] == 3
    for t in range(3):
        np.testing.assert_array_equal(np.asarray(preds[t]), seq_preds[t])
    np.testing.assert_allclose(np.asarray(s_scan.voxel_feat),
                               np.asarray(s_seq.voxel_feat), atol=1e-6)


def test_streaming_batch_matches_scan():
    """predict_streaming_batch (time folded into batch) == the scan path,
    including a mid-clip reset and a chunk boundary (T=4, chunk=2)."""
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    frames = [synthetic_batch(cfg, 1, s, num_points=512) for s in range(4)]
    variables = jax.jit(lambda bb: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        bb, train=False))(frames[0])
    state = model.apply(variables, 1, method=FusionOcc.init_streaming_state)
    resets = jnp.asarray(np.array([[False], [False], [True], [False]]))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *frames)

    scan_fn = jax.jit(lambda v, f, s, r: model.apply(
        v, f, s, resets=r, method=FusionOcc.predict_streaming_scan))
    ref_preds, s_ref = scan_fn(variables, stacked, state, resets)

    for chunk in (2, 4):
        bat_fn = jax.jit(lambda v, f, s, r, c=chunk: model.apply(
            v, f, s, resets=r, chunk=c,
            method=FusionOcc.predict_streaming_batch))
        preds, s_got = bat_fn(variables, stacked, state, resets)
        np.testing.assert_array_equal(np.asarray(preds),
                                      np.asarray(ref_preds))
        # conv accumulation order shifts with the folded batch size:
        # features agree to ~1e-4 relative, predictions bit-exactly
        np.testing.assert_allclose(np.asarray(s_got.voxel_feat),
                                   np.asarray(s_ref.voxel_feat), rtol=1e-3,
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(s_got.valid),
                                      np.asarray(s_ref.valid))


def test_streaming_batch_cam_microbatch_matches():
    """cam_chunk (camera encoder microbatched inside the block via lax.map)
    must not change predictions vs the full-chunk camera pass."""
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    frames = [synthetic_batch(cfg, 1, s, num_points=512) for s in range(4)]
    variables = jax.jit(lambda bb: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        bb, train=False))(frames[0])
    state = model.apply(variables, 1, method=FusionOcc.init_streaming_state)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *frames)

    ref, _ = jax.jit(lambda v, f, s: model.apply(
        v, f, s, chunk=4, method=FusionOcc.predict_streaming_batch))(
        variables, stacked, state)
    got, _ = jax.jit(lambda v, f, s: model.apply(
        v, f, s, chunk=4, cam_chunk=2,
        method=FusionOcc.predict_streaming_batch))(variables, stacked, state)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
