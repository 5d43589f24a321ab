"""Checkpoint save/restore round trip (orbax) and resume semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionocc_tpu.config import OptimConfig, TrainConfig, tiny_model_config
from fusionocc_tpu.data.synthetic import synthetic_batch
from fusionocc_tpu.train import checkpoint as ckpt
from fusionocc_tpu.train.loop import (create_train_state, make_optimizer,
                                      train_step)


def test_save_restore_round_trip(tmp_path):
    cfg = TrainConfig(model=tiny_model_config(),
                      optim=OptimConfig(warmup_iters=5, iters_per_epoch=10))
    batch = synthetic_batch(cfg.model, 1, seed=0, num_points=256)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg.optim)
    import functools
    step = jax.jit(functools.partial(train_step, model, tx, cfg))
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    path = ckpt.save_checkpoint(str(tmp_path / 'ck'), jax.device_get(state))
    assert ckpt.latest_checkpoint(str(tmp_path / 'ck')) == path

    _, fresh = create_train_state(cfg, jax.random.PRNGKey(7), batch)
    restored = ckpt.restore_checkpoint(path, jax.device_get(fresh))
    assert int(restored.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    state3, logs = step(restored, batch, jax.random.PRNGKey(2))
    assert int(state3.step) == 3
    assert np.isfinite(float(logs['loss']))


def test_bf16_policy_drift_is_bounded():
    """bf16 compute vs fp32 compute on identical params: the occupancy
    ARGMAX prediction must agree on the overwhelming majority of voxels
    (guardrail for the mIoU-within-0.2 budget)."""
    import dataclasses
    cfg32 = tiny_model_config()
    cfg16 = dataclasses.replace(cfg32, compute_dtype='bfloat16')
    from fusionocc_tpu.models.fusion_occ import FusionOcc
    batch = synthetic_batch(cfg32, 1, seed=0, num_points=256)
    m32, m16 = FusionOcc(cfg32), FusionOcc(cfg16)
    v = jax.jit(lambda b: m32.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(batch)
    p32 = jax.jit(lambda v, b: m32.apply(v, b, method=FusionOcc.predict))(
        v, batch)
    p16 = jax.jit(lambda v, b: m16.apply(v, b, method=FusionOcc.predict))(
        v, batch)
    agree = float(np.mean(np.asarray(p32) == np.asarray(p16)))
    assert agree > 0.98, f'bf16 argmax agreement only {agree:.4f}'


def test_checkpoint_compat_across_variants(tmp_path):
    """Checkpoints transfer between variants that share the architecture
    (mask/loss ablations) and fail loudly across structural changes
    (image-only has no lidar params)."""
    import dataclasses
    import jax
    import numpy as np
    from fusionocc_tpu.config import TrainConfig, tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.train import checkpoint as ckpt
    from fusionocc_tpu.train.loop import create_train_state

    base = tiny_model_config()
    batch = synthetic_batch(base, 1, 0, num_points=512)
    _, state = create_train_state(TrainConfig(model=base),
                                  jax.random.PRNGKey(0), batch)
    tag = ckpt.save_checkpoint(str(tmp_path), state, step=1)

    # same architecture, different training semantics: loads fine
    womask = dataclasses.replace(base, use_mask=False,
                                 mask_mode='baseline_like')
    _, s2 = create_train_state(TrainConfig(model=womask),
                               jax.random.PRNGKey(1), batch)
    restored = ckpt.restore_checkpoint(tag, s2)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # structural change: image-only model has no lidar encoder params
    img_only = dataclasses.replace(base, use_lidar=False)
    _, s3 = create_train_state(TrainConfig(model=img_only),
                               jax.random.PRNGKey(2), batch)
    try:
        ckpt.restore_checkpoint(tag, s3)
        raised = False
    except Exception:
        raised = True
    assert raised, 'structural mismatch restored silently'
