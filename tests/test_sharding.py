"""Data-parallel sharding: train step over an 8-device mesh must equal the
single-device step (same math, different partitioning), and BN stats must be
global (SyncBN semantics)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fusionocc_tpu.config import OptimConfig, TrainConfig, tiny_model_config
from fusionocc_tpu.data.synthetic import synthetic_batch
from fusionocc_tpu.train.loop import (create_train_state, make_optimizer,
                                      train_step)


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs >=4 devices')
def test_spatial_sharding_matches_unsharded_forward():
    """Model-parallel (data x spatial) forward == unsharded forward."""
    from fusionocc_tpu.data.synthetic import synthetic_batch as sb
    from fusionocc_tpu.models.fusion_occ import FusionOcc
    from fusionocc_tpu.parallel.mesh import hybrid_mesh

    cfg = tiny_model_config()
    batch = sb(cfg, batch_size=2, seed=0, num_points=512)
    mesh = hybrid_mesh(2, 2)
    model_sp = FusionOcc(cfg, mesh=mesh)
    model = FusionOcc(cfg)
    variables = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(batch)

    ref = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)['occ_logits']

    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P('data'))
    v_r = jax.device_put(variables, repl)
    b_s = jax.tree_util.tree_map(lambda x: jax.device_put(x, dsh), batch)
    got = jax.jit(lambda v, b: model_sp.apply(v, b, train=False),
                  in_shardings=(repl, dsh))(v_r, b_s)['occ_logits']
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs >=4 devices')
def test_sharded_step_matches_single_device():
    n_dev = 4
    cfg = TrainConfig(model=tiny_model_config(),
                      optim=OptimConfig(warmup_iters=10, iters_per_epoch=10))
    batch = synthetic_batch(cfg.model, batch_size=n_dev, seed=0,
                            num_points=512)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg.optim)
    rng = jax.random.PRNGKey(42)
    step = functools.partial(train_step, model, tx, cfg)

    # single device
    s1, logs1 = jax.jit(step)(state, batch, rng)

    # sharded over 4 devices
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ('data',))
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P('data'))
    state_r = jax.device_put(state, repl)
    batch_s = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, dsh), batch)
    sN, logsN = jax.jit(step, in_shardings=(repl, dsh, repl),
                        out_shardings=(repl, repl))(state_r, batch_s, rng)

    assert np.isclose(float(logs1['loss']), float(logsN['loss']),
                      rtol=1e-3), (float(logs1['loss']), float(logsN['loss']))
    # parameters after one step agree (gradient allreduce == global grad)
    l1 = jax.tree_util.tree_leaves(s1.params)
    lN = jax.tree_util.tree_leaves(sN.params)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(l1, lN))
    assert worst < 5e-3, worst
    # BN stats global: batch_stats must match too (SyncBN equivalence)
    b1 = jax.tree_util.tree_leaves(s1.batch_stats)
    bN = jax.tree_util.tree_leaves(sN.batch_stats)
    worst_bn = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(b1, bN))
    assert worst_bn < 1e-3, worst_bn


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_confusion_matrix_global_under_data_sharding():
    """Distributed eval: the jitted confusion matrix over a batch sharded on
    the 'data' axis must equal the global (unsharded) matrix — XLA inserts
    the cross-device reduction because the output is replicated.  This is
    the device-level half of the reference's cross-rank result gather
    (occupancy_metric.py:28-35); the cross-process half is
    OccupancyMetric.reduced_hist."""
    from fusionocc_tpu.eval.metrics import confusion_matrix

    rng = np.random.RandomState(0)
    B, X, Y, Z = 8, 10, 10, 4
    pred = rng.randint(0, 18, (B, X, Y, Z)).astype(np.int32)
    gt = rng.randint(0, 18, (B, X, Y, Z)).astype(np.int32)
    mask = rng.rand(B, X, Y, Z) > 0.4

    ref = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt),
                                      jnp.asarray(mask)))
    # sum of per-shard matrices == global matrix (what a psum over 'data'
    # computes)
    parts = sum(np.asarray(confusion_matrix(jnp.asarray(pred[i:i + 1]),
                                            jnp.asarray(gt[i:i + 1]),
                                            jnp.asarray(mask[i:i + 1])))
                for i in range(B))
    np.testing.assert_array_equal(parts, ref)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ('data',))
    dsh = NamedSharding(mesh, P('data'))
    repl = NamedSharding(mesh, P())
    args = [jax.device_put(jnp.asarray(a), dsh) for a in (pred, gt, mask)]
    got = jax.jit(confusion_matrix, in_shardings=(dsh, dsh, dsh),
                  out_shardings=repl)(*args)
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs >=4 devices')
def test_streaming_batch_under_hybrid_mesh():
    """The streaming SERVING path (predict_streaming_batch) under a 2x2
    data x spatial mesh must match the single-device run: batch sharded
    over 'data', cameras/BEV grid model-parallel over 'spatial' — the
    multi-chip deployment mode for the latency north star."""
    from fusionocc_tpu.models.fusion_occ import FusionOcc
    from fusionocc_tpu.parallel.mesh import hybrid_mesh

    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    T, B = 4, 2
    frames = [synthetic_batch(cfg, B, s, num_points=512) for s in range(T)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *frames)
    variables = jax.jit(lambda bb: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        bb, train=False))(frames[0])
    state = model.apply(variables, B, method=FusionOcc.init_streaming_state)
    resets = jnp.asarray(np.array([[False] * B, [False] * B,
                                   [True] * B, [False] * B]))

    ref, s_ref = jax.jit(lambda v, f, s, r: model.apply(
        v, f, s, resets=r, chunk=2,
        method=FusionOcc.predict_streaming_batch))(
        variables, stacked, state, resets)

    mesh = hybrid_mesh(2, 2)
    model_sp = FusionOcc(cfg, mesh=mesh)
    repl = NamedSharding(mesh, P())
    tb = NamedSharding(mesh, P(None, 'data'))       # (T, B, ...) on batch
    bsh = NamedSharding(mesh, P('data'))            # state on batch
    v_r = jax.device_put(variables, repl)
    f_s = jax.tree_util.tree_map(lambda x: jax.device_put(x, tb), stacked)
    st_s = jax.tree_util.tree_map(lambda x: jax.device_put(x, bsh), state)
    got, s_got = jax.jit(
        lambda v, f, s, r: model_sp.apply(
            v, f, s, resets=r, chunk=2,
            method=FusionOcc.predict_streaming_batch),
        in_shardings=(repl, tb, bsh, jax.device_put(resets, tb).sharding))(
        v_r, f_s, st_s, jax.device_put(resets, tb))

    # class-id agreement: conv reduction order shifts under spatial
    # partitioning, so compare predictions (uint8) with a tiny tolerance
    # on the handful of boundary ties, and the carried state numerically
    agree = (np.asarray(got) == np.asarray(ref)).mean()
    assert agree > 0.999, agree
    np.testing.assert_allclose(np.asarray(s_got.voxel_feat),
                               np.asarray(s_ref.voxel_feat),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(s_got.valid),
                                  np.asarray(s_ref.valid))
