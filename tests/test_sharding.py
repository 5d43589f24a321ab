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
