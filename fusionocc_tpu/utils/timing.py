"""Trustworthy device timing on the tunnel-attached TPU.

`jax.block_until_ready` returns before device work completes on this
backend when outputs are small, and fetching a large output measures the
~12 MB/s tunnel instead of the device (CLAUDE.md; discovered when round-1's
"13 fps" turned out to be dispatch time).  The ONLY reliable barrier:
enqueue the work, then fetch a 4-byte scalar produced by a jitted reduction
of (a leaf of) the last output — device programs execute in launch order,
so the scalar's arrival bounds everything enqueued before it.

Every benchmark/profiling entry point (bench.py, tools/profile_*.py) must
time through these helpers so a future methodology fix lands everywhere at
once.  The reference's analog harness: tools/test.py:633-710 (CUDA-event
bracketing), mmdet3d/engine/hooks/benchmark_hook.py:14-38.
"""
from __future__ import annotations

import time
from typing import Callable, Sequence

__all__ = ['scalar_barrier', 'burst_best_mean', 'best_call_seconds']

_REDUCE = None


def _reduce_fn():
    global _REDUCE
    if _REDUCE is None:
        import jax
        import jax.numpy as jnp
        _REDUCE = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    return _REDUCE


def scalar_barrier(out) -> float:
    """Block until every program enqueued so far has executed.

    Reduces the first array leaf of ``out`` to one fp32 scalar on device
    and fetches those 4 bytes.  Returns the scalar (occasionally useful as
    a checksum)."""
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(_reduce_fn()(leaf)))


def burst_best_mean(run: Callable, inputs: Sequence, iters: int = 8,
                    bursts: int = 4, sleep: float = 2.0) -> float:
    """Best-burst mean seconds per call.

    Each burst ENQUEUES `iters` calls back-to-back and then barriers once:
    per-call dispatch overhead amortizes and a shared-tunnel contention
    spike poisons only the burst it lands in.  Callers must warm/compile
    `run` beforehand."""
    means = []
    for _ in range(bursts):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = run(inputs[i % len(inputs)])
        scalar_barrier(out)
        means.append((time.perf_counter() - t0) / iters)
        time.sleep(sleep)
    return min(means)


def best_call_seconds(fn: Callable, *args, n: int = 3,
                      warm: bool = True) -> float:
    """Min per-call seconds with a barrier after every call (latency mode,
    for stage bisection where per-call isolation matters)."""
    if warm:
        scalar_barrier(fn(*args))
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        scalar_barrier(fn(*args))
        lat.append(time.perf_counter() - t0)
    return min(lat)
