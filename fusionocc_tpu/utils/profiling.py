"""Performance instrumentation.

TPU equivalent of the reference's measurement harness
(tools/test.py:600-710: cuda.synchronize-bracketed latency percentiles,
allocator + driver memory; mmdet3d/engine/hooks/benchmark_hook.py): blocking
latency loops, device memory stats, and jax.profiler trace capture.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax
import numpy as np


def measure_latency(fn: Callable, *args, warmup: int = 5, iters: int = 20
                    ) -> Dict[str, float]:
    """Blocking latency statistics of a jitted callable."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    lat: List[float] = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        lat.append(time.perf_counter() - t0)
    arr = np.asarray(lat) * 1000
    return {
        'mean_ms': float(arr.mean()),
        'p50_ms': float(np.percentile(arr, 50)),
        'p90_ms': float(np.percentile(arr, 90)),
        'p99_ms': float(np.percentile(arr, 99)),
        'fps': 1000.0 / float(arr.mean()),
    }


def device_memory_stats(device=None) -> Dict[str, float]:
    """Per-device memory (bytes) where the backend exposes it."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, 'memory_stats', lambda: None)()
    if not stats:
        return {}
    keep = ('bytes_in_use', 'peak_bytes_in_use', 'bytes_limit',
            'largest_alloc_size')
    return {k: float(stats[k]) for k in keep if k in stats}


@contextlib.contextmanager
def profiler_trace(logdir: str = '/tmp/fusionocc_trace'):
    """Capture a jax.profiler trace (view with tensorboard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def param_memory_report(params) -> Dict[str, float]:
    """Parameter count + memory by top-level module (tools/test.py:590-599)."""
    out: Dict[str, float] = {}
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        root = path[0].key
        n = int(np.prod(leaf.shape))
        out[root] = out.get(root, 0) + n
        total += n
    out['total_params'] = total
    out['total_mb_fp32'] = total * 4 / 2 ** 20
    return out
