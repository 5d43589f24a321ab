"""Post-training quantization (the TPU-native analog of the reference's
fp16 / TensorRT-INT8 deployment path, precision_utils.py:30-131).

Two levels:
  - Weight-only int8: per-output-channel symmetric quantization of conv /
    dense kernels.  Parameters ship as int8 + fp32 scales (4x smaller
    checkpoints, 4x less HBM weight traffic) and are dequantized to the
    compute dtype at load; numerics stay within bf16 noise for this model
    family.  `quantize_tree` / `dequantize_tree` operate on whole flax
    parameter pytrees so any sub-tree (e.g. just the Swin backbone) can be
    quantized.
  - int8 matmul kernel: `int8_dot` runs an actual int8xint8->int32 MXU
    matmul with dynamic per-tensor activation quantization — the building
    block for fully-quantized serving heads.

The reference's INT8 path calibrates TensorRT engines offline
(precision_utils `prepare_int8_calibrator`); here calibration reduces to
choosing scales, which the symmetric per-channel rule derives from the
weights themselves (weights) or from a max-abs running estimate
(activations, `calibrate_activation_scale`).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_kernel(path: Tuple[str, ...], leaf) -> bool:
    name = path[-1]
    return name in ('kernel', 'conv_input_kernel', 'conv_out_kernel') \
        and np.ndim(leaf) >= 2


def quantize_tree(params, include: Sequence[str] = (),
                  bits: int = 8) -> Tuple[Any, Any]:
    """Per-output-channel symmetric int8 quantization of kernel leaves.

    Args:
      params: flax params pytree.
      include: top-level module names to quantize (empty = all).
    Returns (qparams, meta): qparams has int8 kernels (other leaves
    untouched); meta maps the same tree positions to fp32 scale vectors
    (None for unquantized leaves).
    """
    qmax = 2 ** (bits - 1) - 1

    def quant(path, leaf):
        keys = tuple(getattr(p, 'key', str(p)) for p in path)
        if include and keys[0] not in include:
            return leaf, None
        if not _is_kernel(keys, leaf):
            return leaf, None
        w = np.asarray(leaf, np.float32)
        # output channel = last axis for flax kernels
        amax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
        scale = np.maximum(amax, 1e-12) / qmax
        q = np.clip(np.round(w / scale), -qmax - 1, qmax).astype(np.int8)
        return q, scale.astype(np.float32)

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    qs, scales = [], []
    for path, leaf in leaves:
        q, s = quant(path, leaf)
        qs.append(q)
        scales.append(s)
    return (jax.tree_util.tree_unflatten(treedef, qs),
            jax.tree_util.tree_unflatten(
                treedef, [s if s is not None else () for s in scales]))


def dequantize_tree(qparams, meta, dtype=jnp.float32):
    """Reconstruct a dense pytree from quantize_tree output."""
    def deq(q, s):
        if isinstance(s, tuple) and s == ():
            return q
        return (jnp.asarray(q, jnp.float32) * s).astype(dtype)
    return jax.tree_util.tree_map(
        deq, qparams, meta,
        is_leaf=lambda x: isinstance(x, tuple) and x == ())


def quantized_size_bytes(qparams, meta) -> Dict[str, int]:
    """Storage accounting: int8 payload + scales vs fp32."""
    q_bytes = fp_bytes = 0
    for (path, leaf), (_, s) in zip(
            jax.tree_util.tree_flatten_with_path(qparams)[0],
            jax.tree_util.tree_flatten_with_path(meta)[0]):
        n = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        fp_bytes += n * 4
        if np.asarray(leaf).dtype == np.int8:
            q_bytes += n + int(np.prod(np.shape(s))) * 4
        else:
            q_bytes += n * 4
    return {'quantized_bytes': q_bytes, 'fp32_bytes': fp_bytes,
            'ratio': round(fp_bytes / max(q_bytes, 1), 2)}


def calibrate_activation_scale(batches_of_acts) -> float:
    """Max-abs activation scale over calibration batches (per-tensor)."""
    amax = 0.0
    for a in batches_of_acts:
        amax = max(amax, float(np.max(np.abs(np.asarray(a)))))
    return max(amax, 1e-12) / 127.0


def int8_dot_general(lhs: jnp.ndarray, rhs: jnp.ndarray,
                     dimension_numbers, precision=None,
                     preferred_element_type=None) -> jnp.ndarray:
    """Drop-in ``dot_general`` for flax Dense layers: int8 MXU serving.

    Route any ``nn.Dense`` through a real int8 x int8 -> int32 MXU matmul
    (2x the bf16 MXU rate on v5e) by passing ``dot_general=int8_dot_general``
    — the TPU-native analog of the reference's TensorRT INT8 engine
    injection (precision_utils.py:30-131, tools/test.py:162-168).
    Per-output-channel symmetric weight quantization and per-tensor dynamic
    activation quantization happen inside the program; scales are
    data-dependent scalars, so there is no calibration file and no host
    sync.  The per-call weight requantization is O(K*N) elementwise —
    noise next to the O(M*K*N) matmul it feeds.

    Only the Dense contraction pattern is supported: lhs (..., K) by
    rhs (K, N).
    """
    (lc, rc), (lb, rb) = dimension_numbers
    assert (tuple(lb), tuple(rb)) == ((), ()) and tuple(rc) == (0,) \
        and tuple(lc) == (lhs.ndim - 1,), dimension_numbers
    xf = lhs.astype(jnp.float32)
    x_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    wf = rhs.astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(wf / w_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(x_q, w_q, dimension_numbers,
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (x_scale * w_scale)).astype(lhs.dtype)


def int8_dot(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
             x_scale: float | None = None) -> jnp.ndarray:
    """int8 x int8 -> int32 matmul on the MXU, rescaled to float32.

    x: (..., K) float; w_q: (K, N) int8; w_scale: (1, N) or scalar fp32.
    x_scale None = dynamic per-call max-abs quantization of x.
    """
    xf = x.astype(jnp.float32)
    if x_scale is None:
        x_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / x_scale), -128, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (x_scale * w_scale.reshape(-1))
