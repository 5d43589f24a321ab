"""Pallas TPU kernel for the frustum-pooling segmented reduction.

The bev_pool forward needs, for rank-sorted points,
    csum[i] = sum_{j<=i} depth[j] * feat_row[j]
evaluated only at segment boundaries.  jnp.cumsum over the (P, C) product
(P ~ 1.5M) lowers to a multi-pass scan on TPU; this kernel fuses the
depth*feat product with a single-pass chunked cumsum:

  pass (Pallas): per point-block of size BLK, local cumsum + block total
  combine (XLA): tiny exclusive cumsum over the (P/BLK, C) block totals;
  boundary values are then local[pos] + carry[pos // BLK] — pure gathers.

Exact (fp32 adds, same values, different association), single HBM round trip.
Falls back to interpret mode off-TPU so the CPU test suite exercises the
same code path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..search import searchsorted
from jax.experimental import pallas as pl

BLK = 2048


def _kernel(d_ref, f_ref, csum_ref):
    prod = d_ref[:] * f_ref[:]          # (BLK, 1) * (BLK, C)
    # in-block inclusive scan as log2(BLK) shifted adds (Hillis-Steele);
    # cumsum is not a Pallas TPU primitive
    c = prod
    n, C = c.shape
    step = 1
    while step < n:
        shifted = jnp.concatenate(
            [jnp.zeros((step, C), c.dtype), c[:-step]], axis=0)
        c = c + shifted
        step *= 2
    csum_ref[:] = c


def _use_interpret() -> bool:
    return jax.default_backend() != 'tpu'


@functools.partial(jax.jit, static_argnames=())
def chunked_cumsum(depth_vals: jnp.ndarray, feat_rows: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(local_csum (P, C), carry (P/BLK + 1, C)) for prod = d[:,None]*f.

    P must be a multiple of BLK (frustum sizes are; callers pad otherwise).
    carry[b] = total of all blocks before b (exclusive scan).
    """
    P, C = feat_rows.shape
    assert P % BLK == 0, P
    nb = P // BLK
    local = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((BLK, 1), lambda i: (i, 0)),
                  pl.BlockSpec((BLK, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        interpret=_use_interpret(),
    )(depth_vals.astype(jnp.float32).reshape(P, 1),
      feat_rows.astype(jnp.float32))
    bsums = local[BLK - 1::BLK]                       # (nb, C) block totals
    carry = jnp.concatenate(
        [jnp.zeros((1, C), jnp.float32), jnp.cumsum(bsums, axis=0)], axis=0)
    return local, carry


def boundary_segment_sum(depth_vals: jnp.ndarray, feat_rows: jnp.ndarray,
                         seg: jnp.ndarray, num_segments: int,
                         bounds: jnp.ndarray | None = None) -> jnp.ndarray:
    """Segmented sum of depth*feat over ascending ``seg`` via the kernel.

    Equivalent to ops.bev_pool._sorted_segment_sum(d[:,None]*f, seg, n) but
    with the product+scan fused into one Pallas pass.  ``bounds`` (the
    (num_segments+1,) segment boundaries) can be precomputed at pooling-index
    prepare time — the geometry is static at eval — dropping the per-frame
    binary search.
    """
    P, C = feat_rows.shape
    local, carry = chunked_cumsum(depth_vals, feat_rows)

    def csum_at(pos):
        # inclusive prefix sum of the first `pos` elements (pos in [0, P])
        idx = jnp.clip(pos - 1, 0, P - 1)
        v = local[idx] + carry[idx // BLK]
        return jnp.where((pos > 0)[:, None], v, 0.0)

    if bounds is None:
        bounds = searchsorted(
            seg, jnp.arange(num_segments + 1, dtype=seg.dtype))
    return csum_at(bounds[1:]) - csum_at(bounds[:-1])
