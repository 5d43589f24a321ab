"""Backend-tuned binary search.

On TPU, XLA lowers ``jnp.searchsorted``'s default binary search to ~log2(n)
rounds of scalar gathers — measured ~490 ms for 3.5M queries over 131k keys
(tools/profile_lidar.py).  ``method='sort'`` reformulates the lookup as one
concatenated sort, which maps onto the fast TPU sort primitive: 73 ms for
the same workload (6.7x).  Off-TPU the default binary search stays cheaper
(the CPU test suite uses tiny shapes), so pick per backend.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def searchsorted(a: jnp.ndarray, q: jnp.ndarray,
                 side: str = 'left') -> jnp.ndarray:
    method = 'sort' if jax.default_backend() == 'tpu' else 'scan'
    return jnp.searchsorted(a, q, side=side, method=method)


def lookup_rows(keys: jnp.ndarray, queries: jnp.ndarray,
                sentinel: int) -> jnp.ndarray:
    """Row index of each query in sorted UNIQUE ``keys``; miss -> sentinel.

    Contract for padded key arrays: ``keys`` may end in DUPLICATED sentinel
    padding values (the sparse-voxel buffers do).  A query equal to that
    padding value resolves to one of the padded rows — correctness then
    requires the caller's feature rows at padded slots to be exactly zero
    (true for ops.voxelize / ops.sparse_conv outputs, which mask invalid
    rows to 0).  A caller with non-zero padding rows must pre-filter such
    queries or it gets silent corruption.

    Equivalent to ``where(keys[searchsorted(keys, q)] == q, pos, sentinel)``
    but via ONE merge sort instead of jnp's method='sort' (two argsorts +
    two scatters) plus a validation gather:

      sort (value, id) with keys tagged id=-1 and queries id=0..m-1; keys
      are unique and stable sort puts a key before equal-valued queries, so
      at each query slot the running key count - 1 is the row of the
      greatest key <= q, and a forward-fill of key values tells whether it
      equals q.  One small scatter un-permutes the per-slot results.
    """
    n = keys.shape[0]
    m = queries.shape[0]
    vals = jnp.concatenate([keys, queries])
    ids = jnp.concatenate([jnp.full((n,), -1, jnp.int32),
                           jnp.arange(m, dtype=jnp.int32)])
    v_s, id_s = jax.lax.sort((vals, ids), num_keys=1)
    is_key = id_s < 0
    krow = jnp.cumsum(is_key.astype(jnp.int32)) - 1        # last key row
    NEG = jnp.iinfo(vals.dtype).min
    ffill = jax.lax.cummax(jnp.where(is_key, v_s, NEG))    # last key value
    row = jnp.where((ffill == v_s) & (krow >= 0), krow, sentinel)
    out = jnp.zeros((m,), jnp.int32)
    return out.at[jnp.where(is_key, m, id_s)].set(
        row.astype(jnp.int32), mode='drop')


def lookup_rows3(keys: jnp.ndarray, queries: jnp.ndarray,
                 sentinel: int) -> jnp.ndarray:
    """Row indices of (q-1, q, q+1) for every query q, in one merge sort.

    Returns (m, 3) int32 with miss -> sentinel.  Same duplicate-sentinel
    padding contract as lookup_rows, plus: a query EQUAL to the duplicated
    padding value gets don't-care results for all three taps (its q-1 tap
    cannot see a real key even if one exists) — callers must mask such
    queries, as the sparse-conv neighbor builder does.

    The sparse-conv voxel keys are z-fastest lexicographic, so the three
    z-taps of a kernel column are CONSECUTIVE key values — answering all
    three from one merged query cuts the dominant neighbor-build sort
    volume ~3x vs querying every tap.  Mechanics on top of lookup_rows'
    merge: the forward fill gives the last key <= q (row ``krow``); a
    second forward fill over a carried shifted-key array gives
    keys[krow-1]; a backward min-fill gives keys[krow+1].  Those three
    values decide all hits locally:

      q   in keys  <=>  ffill == q                      -> krow
      q-1 in keys  <=>  ffill == q-1 (q itself absent)  -> krow
                     or ffill == q and prevfill == q-1  -> krow - 1
      q+1 in keys  <=>  backfill == q+1                 -> krow + 1
    """
    n = keys.shape[0]
    m = queries.shape[0]
    NEG = jnp.iinfo(keys.dtype).min
    POS = jnp.iinfo(keys.dtype).max
    vals = jnp.concatenate([keys, queries])
    ids = jnp.concatenate([jnp.full((n,), -1, jnp.int32),
                           jnp.arange(m, dtype=jnp.int32)])
    prev_keys = jnp.concatenate([jnp.full((1,), NEG, keys.dtype), keys[:-1]])
    aux = jnp.concatenate([prev_keys, jnp.zeros((m,), keys.dtype)])
    v_s, id_s, a_s = jax.lax.sort((vals, ids, aux), num_keys=1)
    is_key = id_s < 0
    krow = jnp.cumsum(is_key.astype(jnp.int32)) - 1
    ffill = jax.lax.cummax(jnp.where(is_key, v_s, NEG))    # keys[krow]
    pfill = jax.lax.cummax(jnp.where(is_key, a_s, NEG))    # keys[krow-1]
    bfill = jnp.flip(jax.lax.cummin(                       # keys[krow+1]
        jnp.flip(jnp.where(is_key, v_s, POS))))
    hit0 = (ffill == v_s) & (krow >= 0)
    idx0 = jnp.where(hit0, krow, sentinel)
    idx_m1 = jnp.where(
        ffill == v_s - 1, krow,
        jnp.where(hit0 & (pfill == v_s - 1), krow - 1, sentinel))
    idx_p1 = jnp.where(bfill == v_s + 1, krow + 1, sentinel)
    res = jnp.stack([idx_m1, idx0, idx_p1], axis=-1).astype(jnp.int32)
    out = jnp.zeros((m, 3), jnp.int32)
    return out.at[jnp.where(is_key, m, id_s)].set(res, mode='drop')
