"""Backend-tuned searchsorted: the TPU 'sort' method must agree with the
default binary search (ops/search.py picks per backend)."""
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.ops.search import searchsorted


def test_sort_method_matches_scan():
    rng = np.random.RandomState(0)
    keys = np.sort(rng.choice(10_000, 512, replace=False)).astype(np.int32)
    queries = rng.randint(-5, 10_005, size=2048).astype(np.int32)
    ref = jnp.searchsorted(jnp.asarray(keys), jnp.asarray(queries))
    alt = jnp.searchsorted(jnp.asarray(keys), jnp.asarray(queries),
                           method='sort')
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(alt))
    # the helper returns one of the two (backend-dependent): same values
    got = searchsorted(jnp.asarray(keys), jnp.asarray(queries))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_duplicates_and_sentinels():
    keys = jnp.asarray(np.array([1, 3, 3, 3, 7, 7, 9], np.int32))
    queries = jnp.asarray(np.array([0, 1, 3, 4, 7, 9, 10], np.int32))
    ref = jnp.searchsorted(keys, queries)
    alt = jnp.searchsorted(keys, queries, method='sort')
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(alt))
