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


def test_lookup_rows_brute_force():
    from fusionocc_tpu.ops.search import lookup_rows
    rng = np.random.RandomState(1)
    uniq = np.sort(rng.choice(5000, 300, replace=False)).astype(np.int32)
    sentinel_key = np.int32(5000)
    keys = np.concatenate([uniq, np.full(56, sentinel_key, np.int32)])
    queries = rng.randint(0, 5000, size=4096).astype(np.int32)
    got = np.asarray(lookup_rows(jnp.asarray(keys), jnp.asarray(queries),
                                 len(keys)))
    lut = {int(k): i for i, k in enumerate(uniq)}
    ref = np.array([lut.get(int(q), len(keys)) for q in queries])
    np.testing.assert_array_equal(got, ref)


def test_lookup_rows3_brute_force():
    """(q-1, q, q+1) from one merge == three independent lookups."""
    from fusionocc_tpu.ops.search import lookup_rows3
    rng = np.random.RandomState(2)
    # dense-ish key set so consecutive runs are common (as voxel z-runs are)
    uniq = np.sort(rng.choice(1200, 500, replace=False)).astype(np.int32)
    sentinel_key = np.int32(1200)
    keys = np.concatenate([uniq, np.full(12, sentinel_key, np.int32)])
    queries = rng.randint(0, 1201, size=4096).astype(np.int32)
    got = np.asarray(lookup_rows3(jnp.asarray(keys), jnp.asarray(queries),
                                  len(keys)))
    lut = {int(k): i for i, k in enumerate(uniq)}
    # queries equal to the duplicated padding value are outside the
    # contract (callers mask them); their three outputs are don't-care
    care = queries != sentinel_key
    for d in (-1, 0, 1):
        ref = np.array([lut.get(int(q) + d, len(keys)) for q in queries])
        realhit = care & (ref < len(uniq))
        np.testing.assert_array_equal(got[realhit, d + 1], ref[realhit])
        assert np.all(got[care & ~(ref < len(uniq)), d + 1] >= len(uniq))


def test_lookup_rows3_edges():
    from fusionocc_tpu.ops.search import lookup_rows3
    keys = jnp.asarray(np.array([2, 3, 7, 9, 10], np.int32))
    queries = jnp.asarray(np.array([0, 1, 2, 3, 4, 8, 9, 10, 11, 12],
                                   np.int32))
    got = np.asarray(lookup_rows3(keys, queries, 99))
    lut = {2: 0, 3: 1, 7: 2, 9: 3, 10: 4}
    for j, q in enumerate([0, 1, 2, 3, 4, 8, 9, 10, 11, 12]):
        for d in (-1, 0, 1):
            assert got[j, d + 1] == lut.get(q + d, 99), (q, d, got[j])
