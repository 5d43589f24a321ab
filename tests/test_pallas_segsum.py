"""Pallas chunked-cumsum segmented sum vs the XLA reference (interpret mode
on CPU exercises the same kernel code path)."""
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.ops.bev_pool import _sorted_segment_sum
from fusionocc_tpu.ops.pallas.segsum import BLK, boundary_segment_sum


def test_matches_xla_reference():
    rng = np.random.RandomState(0)
    P, C, V = 2 * BLK, 8, 500
    d = jnp.asarray(rng.rand(P).astype(np.float32))
    f = jnp.asarray(rng.randn(P, C).astype(np.float32))
    seg = np.sort(rng.randint(0, V + 1, P)).astype(np.int32)
    seg[seg == V] = V  # some sentinel entries
    seg = jnp.asarray(seg)
    got = boundary_segment_sum(d, f, seg, V)
    ref = _sorted_segment_sum(d[:, None] * f, seg, V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_empty_and_full_segments():
    P, C, V = BLK, 4, 8
    d = jnp.ones((P,), jnp.float32)
    f = jnp.ones((P, C), jnp.float32)
    # everything in segment 3
    seg = jnp.full((P,), 3, jnp.int32)
    out = np.asarray(boundary_segment_sum(d, f, seg, V))
    assert out[3, 0] == P
    assert out.sum() == P * C
