"""Sparse conv vs dense lax.conv on the densified grid.

Submanifold: dense conv output restricted to active input sites must match.
Strided: dense strided conv at derived active output sites must match, and the
derived active set must equal spconv's receptive-field rule.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.ops.sparse_conv import (build_strided_index,
                                           build_subm_index,
                                           out_shape_strided,
                                           sparse_conv_apply,
                                           sparse_conv_apply_block,
                                           sparse_to_dense)
from fusionocc_tpu.ops.voxelize import SparseVoxels, coords_to_key


def _random_sparse(rng, B, V, shape, cin, density_pts=60):
    feats = np.zeros((B, V, cin), np.float32)
    coords = np.zeros((B, V, 3), np.int32)
    keys = np.full((B, V), shape[0] * shape[1] * shape[2], np.int32)
    mask = np.zeros((B, V), bool)
    for b in range(B):
        pts = rng.randint(0, shape, size=(density_pts, 3))
        key = (pts[:, 0] * shape[1] + pts[:, 1]) * shape[2] + pts[:, 2]
        uniq, first = np.unique(key, return_index=True)
        n = min(len(uniq), V)
        keys[b, :n] = uniq[:n]
        coords[b, :n] = pts[first][:n]
        # re-derive coords from sorted keys to keep coords/keys aligned
        x = uniq[:n] // (shape[1] * shape[2])
        rem = uniq[:n] - x * shape[1] * shape[2]
        coords[b, :n] = np.stack([x, rem // shape[2], rem % shape[2]], -1)
        mask[b, :n] = True
        feats[b, :n] = rng.randn(n, cin)
    return SparseVoxels(jnp.asarray(feats), jnp.asarray(coords),
                        jnp.asarray(keys), jnp.asarray(mask))


def _dense_conv3d(dense, weight, stride):
    # dense: (B, X, Y, Z, C) -> NCDHW conv, kernel (27, Cin, Cout) row-major
    x = jnp.transpose(dense, (0, 4, 1, 2, 3))
    w = weight.reshape(3, 3, 3, weight.shape[1], weight.shape[2])
    w = jnp.transpose(w, (4, 3, 0, 1, 2))  # (Cout, Cin, kx, ky, kz)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3, padding=((1, 1),) * 3,
        dimension_numbers=('NCDHW', 'OIDHW', 'NCDHW'))
    return jnp.transpose(out, (0, 2, 3, 4, 1))


def test_subm_conv_matches_dense():
    rng = np.random.RandomState(0)
    shape, B, V, cin, cout = (10, 9, 6), 2, 64, 4, 5
    sp = _random_sparse(rng, B, V, shape, cin)
    weight = jnp.asarray(rng.randn(27, cin, cout), jnp.float32) * 0.1
    bias = jnp.asarray(rng.randn(cout), jnp.float32)

    nbr = build_subm_index(sp, shape)
    out = sparse_conv_apply(sp.feats, sp.mask, nbr, weight, bias)

    dense = sparse_to_dense(sp.feats, sp.keys, sp.mask, shape)
    ref = _dense_conv3d(dense, weight, 1) + bias
    got_dense = sparse_to_dense(out, sp.keys, sp.mask, shape)
    active = np.asarray(
        sparse_to_dense(jnp.ones_like(sp.feats[..., :1]), sp.keys, sp.mask,
                        shape))[..., 0] > 0
    np.testing.assert_allclose(np.asarray(got_dense)[active],
                               np.asarray(ref)[active],
                               rtol=1e-4, atol=1e-4)


def test_block_gather_apply_matches_row_gather():
    """sparse_conv_apply_block is a drop-in for sparse_conv_apply on both
    the subm and the strided neighbor maps (z-run contiguity argument)."""
    rng = np.random.RandomState(7)
    shape, B, V, cin, cout = (10, 9, 6), 2, 64, 4, 5
    sp = _random_sparse(rng, B, V, shape, cin, density_pts=90)
    weight = jnp.asarray(rng.randn(27, cin, cout), jnp.float32) * 0.1
    bias = jnp.asarray(rng.randn(cout), jnp.float32)

    nbr = build_subm_index(sp, shape)
    ref = sparse_conv_apply(sp.feats, sp.mask, nbr, weight, bias)
    got = sparse_conv_apply_block(sp.feats, sp.mask, nbr, weight, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    (oc, okeys, om, snbr), shape_out = build_strided_index(sp, shape, 192)
    ref = sparse_conv_apply(sp.feats, om, snbr, weight)
    got = sparse_conv_apply_block(sp.feats, om, snbr, weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_strided_conv_matches_dense():
    rng = np.random.RandomState(1)
    shape, B, V, cin, cout = (12, 10, 8), 2, 64, 3, 4
    sp = _random_sparse(rng, B, V, shape, cin)
    weight = jnp.asarray(rng.randn(27, cin, cout), jnp.float32) * 0.1

    (oc, okeys, om, nbr), shape_out = build_strided_index(sp, shape, 128)
    out = sparse_conv_apply(sp.feats, om, nbr, weight)

    assert shape_out == out_shape_strided(shape)
    dense = sparse_to_dense(sp.feats, sp.keys, sp.mask, shape)
    ref = _dense_conv3d(dense, weight, 2)

    # active-output rule: any output whose 3^3 stride-2 receptive field
    # covers an active input voxel
    active_in = np.asarray(sp.mask)
    coords_in = np.asarray(sp.coords)
    expect_active = [set() for _ in range(B)]
    for b in range(B):
        for vtx in coords_in[b][active_in[b]]:
            for dx in range(3):
                for dy in range(3):
                    for dz in range(3):
                        o = (vtx + 1 - np.array([dx, dy, dz]))
                        if np.all(o % 2 == 0):
                            o = o // 2
                            if np.all(o >= 0) and np.all(o < shape_out):
                                expect_active[b].add(tuple(o))
    for b in range(B):
        got = set(map(tuple, np.asarray(oc[b])[np.asarray(om[b])].tolist()))
        assert got == expect_active[b]

    got_dense = np.asarray(sparse_to_dense(out, okeys, om, shape_out))
    ref = np.asarray(ref)
    for b in range(B):
        for o in expect_active[b]:
            np.testing.assert_allclose(got_dense[b][o], ref[b][o],
                                       rtol=1e-4, atol=1e-4)


def test_table_indices_match_merge():
    """stage_indices_table (dense row-id table, sort-free) must produce the
    same subm neighbor map, derived strided output set, and strided neighbor
    map as the merge-based builds."""
    rng = np.random.RandomState(3)
    shape, B, V = (12, 10, 8), 2, 96
    sp = _random_sparse(rng, B, V, shape, 3, density_pts=120)

    from fusionocc_tpu.ops.sparse_conv import stage_indices_table

    nbr_ref = build_subm_index(sp, shape)
    (ref_oc, ref_ok, ref_om, ref_snbr), shape_out = build_strided_index(
        sp, shape, 160)

    nbr_tab, ((oc, okeys, om, snbr), shape_out2) = stage_indices_table(
        sp, shape, 160)
    assert shape_out2 == shape_out
    np.testing.assert_array_equal(np.asarray(nbr_tab), np.asarray(nbr_ref))
    np.testing.assert_array_equal(np.asarray(om), np.asarray(ref_om))
    np.testing.assert_array_equal(np.asarray(okeys), np.asarray(ref_ok))
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(ref_oc))
    np.testing.assert_array_equal(np.asarray(snbr), np.asarray(ref_snbr))

    # no-downsample flavor (final stage)
    nbr_tab2, none = stage_indices_table(sp, shape, None)
    assert none is None
    np.testing.assert_array_equal(np.asarray(nbr_tab2), np.asarray(nbr_ref))


def test_table_indices_lax_map_path():
    """Large-grid branch (per-sample lax.map) matches vmap semantics."""
    from fusionocc_tpu.ops import sparse_conv as sc_mod
    rng = np.random.RandomState(5)
    shape, B, V = (9, 7, 6), 2, 64
    sp = _random_sparse(rng, B, V, shape, 3, density_pts=80)
    nbr_ref = build_subm_index(sp, shape)
    orig = sc_mod._TABLE_VMAP_CELLS
    try:
        sc_mod._TABLE_VMAP_CELLS = 1   # force the lax.map branch
        nbr_tab, ((oc, okeys, om, snbr), _) = sc_mod.stage_indices_table(
            sp, shape, 128)
    finally:
        sc_mod._TABLE_VMAP_CELLS = orig
    np.testing.assert_array_equal(np.asarray(nbr_tab), np.asarray(nbr_ref))
    (ref_oc, ref_ok, ref_om, ref_snbr), _ = build_strided_index(
        sp, shape, 128)
    np.testing.assert_array_equal(np.asarray(om), np.asarray(ref_om))
    np.testing.assert_array_equal(np.asarray(snbr), np.asarray(ref_snbr))


def test_tap_chunked_apply_matches_oneshot():
    """tap_chunk=1/3/9 (scanned bounded-temp groups) == one-shot GEMM."""
    from fusionocc_tpu.ops.sparse_conv import sparse_conv_apply
    rng = np.random.RandomState(11)
    shape, B, V, cin, cout = (6, 5, 8), 2, 48, 4, 5
    sp = _random_sparse(rng, B, V, shape, cin)
    nbr = build_subm_index(sp, shape)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32))
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    ref = np.asarray(sparse_conv_apply(sp.feats, sp.mask, nbr, w, bias))
    for tc in (1, 3, 9, 27):
        got = np.asarray(sparse_conv_apply(sp.feats, sp.mask, nbr, w, bias,
                                           tap_chunk=tc))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
