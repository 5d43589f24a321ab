"""Block-sparse tile conv vs dense lax.conv on the densified grid.

Same contract as test_sparse_conv.py: submanifold output restricted to
active sites must match a dense conv; strided output must match a dense
stride-2 conv at exactly the spconv-derived active output set.  Also
round-trips COO <-> tile form and cross-checks the two sparse backends.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.ops import sparse_conv as sc
from fusionocc_tpu.ops import tile_sparse as tsp
from fusionocc_tpu.ops.voxelize import SparseVoxels


def _random_sparse(rng, B, V, shape, cin, density_pts=60):
    feats = np.zeros((B, V, cin), np.float32)
    coords = np.zeros((B, V, 3), np.int32)
    keys = np.full((B, V), shape[0] * shape[1] * shape[2], np.int32)
    mask = np.zeros((B, V), bool)
    for b in range(B):
        pts = rng.randint(0, shape, size=(density_pts, 3))
        key = (pts[:, 0] * shape[1] + pts[:, 1]) * shape[2] + pts[:, 2]
        uniq = np.unique(key)
        n = min(len(uniq), V)
        keys[b, :n] = uniq[:n]
        x = uniq[:n] // (shape[1] * shape[2])
        rem = uniq[:n] - x * shape[1] * shape[2]
        coords[b, :n] = np.stack([x, rem // shape[2], rem % shape[2]], -1)
        mask[b, :n] = True
        feats[b, :n] = rng.randn(n, cin)
    return SparseVoxels(jnp.asarray(feats), jnp.asarray(coords),
                        jnp.asarray(keys), jnp.asarray(mask))


def _dense_conv3d(dense, weight, stride):
    x = jnp.transpose(dense, (0, 4, 1, 2, 3))
    w = weight.reshape(3, 3, 3, weight.shape[1], weight.shape[2])
    w = jnp.transpose(w, (4, 3, 0, 1, 2))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3, padding=((1, 1),) * 3,
        dimension_numbers=('NCDHW', 'OIDHW', 'NCDHW'))
    return jnp.transpose(out, (0, 2, 3, 4, 1))


def _dense_from_tiles(tv, shape):
    return np.asarray(tsp.tiles_to_dense(tv, shape))


def _dense_mask_from_tiles(tv, shape):
    ts = tv.feats.shape[2]
    mfold = tv.mask.astype(jnp.float32).reshape(
        tv.mask.shape[:-1] + (ts, ts, ts))   # z-folded, C=1
    return _dense_from_tiles(tv._replace(feats=mfold), shape)[..., 0] > 0


def test_tiles_roundtrip():
    rng = np.random.RandomState(0)
    shape, B, V, cin = (11, 9, 6), 2, 64, 4
    sp = _random_sparse(rng, B, V, shape, cin)
    tv = tsp.tiles_from_coo(sp.coords, sp.feats, sp.mask, shape, 32, ts=4)
    dense_ref = np.asarray(sc.sparse_to_dense(sp.feats, sp.keys, sp.mask,
                                              shape))
    np.testing.assert_allclose(_dense_from_tiles(tv, shape), dense_ref,
                               rtol=1e-6, atol=1e-6)
    active_ref = np.asarray(sc.sparse_to_dense(
        jnp.ones_like(sp.feats[..., :1]), sp.keys, sp.mask, shape))[..., 0] > 0
    np.testing.assert_array_equal(_dense_mask_from_tiles(tv, shape),
                                  active_ref)


def test_tile_subm_conv_matches_dense():
    rng = np.random.RandomState(1)
    shape, B, V, cin, cout = (10, 9, 6), 2, 64, 4, 5
    sp = _random_sparse(rng, B, V, shape, cin)
    weight = jnp.asarray(rng.randn(27, cin, cout), jnp.float32) * 0.1

    tv = tsp.tiles_from_coo(sp.coords, sp.feats, sp.mask, shape, 32, ts=4)
    nbr = tsp.neighbor_slots(tv, tsp.tile_grid(shape, 4))
    out = tsp.tile_subm_conv(tv.feats, tv.mask, nbr, weight)
    got = _dense_from_tiles(tv._replace(feats=out), shape)

    dense = sc.sparse_to_dense(sp.feats, sp.keys, sp.mask, shape)
    ref = np.asarray(_dense_conv3d(dense, weight, 1))
    active = _dense_mask_from_tiles(tv, shape)
    np.testing.assert_allclose(got[active], ref[active], rtol=1e-4,
                               atol=1e-4)
    # inactive sites must be exactly zero (submanifold contract)
    assert np.all(got[~active] == 0)


def test_tile_strided_conv_matches_dense():
    rng = np.random.RandomState(2)
    for shape in [(12, 10, 8), (11, 9, 6)]:   # even and ragged grids
        B, V, cin, cout = 2, 64, 3, 4
        sp = _random_sparse(rng, B, V, shape, cin)
        weight = jnp.asarray(rng.randn(27, cin, cout), jnp.float32) * 0.1

        tv = tsp.tiles_from_coo(sp.coords, sp.feats, sp.mask, shape, 32,
                                ts=4)
        tv2, shape_out = tsp.tile_strided_conv(tv, shape, 32, weight)
        assert shape_out == sc.out_shape_strided(shape)
        got = _dense_from_tiles(tv2, shape_out)
        got_mask = _dense_mask_from_tiles(tv2, shape_out)

        dense = sc.sparse_to_dense(sp.feats, sp.keys, sp.mask, shape)
        ref = np.asarray(_dense_conv3d(dense, weight, 2))

        # spconv active-output rule
        coords_in = np.asarray(sp.coords)
        active_in = np.asarray(sp.mask)
        expect = np.zeros((B,) + shape_out, bool)
        for b in range(B):
            for vtx in coords_in[b][active_in[b]]:
                for dx in range(3):
                    for dy in range(3):
                        for dz in range(3):
                            o = vtx + 1 - np.array([dx, dy, dz])
                            if np.all(o % 2 == 0):
                                o = o // 2
                                if np.all(o >= 0) and np.all(
                                        o < np.asarray(shape_out)):
                                    expect[b][tuple(o)] = True
        np.testing.assert_array_equal(got_mask, expect)
        np.testing.assert_allclose(got[expect], ref[expect], rtol=1e-4,
                                   atol=1e-4)
        assert np.all(got[~expect] == 0)


def test_tile_conv1x1():
    rng = np.random.RandomState(3)
    shape, B, V, cin, cout = (8, 8, 4), 1, 32, 3, 6
    sp = _random_sparse(rng, B, V, shape, cin)
    w = jnp.asarray(rng.randn(cin, cout), jnp.float32)
    tv = tsp.tiles_from_coo(sp.coords, sp.feats, sp.mask, shape, 16, ts=4)
    out = tsp.tile_conv1x1(tv, w)
    got = _dense_from_tiles(tv._replace(feats=out), shape)
    dense = np.asarray(sc.sparse_to_dense(sp.feats, sp.keys, sp.mask, shape))
    ref = dense @ np.asarray(w)
    active = _dense_mask_from_tiles(tv, shape)
    np.testing.assert_allclose(got[active], ref[active], rtol=1e-5,
                               atol=1e-5)


def test_encoder_backends_equivalent():
    """Full SparseEncoder: COO and tile backends share one param tree and
    must produce the same dense volume (train and eval paths)."""
    import dataclasses
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.models.lidar_encoder import SparseEncoder

    cfg = tiny_model_config()
    rng = np.random.RandomState(5)
    pcr = cfg.grid.point_cloud_range
    P = cfg.lidar.point_capacity
    # clustered points (LiDAR-like): isolated random voxels would dilate
    # ~8x per strided stage and overflow any reasonable capacity
    centers = rng.uniform(-6, 6, (2, 8, 3)).astype(np.float32)
    which = rng.randint(0, 8, (2, P))
    xyz = (centers[np.arange(2)[:, None], which]
           + rng.randn(2, P, 3).astype(np.float32) * 0.4)
    pts = rng.uniform(-1, 1, (2, P, cfg.lidar.in_channels)).astype(np.float32)
    pts[:, :, :3] = np.clip(xyz, [pcr[0], pcr[1], pcr[2]],
                            [pcr[3] - 1e-3, pcr[4] - 1e-3, pcr[5] - 1e-3])
    valid = rng.rand(2, P) > 0.2

    # capacities sized so NO buffer overflows: under overflow the two
    # backends trim different subsets (linear vs tile-major key order),
    # which is an explicitly different contract, not an equivalence bug
    caps = dict(voxel_capacity=(2048, 2048, 1024, 512),
                tile_capacity=(2048, 1024, 512, 256))
    lidar_coo = dataclasses.replace(cfg.lidar, backend='coo', **caps)
    lidar_tile = dataclasses.replace(cfg.lidar, backend='tile', tile_size=4,
                                     **caps)
    enc_coo = SparseEncoder(lidar_coo, cfg.grid)
    enc_tile = SparseEncoder(lidar_tile, cfg.grid)

    variables = jax.jit(enc_coo.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(valid))
    # identical parameter trees (backend-interchangeable checkpoints)
    vt = jax.jit(enc_tile.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(valid))
    assert (jax.tree.structure(variables['params'])
            == jax.tree.structure(vt['params']))

    # jit both paths: eager op-by-op accumulation drifts ~100x more than
    # the fused compiled programs (and jit is the only path used for real)
    out_c = jax.jit(enc_coo.apply)(variables, jnp.asarray(pts),
                                   jnp.asarray(valid))
    out_t = jax.jit(enc_tile.apply)(variables, jnp.asarray(pts),
                                    jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_c),
                               rtol=2e-4, atol=2e-4)

    # train-mode BN statistics must match too
    oc, mc = jax.jit(
        lambda v, p, m: enc_coo.apply(v, p, m, train=True,
                                      mutable=['batch_stats'])
    )(variables, jnp.asarray(pts), jnp.asarray(valid))
    ot, mt = jax.jit(
        lambda v, p, m: enc_tile.apply(v, p, m, train=True,
                                       mutable=['batch_stats'])
    )(variables, jnp.asarray(pts), jnp.asarray(valid))
    # train-mode normalizes by data-dependent batch stats, amplifying the
    # per-layer conv-order drift (~1e-6) through 11 layers; observed max
    # ~5e-4 abs / 1% rel on a handful of cells
    np.testing.assert_allclose(np.asarray(ot), np.asarray(oc),
                               rtol=2e-2, atol=1e-3)
    for a, b in zip(jax.tree.leaves(mc), jax.tree.leaves(mt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_voxelize_tile_major_matches_linear():
    from fusionocc_tpu.ops.voxelize import voxelize_mean
    rng = np.random.RandomState(4)
    pts = rng.uniform(-4, 4, (2, 256, 5)).astype(np.float32)
    valid = rng.rand(2, 256) > 0.1
    shape, pcr, vs = (16, 16, 8), (-4, -4, -2, 4, 4, 2), (0.5, 0.5, 0.5)
    # capacity must hold ALL voxels: under overflow the two key orderings
    # would trim different subsets
    a = voxelize_mean(jnp.asarray(pts), jnp.asarray(valid), pcr, vs, shape,
                      256)
    b = voxelize_mean(jnp.asarray(pts), jnp.asarray(valid), pcr, vs, shape,
                      256, tile_size=4)
    da = np.asarray(sc.sparse_to_dense(a.feats, a.keys, a.mask, shape))
    tvb = tsp.tiles_from_sorted(b.feats, b.keys, b.mask, shape, 128, 4)
    db = _dense_from_tiles(tvb, shape)
    # cumsum-mean in different sort orders rounds differently: tolerance
    np.testing.assert_allclose(da, db, rtol=1e-4, atol=1e-5)
