"""voxelize_mean vs a plain numpy unique/mean reference."""
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.ops.voxelize import voxelize_mean


def _numpy_reference(points, pcr_min, voxel_size, shape):
    coord = np.floor((points[:, :3] - pcr_min) / voxel_size).astype(np.int64)
    inside = np.all((coord >= 0) & (coord < np.asarray(shape)), axis=1)
    coord, pts = coord[inside], points[inside]
    key = (coord[:, 0] * shape[1] + coord[:, 1]) * shape[2] + coord[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    sums = np.zeros((len(uniq), points.shape[1]))
    cnts = np.zeros(len(uniq))
    np.add.at(sums, inv, pts)
    np.add.at(cnts, inv, 1)
    return dict(zip(uniq.tolist(), (sums / cnts[:, None]).tolist()))


def test_matches_numpy_unique_mean():
    rng = np.random.RandomState(0)
    shape = (16, 16, 8)
    pcr_min = np.array([-4.0, -4.0, -1.0], np.float32)
    voxel_size = np.array([0.5, 0.5, 0.5], np.float32)
    B, P, cap = 2, 300, 128
    pts = rng.uniform(-5, 5, (B, P, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 4, (B, P))
    valid = rng.rand(B, P) > 0.1

    sp = voxelize_mean(jnp.asarray(pts), jnp.asarray(valid),
                       [-4.0, -4.0, -1.0, 4.0, 4.0, 3.0],
                       voxel_size, shape, cap)

    for b in range(B):
        ref = _numpy_reference(pts[b][valid[b]], pcr_min, voxel_size, shape)
        got_keys = np.asarray(sp.keys[b])[np.asarray(sp.mask[b])]
        got_feats = np.asarray(sp.feats[b])[np.asarray(sp.mask[b])]
        assert sorted(got_keys.tolist()) == sorted(ref.keys())
        # keys sorted ascending
        assert np.all(np.diff(got_keys) > 0)
        for k, f in zip(got_keys.tolist(), got_feats):
            np.testing.assert_allclose(f, ref[k], rtol=1e-5, atol=1e-5)


def test_overflow_drops_extra_voxels():
    # more unique voxels than capacity: must keep exactly `cap` and stay valid
    shape = (32, 32, 4)
    P = 200
    xs = np.linspace(-3.9, 3.9, P)
    pts = np.stack([xs, xs, np.zeros(P), np.ones(P), np.ones(P)],
                   axis=1).astype(np.float32)[None]
    valid = np.ones((1, P), bool)
    cap = 16
    sp = voxelize_mean(jnp.asarray(pts), jnp.asarray(valid),
                       [-4.0, -4.0, -1.0, 4.0, 4.0, 1.0],
                       [0.25, 0.25, 0.5], shape, cap)
    assert int(np.sum(np.asarray(sp.mask))) == cap
    got_keys = np.asarray(sp.keys[0])[:cap]
    assert np.all(np.diff(got_keys) > 0)
