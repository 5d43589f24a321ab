"""Host data-pipeline tests: aug homography vs PIL, z-buffer, sweep fusion,
range filter, BDA consistency."""
import numpy as np
import pytest

from fusionocc_tpu.data import pipeline as pl


def test_aug_homography_matches_pil_nearest():
    """A bright pixel moved by PIL transforms must land where the homography
    says (nearest resampling, integral scale => exact)."""
    rng = np.random.RandomState(0)
    H, W = 64, 96
    for flip in (False, True):
        for rotate in (0.0, 7.0, -13.0):
            aug = pl.ImageAug(resize=2.0, resize_dims=(W * 2, H * 2),
                              crop=(10, 6, 10 + 120, 6 + 100),
                              flip=flip, rotate=rotate)
            src = np.zeros((H, W), np.uint8)
            py, px = 31, 47
            src[py, px] = 255
            out = np.asarray(pl.transform_image(src, aug, nearest=True))
            pr, pt = pl.aug_homography(aug)
            uvd = np.array([[px, py, 1.0]], np.float32)
            mapped = uvd @ pr.T + pt
            mx, my = mapped[0, 0], mapped[0, 1]
            ys, xs = np.nonzero(out)
            assert len(xs) > 0, 'pixel transformed out of view'
            # centroid of the transformed blob within 2 px of prediction.
            # (The homography follows the reference's formula exactly, which
            # uses u' = W - u for flips — a ~1 px bias vs PIL's W-1-u; the
            # checkpoints were trained with that convention.)
            assert abs(xs.mean() - mx) < 2.0 and abs(ys.mean() - my) < 2.0, (
                flip, rotate, (xs.mean(), ys.mean()), (mx, my))


def test_normalize_swaps_channels():
    img = np.zeros((2, 2, 3), np.float32)
    img[..., 0] = 100.0  # R
    out = pl.normalize_image(img)
    # R value must end up in channel 2 slot normalized by B stats? No:
    # after swap, channel 0 holds B (0.0) normalized with mean 123.675
    np.testing.assert_allclose(out[..., 0], (0 - 123.675) / 58.395, rtol=1e-5)
    np.testing.assert_allclose(out[..., 2], (100 - 103.53) / 57.375,
                               rtol=1e-5)


def test_zbuffer_min_depth_wins():
    pts = np.array([
        [10.2, 5.1, 20.0],
        [9.8, 4.9, 8.0],    # same rounded pixel (10, 5), closer
        [10.0, 5.0, 30.0],  # same pixel, farther
        [3.0, 2.0, 50.0],   # beyond depth range
    ], np.float32)
    out = pl.points_to_depthmap_np(pts, 8, 16, (1.0, 45.0))
    assert out[5, 10] == 8.0
    assert out[2, 3] == 0.0
    assert np.count_nonzero(out) == 1


def test_fuse_adjacent_sweeps_round_trip():
    rng = np.random.RandomState(0)
    # previous frame displaced 2 m in x in global frame
    l2e = np.eye(4); l2e[:3, 3] = [0.5, 0, 1.8]
    e2g_curr = np.eye(4); e2g_curr[:3, 3] = [100.0, 50.0, 0]
    e2g_prev = np.eye(4); e2g_prev[:3, 3] = [98.0, 50.0, 0]
    prev_pts = np.concatenate(
        [rng.randn(50, 3), np.ones((50, 1)),
         np.full((50, 1), 20.0)], axis=1).astype(np.float32)
    curr_pts = np.zeros((1, 5), np.float32)
    curr_pts[0, 4] = 20.0
    fused = pl.fuse_adjacent_sweeps(curr_pts, l2e, e2g_curr,
                                    [(prev_pts, l2e, e2g_prev)], rng,
                                    subsample=False)
    assert fused.shape == (51, 5)
    # a prev point at prev-lidar origin maps to current-lidar coords of the
    # prev lidar's global position: offset -2 in x
    origin = np.zeros((1, 5), np.float32)
    origin[0, 4] = 20.0
    fused2 = pl.fuse_adjacent_sweeps(curr_pts, l2e, e2g_curr,
                                     [(origin, l2e, e2g_prev)], rng,
                                     subsample=False)
    np.testing.assert_allclose(fused2[1, :3], [-2.0, 0.0, 0.0], atol=1e-6)


def test_subsample_keeps_high_ring():
    rng = np.random.RandomState(0)
    pts = np.zeros((1000, 5), np.float32)
    pts[:500, 4] = 20.0   # ring > 16: always kept
    pts[500:, 4] = 5.0    # kept w.p. 0.2
    l2e = np.eye(4); e2g = np.eye(4)
    fused = pl.fuse_adjacent_sweeps(pts, l2e, e2g, [], rng, subsample=True)
    rings = fused[:, 4]
    assert np.sum(rings == 20.0) == 500
    frac_low = np.sum(rings == 5.0) / 500
    assert 0.1 < frac_low < 0.35


def test_range_filter_eps_shrink():
    pcr = [-40, -40, -1, 40, 40, 5.4]
    pts = np.array([[40.0, 0, 0, 0, 0],       # on boundary -> dropped (eps)
                    [39.99, 0, 0, 0, 0],
                    [-40.0, 0, 0, 0, 0],
                    [0, 0, 5.39, 0, 0]], np.float32)
    out = pl.filter_points_range(pts, pcr)
    assert len(out) == 2


def test_bda_flip_consistency():
    """Flipping points with the bda matrix must equal flipping the voxel
    grid: a point at +x maps to the mirrored voxel."""
    from fusionocc_tpu.geometry import bda_matrix
    bda = bda_matrix(0.0, 1.0, True, False)
    pt = np.array([[10.0, 3.0, 1.0]])
    flipped = pt @ bda.T
    np.testing.assert_allclose(flipped, [[-10.0, 3.0, 1.0]], atol=1e-6)
    vs = np.arange(8 * 6 * 2).reshape(8, 6, 2)
    fvs, _ = pl.apply_bda_to_voxels(vs, [vs > 0], True, False)
    np.testing.assert_array_equal(fvs, vs[::-1])


def test_pad_points_shapes():
    pts = np.random.randn(10, 5).astype(np.float32)
    out, mask = pl.pad_points(pts, 16)
    assert out.shape == (16, 5) and mask.sum() == 10
    out2, mask2 = pl.pad_points(pts, 4)
    assert out2.shape == (4, 5) and mask2.all()


def test_pad_points_overflow_subsamples_uniformly():
    """Overflow must be subsampled across the whole cloud, not
    tail-truncated (points arrive ordered by sweep, so truncation would
    drop whole late sweeps)."""
    import numpy as np
    from fusionocc_tpu.data import pipeline as pl
    pts = np.arange(1000, dtype=np.float32).reshape(-1, 1).repeat(5, axis=1)
    out, mask = pl.pad_points(pts, 256)                      # deterministic
    assert mask.all()
    # every-k-th subsample spans the full index range
    assert out[0, 0] == 0 and out[-1, 0] == 999
    assert np.all(np.diff(out[:, 0]) > 0)
    rng = np.random.RandomState(0)
    out_r, mask_r = pl.pad_points(pts, 256, rng=rng)         # train
    assert mask_r.all()
    # random subsample also spans the cloud (p(fail) astronomically small)
    assert out_r[:, 0].max() > 900 and out_r[:, 0].min() < 100
    assert np.all(np.diff(out_r[:, 0]) > 0)                  # sorted, unique
    # underflow unchanged: zero-pad + prefix mask
    out_u, mask_u = pl.pad_points(pts[:10], 16)
    assert mask_u.sum() == 10 and not mask_u[10:].any()
    assert np.all(out_u[10:] == 0)
