"""Native C++ pointops vs numpy reference implementations."""
import numpy as np
import pytest

from fusionocc_tpu import native
from fusionocc_tpu.data import pipeline as pl


@pytest.fixture(scope='module')
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip('g++ unavailable')
    return lib


def test_zbuffer_matches_numpy(lib):
    rng = np.random.RandomState(0)
    uvd = np.stack([rng.uniform(-5, 40, 5000), rng.uniform(-5, 25, 5000),
                    rng.uniform(0.5, 50, 5000)], axis=1).astype(np.float32)
    ref = pl.points_to_depthmap_np(uvd, 20, 36, (1.0, 45.0))
    got = native.zbuffer_depth(uvd, 20, 36, (1.0, 45.0))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_transform_points_matches(lib):
    rng = np.random.RandomState(1)
    pts = rng.randn(1000, 5).astype(np.float32)
    T = np.eye(4)
    T[:3, :3] = pl.np.linalg.qr(rng.randn(3, 3))[0]
    T[:3, 3] = rng.randn(3) * 10
    got = native.transform_points(pts, T)
    ref = pts.copy()
    ref[:, :3] = (pts[:, :3].astype(np.float64) @ T[:3, :3].T
                  + T[:3, 3]).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(got[:, 3:], pts[:, 3:])


def test_range_filter_matches(lib):
    rng = np.random.RandomState(2)
    pts = rng.uniform(-50, 50, (2000, 5)).astype(np.float32)
    pcr = [-40, -40, -1, 40, 40, 5.4]
    got = native.range_filter_mask(pts, pcr)
    ref_pts = pl.filter_points_range(pts, pcr)
    assert got.sum() == len(ref_pts)
    np.testing.assert_allclose(pts[got], ref_pts)


def test_project_points_matches(lib):
    rng = np.random.RandomState(3)
    pts = rng.uniform(-30, 30, (3000, 5)).astype(np.float32)
    l2c = np.eye(4)
    l2c[:3, 3] = [0.1, -0.2, 0.5]
    intr = np.array([[600.0, 0, 700], [0, 600.0, 400], [0, 0, 1]])
    cam2img = intr @ l2c[:3, :4]
    full = np.eye(4); full[:3, :4] = cam2img
    pr = np.diag([0.44, 0.44, 1.0]).astype(np.float32)
    pt = np.array([-10.0, -50.0, 0.0], np.float32)
    got = native.project_points(pts, full.astype(np.float32), pr, pt)
    ref = pl.project_points_to_cam(pts, l2c.astype(np.float32),
                                   intr.astype(np.float32), pr, pt)
    front = (pts[:, :3] @ full[2, :3] + full[2, 3]) > 1e-3
    np.testing.assert_allclose(got[front], ref[front], rtol=1e-4, atol=1e-3)
