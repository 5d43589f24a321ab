"""RayIoU: perfect prediction scores 100; class/depth mismatches penalized."""
import numpy as np

from fusionocc_tpu.config import GridConfig
from fusionocc_tpu.eval.ray_metrics import ray_iou, rays_from_points


def _grid():
    return GridConfig(x=(-8, 8, 0.4), y=(-8, 8, 0.4), z=(-1, 3, 0.4),
                      depth=(1.0, 9.0, 0.5))


def _wall_scene(grid, cls=4, x_wall=4.0):
    gx, gy, gz = grid.grid_size
    occ = np.full((gx, gy, gz), 17, np.uint8)
    xi = int((x_wall - grid.x[0]) / grid.x[2])
    occ[xi, :, :] = cls
    return occ


def test_perfect_prediction():
    grid = _grid()
    gt = _wall_scene(grid)
    dirs = rays_from_points(
        np.array([[6.0, y, 0.5] for y in np.linspace(-6, 6, 64)],
                 np.float32), max_rays=64)
    out = ray_iou(gt, gt, dirs, grid)
    assert out['RayIoU'] == 100.0, out


def test_wrong_class_scores_zero():
    grid = _grid()
    gt = _wall_scene(grid, cls=4)
    pred = _wall_scene(grid, cls=9)
    dirs = rays_from_points(
        np.array([[6.0, y, 0.5] for y in np.linspace(-6, 6, 64)],
                 np.float32), max_rays=64)
    out = ray_iou(pred, gt, dirs, grid)
    assert out['RayIoU'] == 0.0, out


def test_depth_threshold_sensitivity():
    grid = _grid()
    gt = _wall_scene(grid, x_wall=4.0)
    pred = _wall_scene(grid, x_wall=5.6)   # 1.6 m depth error
    dirs = rays_from_points(
        np.array([[8.0, y, 0.5] for y in np.linspace(-6, 6, 64)],
                 np.float32), max_rays=64)
    out = ray_iou(pred, gt, dirs, grid)
    # 1.6 m error: fails @1m, passes @2m and @4m
    assert out['RayIoU@1.0'] == 0.0
    assert out['RayIoU@2.0'] > 50.0
    assert out['RayIoU@4.0'] > 50.0


def test_rays_from_points_shape():
    pts = np.random.RandomState(0).randn(100, 5).astype(np.float32) * 10
    d = rays_from_points(pts, max_rays=256)
    assert d.shape == (256, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
