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


def test_exact_tp_fp_fn_counts():
    """Hand-constructed scene with known per-ray hits: IoU values must equal
    the official formula tp/(gt+pred-tp) exactly
    (ray_metrics_occ3d.py:187-235)."""
    grid = _grid()
    gx, gy, gz = grid.grid_size
    gt = np.full((gx, gy, gz), 17, np.uint8)
    pred = np.full((gx, gy, gz), 17, np.uint8)
    xi = int((4.0 - grid.x[0]) / grid.x[2])
    gt[xi, :, :] = 4                      # one wall, class 4 everywhere
    zi_split = int((0.5 - grid.z[0]) / grid.z[2])
    pred[xi, :, :zi_split] = 4            # lower half correct ...
    pred[xi, :, zi_split:] = 9            # ... upper half wrong class

    # 8 rays along +x: 4 hit below z=0.5, 4 above (z offsets small enough to
    # stay within one x-voxel of depth 4.0..4.4)
    zs = np.array([-0.9, -0.6, -0.3, 0.0, 0.9, 1.2, 1.5, 1.8], np.float32)
    dirs = np.stack([np.ones(8), np.zeros(8), zs / 4.0], 1).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    out = ray_iou(pred, gt, dirs, grid, origin=(0.0, 0.0, 0.0))
    # class 4: tp=4, gt=8, pred=4 -> 4/(8+4-4) = 0.5
    # class 9: tp=0, gt=0, pred=4 -> 0
    # all other classes absent (nan) -> miou = (0.5 + 0)/2 = 0.25
    for thr in (1.0, 2.0, 4.0):
        assert out[f'RayIoU@{thr}'] == 25.0, out
    assert out['RayIoU'] == 25.0


def test_exact_depth_threshold_boundary():
    """Depth L1 error straddling the 1 m threshold flips TP -> FP+FN at
    exactly |dp-dg| < thr (strict, like the official tp_dist_mask)."""
    grid = _grid()

    def wall(x):
        g = np.full(grid.grid_size, 17, np.uint8)
        g[round((x - grid.x[0]) / grid.x[2]), :, :] = 4
        return g

    dirs = np.array([[1.0, 0.0, 0.0]], np.float32)
    # step 0.2: hit depths quantize to 4.1 / 4.9 / 5.3
    out = ray_iou(wall(4.8), wall(4.0), dirs, grid)
    assert out['RayIoU@1.0'] == 100.0    # |4.9-4.1| = 0.8 < 1
    out = ray_iou(wall(5.2), wall(4.0), dirs, grid)
    assert out['RayIoU@1.0'] == 0.0      # |5.3-4.1| = 1.2 >= 1
    assert out['RayIoU@2.0'] == 100.0
    assert out['RayIoU@4.0'] == 100.0


def test_official_lidar_ray_fan():
    """generate_lidar_rays reproduces the official fan: 1 deg azimuth sweep
    per pitch ring, unit norm, pitch range ending above +0.21 rad."""
    from fusionocc_tpu.eval.ray_metrics import generate_lidar_rays
    rays = generate_lidar_rays()
    assert rays.shape[1] == 3 and rays.shape[0] % 360 == 0
    np.testing.assert_allclose(np.linalg.norm(rays, axis=1), 1.0, atol=1e-5)
    pitch = np.arcsin(rays[:, 2]).reshape(-1, 360)
    # each ring has constant pitch; rings ascend from steep-down to >=0.21
    assert np.allclose(pitch, pitch[:, :1], atol=1e-6)
    assert pitch[0, 0] < -0.7 and pitch[-1, 0] >= 0.21
    # first ring: pi/2 - atan(1)
    assert abs(pitch[0, 0] + (np.pi / 2 - np.arctan(1.0))) < 1e-6
