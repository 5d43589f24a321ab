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


def _dvr_reference_one(occ, origin_vox, dir_unit_vox, sizes, free_class=17):
    """Sequential transcription of the official DVR traversal semantics
    (stcocc/libs/dvr/dvr.cu:70-308) in float64: returns (label, exit-dist in
    voxel-parameter units) for one ray.  Used only as the golden reference."""
    vx, vy, vz = (int(np.floor(c)) for c in origin_vox)
    dx, dy, dz = dir_unit_vox
    step = [1 if d >= 0 else -1 for d in (dx, dy, dz)]
    tmax, tdelta = [], []
    for a, d in enumerate((dx, dy, dz)):
        if d != 0:
            b = [vx, vy, vz][a] + (0 if step[a] < 0 else 1)
            tmax.append((b - origin_vox[a]) / d)
            tdelta.append(step[a] / d)
        else:
            tmax.append(np.inf)
            tdelta.append(np.inf)
    path, dists = [], []
    was_inside = False
    for _ in range(10000):
        inside = (0 <= vx < sizes[0] and 0 <= vy < sizes[1]
                  and 0 <= vz < sizes[2])
        if inside:
            was_inside = True
            path.append((vx, vy, vz))
        elif was_inside:
            break
        if tmax[0] < tmax[1]:
            if tmax[0] < tmax[2]:
                _d = tmax[0]; vx += step[0]; tmax[0] += tdelta[0]
            else:
                _d = tmax[2]; vz += step[2]; tmax[2] += tdelta[2]
        else:
            if tmax[1] < tmax[2]:
                _d = tmax[1]; vy += step[1]; tmax[1] += tdelta[1]
            else:
                _d = tmax[2]; vz += step[2]; tmax[2] += tdelta[2]
        if inside:
            dists.append(_d)
    if not path:
        return free_class, 0.0
    # first occupied voxel on the path wins; else last traversed voxel
    for (x, y, z), d in zip(path, dists):
        if occ[x, y, z] != free_class:
            return int(occ[x, y, z]), float(d)
    x, y, z = path[-1]
    return int(occ[x, y, z]), float(dists[-1])


def test_render_rays_matches_official_traversal():
    """Vectorized exact traversal == the official sequential DDA, per ray:
    bit-equal labels and exit distances to 1e-9, on a random grid with the
    official lidar-fan directions (subsampled)."""
    from fusionocc_tpu.eval.ray_metrics import (LIDAR_ORIGIN,
                                                generate_lidar_rays,
                                                render_rays)
    grid = _grid()
    gx, gy, gz = grid.grid_size
    rng = np.random.RandomState(7)
    occ = np.full((gx, gy, gz), 17, np.uint8)
    # ~2% random occupied voxels of random classes
    m = rng.rand(gx, gy, gz) < 0.02
    occ[m] = rng.randint(0, 17, m.sum())

    dirs = generate_lidar_rays()[::37]          # 172 rays over all rings
    labels, dists, entered = render_rays(occ, LIDAR_ORIGIN, dirs, grid)

    lower = np.asarray(grid.lower_bound)
    interval = np.asarray(grid.interval)
    o_vox = (np.asarray(LIDAR_ORIGIN) - lower) / interval
    for r in range(len(dirs)):
        d_vox = dirs[r] / interval              # t parameter stays metres
        lab, dist = _dvr_reference_one(occ, o_vox, d_vox,
                                       (gx, gy, gz))
        assert entered[r]
        assert labels[r] == lab, (r, labels[r], lab)
        # closed-form crossing distances vs the DDA's accumulated tmax
        # differ only by float64 accumulation noise
        np.testing.assert_allclose(dists[r], dist, rtol=0, atol=1e-6)


def test_render_rays_exterior_origin():
    """An origin far outside the grid must still traverse the chord: the
    slab-test origin advance keeps the K-crossing enumeration on the grid
    (a 300-voxel approach used to exhaust it and render never-entered)."""
    from fusionocc_tpu.eval.ray_metrics import render_rays
    grid = _grid()
    gt = _wall_scene(grid, cls=4, x_wall=4.0)

    origin = np.array([-128.0, 0.2, 0.5])       # 300 voxels outside on -x
    dirs = np.array([[1.0, 0.0, 0.0],           # through the wall
                     [-1.0, 0.0, 0.0],          # away from the grid
                     [0.0, 1.0, 0.0]], np.float64)  # parallel miss
    labels, dists, entered = render_rays(gt, origin, dirs, grid)
    assert entered[0] and labels[0] == 4
    # wall front face at x=4.0, origin at x=-128 -> 132 m
    np.testing.assert_allclose(dists[0], 132.0 + grid.x[2], atol=1e-6)
    assert not entered[1] and labels[1] == 17
    assert not entered[2] and labels[2] == 17

    # interior origin: unchanged semantics (dist from the caller's origin)
    o_in = np.array([0.0, 0.2, 0.5])
    l2, d2, e2 = render_rays(gt, o_in, dirs[:1], grid)
    assert e2[0] and l2[0] == 4
    np.testing.assert_allclose(d2[0], 4.0 + grid.x[2], atol=1e-6)


def test_rayiou_metric_accumulates_like_calc_metrics():
    """RayIoUMetric over two samples == the official calc_metrics run on the
    concatenated per-ray (label, dist) lists (ray_metrics_occ3d.py:187-235)."""
    from fusionocc_tpu.eval.ray_metrics import (RayIoUMetric, render_rays,
                                                LIDAR_ORIGIN)
    grid = _grid()
    gx, gy, gz = grid.grid_size
    rng = np.random.RandomState(3)
    dirs = rays_from_points(rng.randn(500, 3).astype(np.float32),
                            max_rays=256)
    metric = RayIoUMetric(grid)
    all_lp, all_dp, all_lg, all_dg = [], [], [], []
    for s in range(2):
        gt = np.full((gx, gy, gz), 17, np.uint8)
        pred = np.full((gx, gy, gz), 17, np.uint8)
        mg = rng.rand(gx, gy, gz) < 0.03
        mp = rng.rand(gx, gy, gz) < 0.03
        gt[mg] = rng.randint(0, 17, mg.sum())
        pred[mp] = rng.randint(0, 17, mp.sum())
        metric.update(pred, gt, dirs)
        lp, dp, _ = render_rays(pred, LIDAR_ORIGIN, dirs, grid)
        lg, dg, _ = render_rays(gt, LIDAR_ORIGIN, dirs, grid)
        all_lp.append(lp); all_dp.append(dp)
        all_lg.append(lg); all_dg.append(dg)

    # official calc_metrics accumulation, transcribed
    C = 18
    gt_cnt = np.zeros(C); pred_cnt = np.zeros(C)
    tp_cnt = np.zeros((3, C))
    for lp, dp, lg, dg in zip(all_lp, all_dp, all_lg, all_dg):
        for j, thr in enumerate((1, 2, 4)):
            tp_mask = np.abs(dp - dg) < thr
            for c in range(C):
                if j == 0:
                    gt_cnt[c] += (lg == c).sum()
                    pred_cnt[c] += (lp == c).sum()
                tp_cnt[j, c] += ((lg == c) & (lp == c) & tp_mask).sum()
    np.testing.assert_array_equal(metric.gt_cnt, gt_cnt)
    np.testing.assert_array_equal(metric.pred_cnt, pred_cnt)
    np.testing.assert_array_equal(metric.tp_cnt, tp_cnt)
    out = metric.compute()
    with np.errstate(divide='ignore', invalid='ignore'):
        ref = np.mean([np.nanmean((tp_cnt[j][:17]
                                   / (gt_cnt[:17] + pred_cnt[:17]
                                      - tp_cnt[j][:17])))
                       for j in range(3)])
    assert abs(out['RayIoU'] - round(float(ref) * 100, 2)) < 1e-9
