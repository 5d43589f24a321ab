"""mIoU metric vs a numpy bincount reference (reference semantics:
occ_metrics.py:70-153 — masked confusion matrix, free class excluded)."""
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.eval.metrics import (OccupancyMetric, confusion_matrix,
                                        miou_from_hist)


def _np_hist(pred, gt, mask, n):
    pred = np.clip(pred[mask], 0, n - 1)
    gt = gt[mask]
    k = (gt >= 0) & (gt < n)
    return np.bincount(n * gt[k] + pred[k], minlength=n * n).reshape(n, n)


def test_confusion_matrix_matches_numpy():
    rng = np.random.RandomState(0)
    n = 18
    pred = rng.randint(0, n, (2, 10, 10, 4))
    gt = rng.randint(0, n, (2, 10, 10, 4))
    mask = rng.rand(2, 10, 10, 4) > 0.4
    got = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt),
                                      jnp.asarray(mask), n))
    ref = _np_hist(pred, gt, mask, n)
    np.testing.assert_array_equal(got, ref)


def test_miou_excludes_free_class():
    n = 18
    hist = np.zeros((n, n))
    # classes 0..16: perfect -> IoU 1; class 17 wrong -> would drag mean down
    for i in range(17):
        hist[i, i] = 10
    hist[17, 0] = 10  # free misclassified
    out = miou_from_hist(hist)
    # class 0 IoU polluted by free->0 predictions: 10/(10+10)=0.5
    assert out['IoU_others'] == 50.0
    expected = np.mean([0.5] + [1.0] * 16) * 100
    assert abs(out['mIoU'] - round(expected, 2)) < 0.01


def test_streaming_evaluator():
    rng = np.random.RandomState(1)
    n = 18
    m = OccupancyMetric(num_classes=n, use_image_mask=True)
    total = np.zeros((n, n))
    for _ in range(3):
        pred = rng.randint(0, n, (1, 8, 8, 2))
        gt = rng.randint(0, n, (1, 8, 8, 2))
        mask = rng.rand(1, 8, 8, 2) > 0.5
        m.update(pred, gt, mask_camera=mask)
        total += _np_hist(pred, gt, mask, n)
    np.testing.assert_array_equal(m.hist, total)
    assert 'mIoU' in m.compute()


def test_bucketed_miou_matches_reference_loop():
    """Radius/height-bucketed histograms == the reference evaluator's
    per-bin host loop (mmdet3d/datasets/occ_metrics.py:165-245: voxel-center
    coordinates, half-open bins, last bin extended outward/upward)."""
    from fusionocc_tpu.config import GridConfig
    from fusionocc_tpu.eval.metrics import (height_bucket_grid,
                                            radius_bucket_grid)

    grid = GridConfig(x=(-40, 40, 8.0), y=(-40, 40, 8.0), z=(-1, 5.4, 0.8),
                      depth=(1.0, 9.0, 0.5))
    gx, gy, gz = grid.grid_size
    n = 18
    rng = np.random.RandomState(3)
    pred = rng.randint(0, n, (2, gx, gy, gz))
    gt = rng.randint(0, n, (2, gx, gy, gz))
    mask = rng.rand(2, gx, gy, gz) > 0.4

    m = OccupancyMetric(num_classes=n, grid=grid)
    m.update(pred, gt, mask_camera=mask)
    out = m.compute()

    # reference loop: voxel-center coords, per-bin boolean masks
    xs = grid.lower_bound[0] + (np.arange(gx) + 0.5) * grid.interval[0]
    ys = grid.lower_bound[1] + (np.arange(gy) + 0.5) * grid.interval[1]
    zs = grid.lower_bound[2] + (np.arange(gz) + 0.5) * grid.interval[2]
    r = np.sqrt(xs[:, None, None] ** 2 + ys[None, :, None] ** 2)
    r = np.broadcast_to(r, (gx, gy, gz))
    z3 = np.broadcast_to(zs[None, None, :], (gx, gy, gz))

    rbins = OccupancyMetric.RADIUS_BINS
    for i in range(len(rbins) - 1):
        lo, hi = rbins[i], rbins[i + 1]
        sel = (r >= lo) if i == len(rbins) - 2 else (r >= lo) & (r < hi)
        sel = np.broadcast_to(sel[None], pred.shape) & mask
        want = _np_hist(pred, gt, sel, n)
        got = m.buckets['radius']['hist'][i]
        np.testing.assert_array_equal(got, want)
        assert f'mIoU_radius_{lo}-{hi}m' in out

    habs = [grid.lower_bound[2] + h for h in OccupancyMetric.HEIGHT_BINS_REL]
    hrel = OccupancyMetric.HEIGHT_BINS_REL
    for i in range(len(habs) - 1):
        lo, hi = habs[i], habs[i + 1]
        sel = (z3 >= lo) if i == len(habs) - 2 else (z3 >= lo) & (z3 < hi)
        sel = np.broadcast_to(sel[None], pred.shape) & mask
        want = _np_hist(pred, gt, sel, n)
        got = m.buckets['height']['hist'][i]
        np.testing.assert_array_equal(got, want)
        assert f'mIoU_height_{hrel[i]}-{hrel[i + 1]}m' in out

    # bucket hists partition the global histogram
    np.testing.assert_array_equal(m.buckets['radius']['hist'].sum(0), m.hist)
    np.testing.assert_array_equal(m.buckets['height']['hist'].sum(0), m.hist)
