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
