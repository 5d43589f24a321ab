"""Occ3D mIoU evaluation (jit-friendly confusion matrix).

Mirrors Metric_mIoU (reference:
projects/FusionOcc/fusionocc/datasets/occ_metrics.py:44-153): an 18x18
confusion matrix accumulated over camera-masked voxels, per-class
IoU = diag / (row + col - diag), mIoU = nanmean over classes 0..16 (the
``free`` class 17 is excluded from the mean).

Distributed evaluation (replacing the reference's CPU result gather,
occupancy_metric.py:28-35) happens at two levels: within one process, a
batch sharded over a mesh's 'data' axis reduces globally inside the jitted
``confusion_matrix`` (the replicated output makes XLA insert the
cross-device reduction — verified in tests/test_sharding.py); across
processes, ``OccupancyMetric.compute`` all-gathers the per-host histograms
and sums them before computing mIoU.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLASS_NAMES = ['others', 'barrier', 'bicycle', 'bus', 'car',
               'construction_vehicle', 'motorcycle', 'pedestrian',
               'traffic_cone', 'trailer', 'truck', 'driveable_surface',
               'other_flat', 'sidewalk', 'terrain', 'manmade', 'vegetation',
               'free']


def confusion_matrix(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
                     num_classes: int = 18) -> jnp.ndarray:
    """(num_classes, num_classes) counts of (gt, pred) over masked voxels."""
    pred = jnp.clip(pred.reshape(-1).astype(jnp.int32), 0, num_classes - 1)
    gt = gt.reshape(-1).astype(jnp.int32)
    w = (mask.reshape(-1) & (gt >= 0) & (gt < num_classes))
    key = jnp.where(w, gt * num_classes + pred, num_classes * num_classes)
    hist = jax.ops.segment_sum(
        jnp.ones_like(key, jnp.float32), key,
        num_segments=num_classes * num_classes + 1)
    return hist[:-1].reshape(num_classes, num_classes)


def miou_from_hist(hist: np.ndarray) -> Dict[str, float]:
    """Per-class IoU and masked mIoU (free class excluded from the mean)."""
    hist = np.asarray(hist, np.float64)
    diag = np.diag(hist)
    denom = hist.sum(1) + hist.sum(0) - diag
    with np.errstate(divide='ignore', invalid='ignore'):
        iou = diag / denom
    n = hist.shape[0]
    out = {f'IoU_{CLASS_NAMES[i] if i < len(CLASS_NAMES) else i}':
           float(round(v * 100, 2)) for i, v in enumerate(iou)}
    out['mIoU'] = float(round(np.nanmean(iou[:n - 1]) * 100, 2))
    return out


def fscore(pred: np.ndarray, gt: np.ndarray,
           mask: 'np.ndarray | None' = None,
           voxel_size=(0.4, 0.4, 0.4),
           pc_range=(-40, -40, -1, 40, 40, 5.4),
           free_classes=(17, 255),
           threshold_acc: float = 0.6,
           threshold_complete: float = 0.6) -> dict:
    """Geometric F-score of occupied-voxel surfaces (Metric_FScore,
    occ_metrics.py:156-245): nearest-neighbor distances between the occupied
    voxel centers of prediction and GT, thresholded into accuracy (pred->gt)
    and completeness (gt->pred), combined harmonically.
    """
    from sklearn.neighbors import KDTree
    pred = np.array(pred)
    gt = np.array(gt)
    if mask is not None:
        pred = np.where(mask, pred, 255)
        gt = np.where(mask, gt, 255)

    def to_points(vox):
        occ = ~np.isin(vox, list(free_classes))
        idx = np.stack(np.nonzero(occ), axis=1).astype(np.float64)
        return (idx + 0.5) * np.asarray(voxel_size) + np.asarray(pc_range[:3])

    p, g = to_points(pred), to_points(gt)
    if len(p) == 0 or len(g) == 0:
        return {'accuracy': 0.0, 'completeness': 0.0, 'fscore': 0.0}
    complete_d, _ = KDTree(p, leaf_size=10).query(g)
    acc_d, _ = KDTree(g, leaf_size=10).query(p)
    completeness = float((complete_d.ravel() < threshold_complete).mean())
    accuracy = float((acc_d.ravel() < threshold_acc).mean())
    eps = 1e-8
    f = 2.0 / (1 / (accuracy + eps) + 1 / (completeness + eps))
    return {'accuracy': accuracy, 'completeness': completeness, 'fscore': f}


class OccupancyMetric:
    """Streaming evaluator: accumulate per-batch confusion matrices."""

    def __init__(self, num_classes: int = 18, use_image_mask: bool = True,
                 use_lidar_mask: bool = False):
        self.num_classes = num_classes
        self.use_image_mask = use_image_mask
        self.use_lidar_mask = use_lidar_mask
        self.hist = np.zeros((num_classes, num_classes), np.float64)
        self.count = 0

    def update(self, pred, gt, mask_camera=None, mask_lidar=None):
        if self.use_image_mask and mask_camera is not None:
            mask = mask_camera
        elif self.use_lidar_mask and mask_lidar is not None:
            mask = mask_lidar
        else:
            mask = jnp.ones(np.shape(gt), bool)
        self.hist += np.asarray(
            confusion_matrix(jnp.asarray(pred), jnp.asarray(gt),
                             jnp.asarray(mask), self.num_classes))
        self.count += int(np.shape(gt)[0]) if np.ndim(gt) == 4 else 1

    def reduced_hist(self) -> np.ndarray:
        """Histogram summed across hosts (the reference's collect_results
        CPU gather, occupancy_metric.py:28-35).  No-op single-process."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                jnp.asarray(self.hist))).sum(axis=0)
        return self.hist

    def compute(self) -> Dict[str, float]:
        return miou_from_hist(self.reduced_hist())
