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


def bucketed_confusion_matrix(pred: jnp.ndarray, gt: jnp.ndarray,
                              mask: jnp.ndarray, bucket_id: jnp.ndarray,
                              num_buckets: int,
                              num_classes: int = 18) -> jnp.ndarray:
    """(num_buckets, C, C) per-bucket confusion matrices in ONE segment_sum.

    TPU-native form of the reference evaluator's radius/height-bucketed
    histograms (mmdet3d/datasets/occ_metrics.py:165-245, which python-loops
    over bins on the host): the bucket id joins the segment key, so all
    buckets accumulate in a single jitted reduction.
    """
    pred = jnp.clip(pred.reshape(-1).astype(jnp.int32), 0, num_classes - 1)
    gt = gt.reshape(-1).astype(jnp.int32)
    b = jnp.clip(bucket_id.reshape(-1).astype(jnp.int32), 0, num_buckets - 1)
    w = (mask.reshape(-1) & (gt >= 0) & (gt < num_classes))
    n = num_buckets * num_classes * num_classes
    key = jnp.where(w, (b * num_classes + gt) * num_classes + pred, n)
    hist = jax.ops.segment_sum(jnp.ones_like(key, jnp.float32), key,
                               num_segments=n + 1)
    return hist[:-1].reshape(num_buckets, num_classes, num_classes)


def radius_bucket_grid(grid, radius_bins) -> Tuple[np.ndarray, list]:
    """Per-voxel radius-bin id (X, Y, Z) + display labels.

    Voxel-center radius sqrt(x^2+y^2), bins half-open with the LAST bin
    extended to any larger radius (occ_metrics.py:71-77,190-199).
    """
    gx, gy, gz = grid.grid_size
    xs = grid.lower_bound[0] + (np.arange(gx) + 0.5) * grid.interval[0]
    ys = grid.lower_bound[1] + (np.arange(gy) + 0.5) * grid.interval[1]
    r = np.sqrt(xs[:, None] ** 2 + ys[None, :] ** 2)
    bid = np.clip(np.digitize(r, radius_bins[1:]), 0,
                  len(radius_bins) - 2).astype(np.int32)
    bid = np.broadcast_to(bid[:, :, None], (gx, gy, gz))
    labels = [f'{radius_bins[i]}-{radius_bins[i + 1]}m'
              for i in range(len(radius_bins) - 1)]
    return np.ascontiguousarray(bid), labels


def height_bucket_grid(grid, height_bins_rel) -> Tuple[np.ndarray, list]:
    """Per-voxel height-bin id (X, Y, Z) + labels; bins are relative to the
    grid floor (occ_metrics.py:80-93: z_min + relative bin edges), last bin
    extended upward."""
    gx, gy, gz = grid.grid_size
    zs = grid.lower_bound[2] + (np.arange(gz) + 0.5) * grid.interval[2]
    edges = [grid.lower_bound[2] + h for h in height_bins_rel]
    bid = np.clip(np.digitize(zs, edges[1:]), 0,
                  len(edges) - 2).astype(np.int32)
    bid = np.broadcast_to(bid[None, None, :], (gx, gy, gz))
    labels = [f'{height_bins_rel[i]}-{height_bins_rel[i + 1]}m'
              for i in range(len(height_bins_rel) - 1)]
    return np.ascontiguousarray(bid), labels


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
    """Streaming evaluator: accumulate per-batch confusion matrices.

    With ``grid`` set, also accumulates radius- and height-bucketed
    histograms (the reference base evaluator's distance/height-conditioned
    mIoU, mmdet3d/datasets/occ_metrics.py:70-93,165-245, whose printed
    tables tools/parse_radius_miou.py post-processes).
    """

    RADIUS_BINS = (0, 20, 25, 30, 35, 40, 45, 50)
    HEIGHT_BINS_REL = (0, 2, 4, 6)

    def __init__(self, num_classes: int = 18, use_image_mask: bool = True,
                 use_lidar_mask: bool = False, grid=None):
        self.num_classes = num_classes
        self.use_image_mask = use_image_mask
        self.use_lidar_mask = use_lidar_mask
        self.hist = np.zeros((num_classes, num_classes), np.float64)
        self.count = 0
        self.buckets = {}
        if grid is not None:
            for name, (bid, labels) in (
                    ('radius', radius_bucket_grid(grid, self.RADIUS_BINS)),
                    ('height', height_bucket_grid(grid,
                                                  self.HEIGHT_BINS_REL))):
                self.buckets[name] = {
                    'id': jnp.asarray(bid), 'labels': labels,
                    'hist': np.zeros((len(labels), num_classes, num_classes),
                                     np.float64)}

    def update(self, pred, gt, mask_camera=None, mask_lidar=None):
        if self.use_image_mask and mask_camera is not None:
            mask = mask_camera
        elif self.use_lidar_mask and mask_lidar is not None:
            mask = mask_lidar
        else:
            mask = jnp.ones(np.shape(gt), bool)
        pred, gt = jnp.asarray(pred), jnp.asarray(gt)
        mask = jnp.asarray(mask)
        self.hist += np.asarray(
            confusion_matrix(pred, gt, mask, self.num_classes))
        for b in self.buckets.values():
            bid = b['id']
            if np.ndim(gt) == 4:          # (B, X, Y, Z)
                bid = jnp.broadcast_to(bid[None], np.shape(gt))
            b['hist'] += np.asarray(bucketed_confusion_matrix(
                pred, gt, mask, bid, len(b['labels']), self.num_classes))
        self.count += int(np.shape(gt)[0]) if np.ndim(gt) == 4 else 1

    def reduced_hist(self, hist=None) -> np.ndarray:
        """Histogram summed across hosts (the reference's collect_results
        CPU gather, occupancy_metric.py:28-35).  No-op single-process."""
        hist = self.hist if hist is None else hist
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                jnp.asarray(hist))).sum(axis=0)
        return hist

    def compute(self) -> Dict[str, float]:
        out = miou_from_hist(self.reduced_hist())
        for name, b in self.buckets.items():
            hist = self.reduced_hist(b['hist'])
            for i, label in enumerate(b['labels']):
                out[f'mIoU_{name}_{label}'] = miou_from_hist(hist[i])['mIoU']
        return out
