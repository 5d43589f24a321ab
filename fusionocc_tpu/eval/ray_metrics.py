"""RayIoU: ray-casting occupancy metric (jit-friendly).

The reference exposes RayIoU through a registry swap into STCOcc's evaluator
(fusionocc/occupancy_metric_hybrid.py:10-154). This is a self-contained
TPU-native implementation of the metric's core definition (SparseOcc /
Occ3D RayIoU): for each query ray, march through the voxel grid to the first
non-free voxel in prediction and ground truth; the ray is a true positive
for its GT class when the predicted class matches and the travelled depths
differ by less than a threshold (1/2/4 m). IoU_c = TP_c/(TP_c+FP_c+FN_c),
mIoU averaged over classes present and over thresholds.

Rays are supplied by the caller: either the official synthetic lidar fan
(`generate_lidar_rays`, the ray set the STCOcc evaluator uses,
ray_metrics_occ3d.py:83-106) or beam directions from the sample's point
cloud (`rays_from_points`).

Validated against the official definition (calc_metrics,
ray_metrics_occ3d.py:187-235): per-threshold TP = (pred hit class == gt hit
class) AND |pred depth - gt depth| < thr; per-class counts accumulate each
ray under its hit class; IoU_c = tp / (gt_cnt + pred_cnt - tp); classes
absent from both sides are excluded (nan), free dropped; headline RayIoU =
mean over thresholds of the class means.  Intentional divergences from the
CUDA DVR renderer: (a) marching uses a fixed 0.2 m step instead of exact
voxel traversal, so hit depths quantize to the step (well under the 1 m
finest threshold); (b) rays that exit the grid without hitting are excluded
from both sides' counts rather than carrying the renderer's last-voxel
fallback.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GridConfig


def rays_from_points(points: np.ndarray, origin=(0.0, 0.0, 0.0),
                     max_rays: int = 8192, seed: int = 0) -> np.ndarray:
    """Unit ray directions from `origin` through (a subsample of) points."""
    rng = np.random.RandomState(seed)
    pts = points[:, :3] - np.asarray(origin)
    norm = np.linalg.norm(pts, axis=1)
    keep = norm > 1e-3
    pts = pts[keep] / norm[keep][:, None]
    if len(pts) > max_rays:
        pts = pts[rng.choice(len(pts), max_rays, replace=False)]
    elif len(pts) < max_rays:
        pad = pts[rng.choice(len(pts), max_rays - len(pts))]
        pts = np.concatenate([pts, pad], axis=0)
    return pts.astype(np.float32)


def generate_lidar_rays() -> np.ndarray:
    """The official evaluation ray fan (ray_metrics_occ3d.py:83-106).

    Pitch angles follow the nuScenes lidar: -(pi/2 - atan(k+1)) for k<10,
    then extended upward with the last spacing until +0.21 rad; azimuth
    sweeps 0..359 deg in 1 deg steps.
    """
    import math
    pitch = [-(math.pi / 2 - math.atan(k + 1)) for k in range(10)]
    while pitch[-1] < 0.21:
        pitch.append(pitch[-1] + (pitch[-1] - pitch[-2]))
    rays = []
    for p in pitch:
        for az_deg in np.arange(0, 360, 1):
            az = np.deg2rad(az_deg)
            rays.append((np.cos(p) * np.cos(az), np.cos(p) * np.sin(az),
                         np.sin(p)))
    return np.asarray(rays, np.float32)


def _first_hit(occ: jnp.ndarray, origin: jnp.ndarray, dirs: jnp.ndarray,
               grid: GridConfig, step: float, num_steps: int,
               free_class: int):
    """March rays; return (hit_depth, hit_class, hit_valid) per ray."""
    gx, gy, gz = grid.grid_size
    ts = (jnp.arange(num_steps, dtype=jnp.float32) + 0.5) * step  # (S,)
    pos = origin[None, None, :] + dirs[:, None, :] * ts[None, :, None]
    v = jnp.floor((pos - grid.lower_bound) / grid.interval).astype(jnp.int32)
    inside = ((v[..., 0] >= 0) & (v[..., 0] < gx) &
              (v[..., 1] >= 0) & (v[..., 1] < gy) &
              (v[..., 2] >= 0) & (v[..., 2] < gz))
    flat = jnp.clip((v[..., 0] * gy + v[..., 1]) * gz + v[..., 2],
                    0, gx * gy * gz - 1)
    cls = occ.reshape(-1)[flat]                              # (R, S)
    occupied = inside & (cls != free_class)
    first = jnp.argmax(occupied, axis=1)                     # (R,)
    valid = jnp.any(occupied, axis=1)
    depth = ts[first]
    hit_cls = jnp.take_along_axis(cls, first[:, None], axis=1)[:, 0]
    return depth, hit_cls, valid


def ray_iou(pred: jnp.ndarray, gt: jnp.ndarray, dirs: jnp.ndarray,
            grid: GridConfig, origin=(0.0, 0.0, 0.0),
            thresholds: Sequence[float] = (1.0, 2.0, 4.0),
            num_classes: int = 18, free_class: int = 17,
            step: float = 0.2) -> Dict[str, float]:
    """RayIoU over one sample's (X, Y, Z) pred/gt grids.

    Returns per-threshold mIoU and their mean (the headline RayIoU).
    """
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    dirs = jnp.asarray(dirs)
    o = jnp.asarray(origin, jnp.float32)
    reach = float(max(grid.x[1] - grid.x[0], grid.y[1] - grid.y[0]))
    num_steps = int(reach / step)

    dp, cp, vp = _first_hit(pred, o, dirs, grid, step, num_steps, free_class)
    dg, cg, vg = _first_hit(gt, o, dirs, grid, step, num_steps, free_class)

    out = {}
    mious = []
    for thr in thresholds:
        match = vp & vg & (cp == cg) & (jnp.abs(dp - dg) < thr)
        ious = []
        hist_tp = jax.ops.segment_sum(
            match.astype(jnp.float32),
            jnp.where(vg, cg, num_classes).astype(jnp.int32),
            num_segments=num_classes + 1)[:num_classes]
        hist_gt = jax.ops.segment_sum(
            jnp.ones_like(dg),
            jnp.where(vg, cg, num_classes).astype(jnp.int32),
            num_segments=num_classes + 1)[:num_classes]
        hist_pred = jax.ops.segment_sum(
            jnp.ones_like(dp),
            jnp.where(vp, cp, num_classes).astype(jnp.int32),
            num_segments=num_classes + 1)[:num_classes]
        tp = np.asarray(hist_tp)
        fn = np.asarray(hist_gt) - tp
        fp = np.asarray(hist_pred) - tp
        denom = tp + fp + fn
        with np.errstate(divide='ignore', invalid='ignore'):
            iou = tp / denom
        miou = float(np.nanmean(iou[:free_class]))
        out[f'RayIoU@{thr}'] = round(miou * 100, 2)
        mious.append(miou)
    out['RayIoU'] = round(float(np.mean(mious)) * 100, 2)
    return out
