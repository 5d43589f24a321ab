"""Synthetic batch generator with realistic geometry.

Fills the role of the reference's fixture factory
(mmdet3d/testing/model_utils.py:76 ``create_detector_inputs``): random but
shape- and geometry-consistent inputs for smoke tests and benchmarks when no
nuScenes data is present.
"""
from __future__ import annotations

import numpy as np

from ..config import ModelConfig
from ..models.fusion_occ import Batch


def _camera_rig(num_cams: int) -> np.ndarray:
    """(N, 4, 4) sensor2ego poses: cameras on a ring looking outward."""
    poses = []
    for i in range(num_cams):
        yaw = 2 * np.pi * i / num_cams
        # camera frame: +z forward (optical), +x right, +y down
        fwd = np.array([np.cos(yaw), np.sin(yaw), 0.0])
        right = np.array([-np.sin(yaw), np.cos(yaw), 0.0])
        down = np.array([0.0, 0.0, -1.0])
        R = np.stack([right, -down, fwd], axis=1)  # columns: x_cam,y_cam,z_cam
        t = fwd * 1.0 + np.array([0.0, 0.0, 1.5])
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = t
        poses.append(m)
    return np.stack(poses).astype(np.float32)


def synthetic_batch(cfg: ModelConfig, batch_size: int = 1, seed: int = 0,
                    num_points: int | None = None) -> Batch:
    rng = np.random.RandomState(seed)
    B, F, N = batch_size, cfg.num_frame, cfg.num_cams
    H, W = cfg.input_size
    gx, gy, gz = cfg.grid.grid_size

    imgs = rng.randn(B, F, N, H, W, 3).astype(np.float32)

    rig = _camera_rig(N)
    s2k = np.tile(rig[None, None], (B, F, 1, 1, 1)).astype(np.float32)
    # adjacent frames: ego moved ~0.5 m backwards between frames
    for f in range(1, F):
        shift = np.eye(4, dtype=np.float32)
        shift[0, 3] = -0.5 * f
        s2k[:, f] = np.einsum('ij,bnjk->bnik', shift, s2k[:, f])

    fx = 0.6 * W
    intr = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float32)
    intrins = np.tile(intr[None, None, None], (B, F, N, 1, 1))
    post_rots = np.tile(np.eye(3, dtype=np.float32)[None, None, None],
                        (B, F, N, 1, 1))
    post_trans = np.zeros((B, F, N, 3), np.float32)
    bda = np.tile(np.eye(3, dtype=np.float32)[None], (B, 1, 1))

    P = num_points or cfg.lidar.point_capacity
    pcr = cfg.grid.point_cloud_range
    pts = rng.uniform(0, 1, (B, P, 5)).astype(np.float32)
    pts[..., 0] = pts[..., 0] * (pcr[3] - pcr[0]) + pcr[0]
    pts[..., 1] = pts[..., 1] * (pcr[4] - pcr[1]) + pcr[1]
    pts[..., 2] = pts[..., 2] * (pcr[5] - pcr[2]) + pcr[2]
    points_mask = rng.rand(B, P) > 0.05

    # sparse depth: ~2% of pixels carry a depth in the valid range
    lo, hi, _ = cfg.grid.depth
    sd = rng.uniform(lo, hi - 1e-3, (B, N, H, W)).astype(np.float32)
    sd = np.where(rng.rand(B, N, H, W) < 0.02, sd, 0.0).astype(np.float32)

    segs = rng.randint(0, cfg.num_classes, (B, N, H, W)).astype(np.int32)
    voxel_semantics = rng.randint(0, cfg.num_classes,
                                  (B, gx, gy, gz)).astype(np.int32)
    mask_camera = rng.rand(B, gx, gy, gz) > 0.3

    ego2global = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
    ego2global[:, 0, 3] = seed * 0.5  # distinct poses across seeds

    return Batch(
        imgs=imgs, sensor2keyego=s2k, intrins=intrins, post_rots=post_rots,
        post_trans=post_trans, bda=bda, points=pts, points_mask=points_mask,
        sparse_depth=sd, segs=segs, voxel_semantics=voxel_semantics,
        mask_camera=mask_camera, ego2global=ego2global)
