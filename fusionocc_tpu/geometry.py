"""Pure-XLA (and host numpy) geometry for multi-view 3D occupancy.

Covers the reference's pose/projection math:
  - quaternion -> rotation matrix (host, numpy)
  - sweep-sensor -> key-ego pose chain in float64 on host
    (reference: projects/FusionOcc/fusionocc/fusion_occ.py:241-248)
  - LSS frustum template
    (reference: fusionocc/necks/view_transformer.py:105-133)
  - frustum pixel -> ego-frame points
    (reference: view_transformer.py:135-173 `get_lidar_coor`)
  - camera-parameter MLP input vector (27 dims)
    (reference: view_transformer.py:724-745 `get_mlp_input`)
  - BEV-augmentation (BDA) matrix
    (reference: fusionocc/transforms/loading.py:842-957)
  - point -> per-camera depth map z-buffer (host numpy version in data/)
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side (numpy, float64) pose utilities.
# ---------------------------------------------------------------------------

def quat_to_mat(q) -> np.ndarray:
    """Quaternion (w, x, y, z) -> 3x3 rotation matrix, float64."""
    w, x, y, z = [float(v) for v in q]
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0.0 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array(
        [[1.0 - (yy + zz), xy - wz, xz + wy],
         [xy + wz, 1.0 - (xx + zz), yz - wx],
         [xz - wy, yz + wx, 1.0 - (xx + yy)]], dtype=np.float64)


def pose_matrix(rotation_quat, translation) -> np.ndarray:
    """4x4 homogeneous pose from quaternion + translation (float64)."""
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = quat_to_mat(rotation_quat)
    m[:3, 3] = np.asarray(translation, dtype=np.float64)
    return m


def sensor2keyego_chain(sensor2egos: np.ndarray,
                        ego2globals: np.ndarray) -> np.ndarray:
    """Compute sweep-sensor -> key-frame-ego transforms in float64.

    Args:
      sensor2egos: (F, N, 4, 4) per-frame camera->its-own-ego.
      ego2globals: (F, N, 4, 4) per-frame ego->global.
    Returns:
      (F, N, 4, 4) float32 sensor->key-ego, where key ego is frame 0 / cam 0's
      ego pose (reference: fusion_occ.py:245-248).
    """
    s2e = np.asarray(sensor2egos, dtype=np.float64)
    e2g = np.asarray(ego2globals, dtype=np.float64)
    keyego2global = e2g[0, 0]
    global2keyego = np.linalg.inv(keyego2global)
    out = global2keyego[None, None] @ e2g @ s2e
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# Device-side (jax) geometry.
# ---------------------------------------------------------------------------

def make_frustum(depth_cfg: Tuple[float, float, float],
                 input_size: Tuple[int, int],
                 downsample: int,
                 sid: bool = False) -> jnp.ndarray:
    """Frustum template (D, Hf, Wf, 3) of (u, v, d) in input-image pixels.

    Mirrors view_transformer.py:105-133: depth bins are an arange over
    [lo, hi) with the given step; pixel centers are linspace(0, size-1, feat).
    """
    h_in, w_in = input_size
    h_feat, w_feat = h_in // downsample, w_in // downsample
    d = np.arange(depth_cfg[0], depth_cfg[1], depth_cfg[2], dtype=np.float32)
    num_d = d.shape[0]
    if sid:
        idx = np.arange(num_d, dtype=np.float32)
        lo, hi, _ = depth_cfg
        d = np.exp(np.log(lo) + idx / (num_d - 1) * np.log((hi - 1.0) / lo))
    d = np.broadcast_to(d[:, None, None], (num_d, h_feat, w_feat))
    x = np.linspace(0, w_in - 1, w_feat, dtype=np.float32)
    x = np.broadcast_to(x[None, None, :], (num_d, h_feat, w_feat))
    y = np.linspace(0, h_in - 1, h_feat, dtype=np.float32)
    y = np.broadcast_to(y[None, :, None], (num_d, h_feat, w_feat))
    return jnp.asarray(np.stack([x, y, d], axis=-1))


def frustum_to_ego(frustum: jnp.ndarray,
                   sensor2ego: jnp.ndarray,
                   intrins: jnp.ndarray,
                   post_rots: jnp.ndarray,
                   post_trans: jnp.ndarray,
                   bda: jnp.ndarray) -> jnp.ndarray:
    """Map the frustum template into (key-)ego coordinates.

    Args:
      frustum: (D, Hf, Wf, 3) pixel-space template.
      sensor2ego: (B, N, 4, 4); intrins/post_rots: (B, N, 3, 3);
      post_trans: (B, N, 3); bda: (B, 3, 3).
    Returns:
      (B, N, D, Hf, Wf, 3) ego-frame xyz.
    Mirrors view_transformer.py:135-173.
    """
    B, N = sensor2ego.shape[:2]
    f32 = jnp.float32
    pts = frustum.astype(f32)[None, None] - post_trans.astype(f32)[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rots.astype(f32))
    pts = jnp.einsum('bnij,bndhwj->bndhwi', inv_post, pts)
    # (u*d, v*d, d)
    pts = jnp.concatenate(
        [pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1)
    combine = jnp.einsum('bnij,bnjk->bnik',
                         sensor2ego[..., :3, :3].astype(f32),
                         jnp.linalg.inv(intrins.astype(f32)))
    pts = jnp.einsum('bnij,bndhwj->bndhwi', combine, pts)
    pts = pts + sensor2ego[..., :3, 3].astype(f32)[:, :, None, None, None, :]
    pts = jnp.einsum('bij,bndhwj->bndhwi', bda.astype(f32), pts)
    return pts


def get_mlp_input(sensor2keyego: jnp.ndarray,
                  intrin: jnp.ndarray,
                  post_rot: jnp.ndarray,
                  post_tran: jnp.ndarray,
                  bda: jnp.ndarray) -> jnp.ndarray:
    """27-dim camera parameter vector per view (B, N, 27).

    Mirrors view_transformer.py:724-745. The pose argument is the KEY frame's
    sensor2keyego regardless of which temporal frame is being processed
    (reference: fusion_occ.py:300-302).
    """
    B, N = intrin.shape[:2]
    bda_ = jnp.broadcast_to(bda[:, None], (B, N, 3, 3))
    feats = jnp.stack([
        intrin[:, :, 0, 0], intrin[:, :, 1, 1],
        intrin[:, :, 0, 2], intrin[:, :, 1, 2],
        post_rot[:, :, 0, 0], post_rot[:, :, 0, 1], post_tran[:, :, 0],
        post_rot[:, :, 1, 0], post_rot[:, :, 1, 1], post_tran[:, :, 1],
        bda_[:, :, 0, 0], bda_[:, :, 0, 1],
        bda_[:, :, 1, 0], bda_[:, :, 1, 1], bda_[:, :, 2, 2],
    ], axis=-1)
    pose = sensor2keyego[:, :, :3, :].reshape(B, N, 12)
    return jnp.concatenate([feats, pose], axis=-1)


def bda_matrix(rotate_deg: float, scale: float,
               flip_dx: bool, flip_dy: bool) -> np.ndarray:
    """BEV data-augmentation 3x3 matrix (host, float32).

    Mirrors transforms/loading.py bev_transform: rotation about z, uniform
    scale, then optional x/y flips.
    """
    a = np.deg2rad(rotate_deg)
    rot = np.array([[np.cos(a), -np.sin(a), 0.0],
                    [np.sin(a), np.cos(a), 0.0],
                    [0.0, 0.0, 1.0]], dtype=np.float64)
    scale_m = np.eye(3, dtype=np.float64) * scale
    scale_m[2, 2] = scale
    flip = np.eye(3, dtype=np.float64)
    if flip_dx:
        flip[0, 0] = -1.0
    if flip_dy:
        flip[1, 1] = -1.0
    return (flip @ (scale_m @ rot)).astype(np.float32)


def points_to_depthmap(points_img: jnp.ndarray,
                       valid: jnp.ndarray,
                       height: int, width: int,
                       depth_range: Tuple[float, float]) -> jnp.ndarray:
    """Z-buffered sparse depth map from projected points (device version).

    Args:
      points_img: (P, 3) of (u, v, depth) in pixels.
      valid: (P,) bool mask of real (non-padding) points.
      height/width: output map size.
      depth_range: (lo, hi); points outside are dropped.
    Returns:
      (height, width) float32, 0 where empty; nearest depth wins per pixel
      (tie-break mirrors depth_transforms.py:26-60: min depth per pixel).
    """
    u = jnp.round(points_img[:, 0]).astype(jnp.int32)
    v = jnp.round(points_img[:, 1]).astype(jnp.int32)
    d = points_img[:, 2]
    keep = (valid & (u >= 0) & (u < width) & (v >= 0) & (v < height)
            & (d >= depth_range[0]) & (d < depth_range[1]))
    pix = jnp.where(keep, v * width + u, height * width)  # dump invalid
    d = jnp.where(keep, d, jnp.inf)
    flat = jnp.full((height * width + 1,), jnp.inf, jnp.float32)
    flat = flat.at[pix].min(d)
    out = flat[:height * width].reshape(height, width)
    return jnp.where(jnp.isfinite(out), out, 0.0)
