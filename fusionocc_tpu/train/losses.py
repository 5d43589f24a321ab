"""Loss assembly for FusionOcc training.

Mirrors the reference's three-part objective (fusion_occ.py:804-875,
fusion_view_transformer.py:189-224):
  - depth BCE between the softmaxed depth distribution and the one-hot
    min-pooled LiDAR depth, over foreground pixels, sum/count.
  - 2D semantic CE at feature resolution, ignoring the free class (17),
    label subsampled with stride `downsample` (NOT min-pooled).
  - masked occupancy CE normalized by the camera-mask count.
Total = depth * fuse_w * depth_w + seg * fuse_w + occ.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.lss import downsample_depth_onehot


def depth_loss(depth_pred: jnp.ndarray, sparse_depth: jnp.ndarray,
               cfg: ModelConfig) -> jnp.ndarray:
    """BCE(softmax depth, one-hot gt), foreground pixels only.

    depth_pred: (B, N, h, w, D) probabilities. Reference:
    fusion_view_transformer.py:204-219 (sum over bins / #fg pixels).
    """
    labels, _ = downsample_depth_onehot(sparse_depth, cfg.vt.downsample,
                                        cfg.grid, sid=cfg.vt.sid)
    labels = labels.reshape(-1, labels.shape[-1])
    pred = depth_pred.astype(jnp.float32).reshape(-1, depth_pred.shape[-1])
    fg = jnp.max(labels, axis=1) > 0.0
    p = jnp.clip(pred, 1e-7, 1.0 - 1e-7)
    bce = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    bce = jnp.sum(bce, axis=-1) * fg.astype(jnp.float32)
    return jnp.sum(bce) / jnp.maximum(1.0, jnp.sum(fg))


def seg_loss(seg_logits: jnp.ndarray, segs: jnp.ndarray,
             cfg: ModelConfig) -> jnp.ndarray:
    """CE over non-free pixels of the stride-subsampled label map.

    seg_logits: (B, N, h, w, ncls); segs: (B, N, H, W) int.
    Reference: fusion_view_transformer.py:189-202.
    """
    ds = cfg.vt.downsample
    label = segs[:, :, ::ds, ::ds].reshape(-1)
    logits = seg_logits.astype(jnp.float32).reshape(-1, seg_logits.shape[-1])
    valid = label != 17
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.clip(label, 0, logits.shape[-1] - 1)[:, None], axis=1)[:, 0]
    nll = nll * valid.astype(jnp.float32)
    return jnp.sum(nll) / jnp.maximum(1.0, jnp.sum(valid))


def occ_loss(logits: jnp.ndarray, voxel_semantics: jnp.ndarray,
             mask_camera: jnp.ndarray | None, use_mask: bool) -> jnp.ndarray:
    """Masked cross-entropy, sum / mask count (fusion_occ.py:843-875)."""
    nc = logits.shape[-1]
    flat_logits = logits.astype(jnp.float32).reshape(-1, nc)
    flat_label = voxel_semantics.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(flat_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, flat_label[:, None], axis=1)[:, 0]
    if use_mask and mask_camera is not None:
        w = mask_camera.reshape(-1).astype(jnp.float32)
        return jnp.sum(nll * w) / jnp.maximum(1.0, jnp.sum(w))
    return jnp.mean(nll)


def total_loss(outputs: Dict, batch, cfg: ModelConfig
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    d = depth_loss(outputs['depth'], batch.sparse_depth, cfg)
    s = seg_loss(outputs['seg_logits'], batch.segs, cfg)
    o = occ_loss(outputs['occ_logits'], batch.voxel_semantics,
                 batch.mask_camera, cfg.use_mask)
    losses = {
        'depth_loss': d * cfg.fuse_loss_weight * cfg.depth_loss_weight,
        'seg_loss': s * cfg.fuse_loss_weight,
        'loss_occ': o,
    }
    loss = losses['depth_loss'] + losses['seg_loss'] + losses['loss_occ']
    return loss, {**losses, 'loss': loss}
