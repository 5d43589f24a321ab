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


_OCC_LOSS_CHUNK = 40000


def occ_loss(logits: jnp.ndarray, voxel_semantics: jnp.ndarray,
             mask_camera: jnp.ndarray | None, use_mask: bool) -> jnp.ndarray:
    """Masked cross-entropy, sum / mask count (fusion_occ.py:843-875).

    Memory note: a [B*640k, nc] fp32 softmax temp pads nc=18 lanes to 128
    (7.1x, ~312 MB fwd + again in the vjp) and was a top HBM allocation of
    the full-size train step.  The row axis is chunked under lax.map with
    per-chunk remat so live fp32 temps stay ~20 MB; the cast to fp32
    happens inside the chunk so the assembled cotangent is bf16.
    """
    nc = logits.shape[-1]
    flat_logits = logits.reshape(-1, nc)
    flat_label = voxel_semantics.reshape(-1).astype(jnp.int32)
    if use_mask and mask_camera is not None:
        w = mask_camera.reshape(-1).astype(jnp.float32)
    else:
        w = jnp.ones((flat_logits.shape[0],), jnp.float32)

    def chunk_sums(args):
        lg, lb, ww = args
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, lb[:, None], axis=1)[:, 0]
        return jnp.sum(nll * ww), jnp.sum(ww)

    n = flat_logits.shape[0]
    if n >= 2 * _OCC_LOSS_CHUNK and n % _OCC_LOSS_CHUNK == 0:
        c = n // _OCC_LOSS_CHUNK
        sums, counts = jax.lax.map(
            jax.checkpoint(chunk_sums),
            (flat_logits.reshape(c, _OCC_LOSS_CHUNK, nc),
             flat_label.reshape(c, _OCC_LOSS_CHUNK),
             w.reshape(c, _OCC_LOSS_CHUNK)))
        tot, cnt = jnp.sum(sums), jnp.sum(counts)
    else:
        tot, cnt = chunk_sums((flat_logits, flat_label, w))
    if use_mask and mask_camera is not None:
        return tot / jnp.maximum(1.0, cnt)
    return tot / n


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
