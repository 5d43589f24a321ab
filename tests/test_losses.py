"""Losses vs torch reference formulations (the reference's exact math:
fusion_view_transformer.py:189-224 depth BCE + seg CE;
fusion_occ.py:843-875 masked occupancy CE) and LR schedule boundaries."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fusionocc_tpu.config import OptimConfig, tiny_model_config
from fusionocc_tpu.models.lss import downsample_depth_onehot
from fusionocc_tpu.train.losses import depth_loss, occ_loss, seg_loss
from fusionocc_tpu.train.loop import make_lr_schedule


def _torch_depth_loss(pred, labels):
    """view_transformer.py:788-803 semantics on one-hot labels."""
    pred = torch.from_numpy(pred).reshape(-1, pred.shape[-1])
    labels = torch.from_numpy(labels).reshape(-1, labels.shape[-1])
    fg = labels.max(1).values > 0
    pred, labels = pred[fg], labels[fg]
    return float(F.binary_cross_entropy(
        pred.clamp(1e-7, 1 - 1e-7), labels, reduction='none').sum()
        / max(1.0, float(fg.sum())))


def test_depth_loss_matches_torch():
    cfg = tiny_model_config()
    rng = np.random.RandomState(0)
    B, N = 1, cfg.num_cams
    H, W = cfg.input_size
    h, w = cfg.feat_size
    D = cfg.grid.num_depth_bins
    sd = np.where(rng.rand(B, N, H, W) < 0.05,
                  rng.uniform(1.0, 8.9, (B, N, H, W)), 0.0).astype(np.float32)
    logits = rng.randn(B, N, h, w, D).astype(np.float32)
    pred = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    got = float(depth_loss(jnp.asarray(pred), jnp.asarray(sd), cfg))
    labels, _ = downsample_depth_onehot(jnp.asarray(sd), cfg.vt.downsample,
                                        cfg.grid)
    ref = _torch_depth_loss(pred, np.asarray(labels))
    assert abs(got - ref) < 1e-4, (got, ref)


def test_sid_depth_binning_matches_torch():
    """SID (log-spaced) GT depth bins == reference formula
    (view_transformer.py:768-778), incl. min-pool and empty handling."""
    cfg = tiny_model_config()
    rng = np.random.RandomState(7)
    B, N = 1, 2
    H, W = cfg.input_size
    ds = cfg.vt.downsample
    D = cfg.grid.num_depth_bins
    lo, hi, _ = cfg.grid.depth
    sd = np.where(rng.rand(B, N, H, W) < 0.3,
                  rng.uniform(0.5, hi + 2.0, (B, N, H, W)), 0.0
                  ).astype(np.float32)

    # reference formula in torch
    g = torch.from_numpy(sd).view(B * N, H // ds, ds, W // ds, ds, 1)
    g = g.permute(0, 1, 3, 5, 2, 4).contiguous().view(-1, ds * ds)
    g = torch.where(g == 0.0, 1e5 * torch.ones_like(g), g)
    g = torch.min(g, dim=-1).values
    g = torch.log(g) - torch.log(torch.tensor(float(lo)))
    g = g * (D - 1) / torch.log(torch.tensor(hi - 1.0) / lo) + 1.0
    g = torch.where((g < D + 1) & (g >= 0.0), g, torch.zeros_like(g))
    ref = F.one_hot(g.long(), num_classes=D + 1).view(-1, D + 1)[:, 1:]

    onehot, bins = downsample_depth_onehot(jnp.asarray(sd), ds, cfg.grid,
                                           sid=True)
    got = np.asarray(onehot).reshape(-1, D)
    np.testing.assert_array_equal(got, ref.numpy().astype(np.float32))
    assert np.asarray(bins).min() >= 0 and np.asarray(bins).max() <= D


def test_seg_loss_matches_torch():
    cfg = tiny_model_config()
    rng = np.random.RandomState(1)
    B, N = 1, cfg.num_cams
    H, W = cfg.input_size
    h, w = cfg.feat_size
    nc = cfg.vt.seg_num_classes
    segs = rng.randint(0, 18, (B, N, H, W)).astype(np.int32)
    logits = rng.randn(B, N, h, w, nc).astype(np.float32)
    got = float(seg_loss(jnp.asarray(logits), jnp.asarray(segs), cfg))

    lab = torch.from_numpy(
        segs[:, :, ::cfg.vt.downsample, ::cfg.vt.downsample].reshape(-1)
    ).long()
    lg = torch.from_numpy(logits.reshape(-1, nc))
    m = lab != 17
    ref = float(F.cross_entropy(lg[m], lab[m]))
    assert abs(got - ref) < 1e-4, (got, ref)


def test_occ_loss_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(1, 10, 10, 4, 18).astype(np.float32)
    sem = rng.randint(0, 18, (1, 10, 10, 4)).astype(np.int32)
    mask = rng.rand(1, 10, 10, 4) > 0.4
    got = float(occ_loss(jnp.asarray(logits), jnp.asarray(sem),
                         jnp.asarray(mask), use_mask=True))
    lg = torch.from_numpy(logits.reshape(-1, 18))
    lb = torch.from_numpy(sem.reshape(-1)).long()
    w = torch.from_numpy(mask.reshape(-1).astype(np.float32))
    per = F.cross_entropy(lg, lb, reduction='none')
    ref = float((per * w).sum() / w.sum())
    assert abs(got - ref) < 1e-5, (got, ref)


def test_occ_loss_chunked_matches_direct():
    # 80000 rows triggers the lax.map chunked path (2x _OCC_LOSS_CHUNK);
    # value and gradient must match the direct fp32 computation
    from fusionocc_tpu.train import losses as L
    rng = np.random.RandomState(7)
    n = 2 * L._OCC_LOSS_CHUNK
    logits = rng.randn(n, 18).astype(np.float32)
    sem = rng.randint(0, 18, (n,)).astype(np.int32)
    mask = rng.rand(n) > 0.4

    def direct(lg):
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.asarray(sem)[:, None],
                                   axis=1)[:, 0]
        w = jnp.asarray(mask).astype(jnp.float32)
        return jnp.sum(nll * w) / jnp.maximum(1.0, jnp.sum(w))

    lg = jnp.asarray(logits)
    got, ref = occ_loss(lg, jnp.asarray(sem), jnp.asarray(mask), True), \
        direct(lg)
    assert abs(float(got) - float(ref)) < 1e-6, (got, ref)
    g_got = jax.grad(lambda x: occ_loss(x, jnp.asarray(sem),
                                        jnp.asarray(mask), True))(lg)
    g_ref = jax.grad(direct)(lg)
    assert float(jnp.max(jnp.abs(g_got - g_ref))) < 1e-7
    # unmasked path (mean over all rows)
    got_u = occ_loss(lg, jnp.asarray(sem), None, False)
    ref_u = float(np.mean(np.asarray(
        -jax.nn.log_softmax(lg, -1)[jnp.arange(n), jnp.asarray(sem)])))
    assert abs(float(got_u) - ref_u) < 1e-6


def test_lr_schedule_boundaries():
    opt = OptimConfig(lr=1e-3, warmup_iters=100, warmup_start_factor=1 / 3,
                      max_epochs=2, iters_per_epoch=500, eta_min_factor=1e-3)
    sched = make_lr_schedule(opt)
    assert abs(float(sched(0)) - 1e-3 / 3) < 1e-9
    assert abs(float(sched(100)) - 1e-3) < 1e-8
    # end of cosine: eta_min = lr * factor
    assert abs(float(sched(1000)) - 1e-6) < 1e-8
    # monotone decay after warmup
    assert float(sched(300)) > float(sched(700))
