"""Named configuration presets — the reference's config-variant zoo.

The reference ships ~26 python config files differing in leaf keys
(projects/FusionOcc/configs/: baseline, unified training recipe, mask
ablations, depth-supervision ablation, distance-condition masks, calibration
variants). Here each variant is a named preset over the frozen dataclasses.

Usage:
    from fusionocc_tpu.configs import get_config, CONFIGS
    cfg = get_config('fusion_occ_unified')
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

from .config import (ModelConfig, OptimConfig, TrainConfig,
                     full_model_config, tiny_model_config)


def _baseline() -> TrainConfig:
    """configs/fusion_occ.py: lr 5e-5, clip 5, 24 epochs, camera mask on."""
    return TrainConfig(model=full_model_config(), optim=OptimConfig())


def _unified() -> TrainConfig:
    """The unified training recipe (fusion_occ_occ3d_miou_unified.py:279-289):
    lr 2e-4, grad-accum 8, clip 35, 0.1 lr_mult on backbone/VT."""
    return TrainConfig(
        model=full_model_config(),
        optim=OptimConfig(lr=2e-4, clip_norm=35.0, accumulate_steps=8,
                          backbone_lr_mult=0.1))


def _wo_mask() -> TrainConfig:
    """wo_train_cam_mask: every voxel supervised."""
    c = _baseline()
    return dataclasses.replace(
        c, model=dataclasses.replace(c.model, use_mask=False,
                                     mask_mode='baseline_without_mask'))


def _wo_depth_sv() -> TrainConfig:
    """Depth-supervision ablation (…_wo_DepthSV.py:81: depth_loss_weight=0)."""
    c = _baseline()
    return dataclasses.replace(
        c, model=dataclasses.replace(c.model, depth_loss_weight=0.0))


def _mask_mode(mode: str) -> Callable[[], TrainConfig]:
    def make() -> TrainConfig:
        c = _baseline()
        return dataclasses.replace(
            c, model=dataclasses.replace(c.model, mask_mode=mode))
    return make


def _image_only() -> TrainConfig:
    c = _baseline()
    return dataclasses.replace(
        c, model=dataclasses.replace(c.model, use_lidar=False))


def _tiny() -> TrainConfig:
    return TrainConfig(model=tiny_model_config(),
                       optim=OptimConfig(warmup_iters=10, iters_per_epoch=10))


CONFIGS: Dict[str, Callable[[], TrainConfig]] = {
    'fusion_occ': _baseline,
    'fusion_occ_unified': _unified,
    'fusion_occ_wo_mask': _wo_mask,
    'fusion_occ_wo_depth_sv': _wo_depth_sv,
    'fusion_occ_condition_C': _mask_mode('condition_C'),
    'fusion_occ_condition_D': _mask_mode('condition_D'),
    'fusion_occ_condition_D_prime': _mask_mode('condition_D_prime'),
    'fusion_occ_condition_D_full': _mask_mode('condition_D_full'),
    'fusion_occ_condition_C_full': _mask_mode('condition_C_full'),
    'fusion_occ_image_only': _image_only,
    'tiny': _tiny,
}


def get_config(name: str, **overrides) -> TrainConfig:
    if name not in CONFIGS:
        raise KeyError(f'unknown config {name!r}; one of {sorted(CONFIGS)}')
    cfg = CONFIGS[name]()
    if overrides:
        model_keys = {f.name for f in dataclasses.fields(ModelConfig)}
        optim_keys = {f.name for f in dataclasses.fields(OptimConfig)}
        m = {k: v for k, v in overrides.items() if k in model_keys}
        o = {k: v for k, v in overrides.items() if k in optim_keys}
        t = {k: v for k, v in overrides.items()
             if k not in model_keys and k not in optim_keys}
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, **m) if m else cfg.model,
            optim=dataclasses.replace(cfg.optim, **o) if o else cfg.optim,
            **t)
    return cfg
