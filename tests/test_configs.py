"""Config preset registry: every variant constructs and carries the right
leaf overrides (the reference's 26-config ablation surface)."""
import pytest

from fusionocc_tpu.configs import CONFIGS, get_config


def test_all_presets_construct():
    for name in CONFIGS:
        cfg = get_config(name)
        assert cfg.model.num_classes == 18
        assert cfg.model.fusion_channels == (
            cfg.model.img_channels * cfg.model.num_frame
            + cfg.model.lidar_out_channels)


def test_variant_leaves():
    assert get_config('fusion_occ').optim.lr == 5e-5
    u = get_config('fusion_occ_unified').optim
    assert (u.lr, u.clip_norm, u.accumulate_steps, u.backbone_lr_mult) == \
        (2e-4, 35.0, 8, 0.1)
    assert get_config('fusion_occ_wo_mask').model.use_mask is False
    assert get_config('fusion_occ_wo_depth_sv').model.depth_loss_weight == 0.0
    assert get_config('fusion_occ_condition_D').model.mask_mode == \
        'condition_D'
    assert get_config('fusion_occ_image_only').model.use_lidar is False


def test_eval_variant_leaves():
    """RayIoU + calibration variants (reference configs/ rayiou/calib files):
    the eval PROTOCOL is part of the preset, not just a CLI flag."""
    r = get_config('fusion_occ_unified_rayiou')
    assert r.eval.metric == 'rayiou'
    assert r.eval.use_image_mask is False     # ray casting handles visibility
    assert r.model.use_mask is True           # training keeps the camera mask
    assert r.optim.accumulate_steps == 8      # built on the unified recipe
    wm = get_config('fusion_occ_wo_mask_rayiou')
    assert wm.model.use_mask is False and wm.eval.metric == 'rayiou'
    ct = get_config('fusion_occ_calib_train')
    assert ct.eval.split == 'val_calib' and ct.model.temperature == 1.0
    ce = get_config('fusion_occ_calib_eval')
    assert ce.eval.split == 'val_eval'
    assert abs(ce.model.temperature - 1.5221) < 1e-9
    cb = get_config('fusion_occ_calib_eval_before')
    assert cb.eval.split == 'val_eval' and cb.model.temperature == 1.0
    # the default protocol is masked mIoU on val
    b = get_config('fusion_occ')
    assert (b.eval.metric, b.eval.use_image_mask, b.eval.split) == \
        ('miou', True, 'val')


def test_overrides():
    cfg = get_config('fusion_occ', lr=1e-4, num_adj=1, batch_size=2)
    assert cfg.optim.lr == 1e-4
    assert cfg.batch_size == 2
    with pytest.raises(KeyError):
        get_config('nope')
