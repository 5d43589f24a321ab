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


# every reference config file (projects/FusionOcc/configs/, 25 files)
# -> its named preset; mapping table in PARITY.md
REFERENCE_FILE_TO_PRESET = {
    'fusion_occ.py': 'fusion_occ',
    'fusion_occ_occ3d_miou_ori_setting.py': 'fusion_occ_miou_ori_setting',
    'fusion_occ_occ3d_miou_unified.py': 'fusion_occ_unified',
    'fusion_occ_occ3d_miou_unified_calib_eval.py': 'fusion_occ_calib_eval',
    'fusion_occ_occ3d_miou_unified_calib_eval_before.py':
        'fusion_occ_calib_eval_before',
    'fusion_occ_occ3d_miou_unified_calib_train.py': 'fusion_occ_calib_train',
    'fusion_occ_occ3d_miou_unified_condition_C.py': 'fusion_occ_condition_C',
    'fusion_occ_occ3d_miou_unified_condition_C_20m.py':
        'fusion_occ_condition_C_20m',
    'fusion_occ_occ3d_miou_unified_condition_C_full.py':
        'fusion_occ_condition_C_full',
    'fusion_occ_occ3d_miou_unified_condition_D.py': 'fusion_occ_condition_D',
    'fusion_occ_occ3d_miou_unified_condition_D_full.py':
        'fusion_occ_condition_D_full',
    'fusion_occ_occ3d_miou_unified_condition_D_prime.py':
        'fusion_occ_condition_D_prime',
    'fusion_occ_occ3d_miou_unified_wo_DepthSV.py':
        'fusion_occ_unified_wo_depth_sv',
    'fusion_occ_occ3d_miou_unified_wo_DepthSV_rayiou.py':
        'fusion_occ_unified_wo_depth_sv_rayiou',
    'fusion_occ_occ3d_miou_wo_train_cam_mask_ori_setting.py':
        'fusion_occ_wo_mask_ori_setting',
    'fusion_occ_occ3d_miou_wo_train_cam_mask_unified.py':
        'fusion_occ_unified_wo_mask',
    'fusion_occ_occ3d_miou_wo_train_cam_mask_unified_calib_eval.py':
        'fusion_occ_wo_mask_calib_eval',
    'fusion_occ_occ3d_miou_wo_train_cam_mask_unified_calib_eval_before.py':
        'fusion_occ_wo_mask_calib_eval_before',
    'fusion_occ_occ3d_miou_wo_train_cam_mask_unified_calib_train.py':
        'fusion_occ_wo_mask_calib_train',
    'fusion_occ_occ3d_miou_wo_train_cam_mask_unified_wo_DepthSV.py':
        'fusion_occ_unified_wo_mask_wo_depth_sv',
    'fusion_occ_occ3d_miou_wo_train_cam_mask_unified_wo_DepthSV_rayiou.py':
        'fusion_occ_unified_wo_mask_wo_depth_sv_rayiou',
    'fusion_occ_occ3d_rayiou_ori_setting.py': 'fusion_occ_rayiou_ori_setting',
    'fusion_occ_occ3d_rayiou_unified.py': 'fusion_occ_unified_rayiou',
    'fusion_occ_occ3d_rayiou_wo_train_cam_mask_ori_setting.py':
        'fusion_occ_wo_mask_rayiou_ori_setting',
    'fusion_occ_occ3d_rayiou_wo_train_cam_mask_unified.py':
        'fusion_occ_unified_wo_mask_rayiou',
}


def test_every_reference_config_file_has_a_preset():
    assert len(REFERENCE_FILE_TO_PRESET) == 25
    for fname, preset in REFERENCE_FILE_TO_PRESET.items():
        assert preset in CONFIGS, f'{fname} -> {preset} missing'
        get_config(preset)


def test_condition_and_wo_mask_matrix_leaves():
    c20 = get_config('fusion_occ_condition_C_20m')
    assert c20.model.mask_mode == 'condition_C'
    assert c20.model.mask_dist_threshold_c == 20.0
    assert c20.optim.accumulate_steps == 8     # unified recipe
    c = get_config('fusion_occ_condition_C')
    assert c.model.mask_dist_threshold_c == 35.0
    # wo_mask calibration chain: unified recipe, no camera mask, fitted T
    ce = get_config('fusion_occ_wo_mask_calib_eval')
    assert ce.model.use_mask is False
    assert ce.model.temperature == 1.8861      # *_calib_eval.py:73
    assert ce.eval.split == 'val_eval'
    ct = get_config('fusion_occ_wo_mask_calib_train')
    assert ct.eval.split == 'val_calib' and ct.model.use_mask is False
    hy = get_config('fusion_occ_wo_mask_ori_setting')
    assert hy.eval.metric == 'hybrid' and hy.model.use_mask is False
