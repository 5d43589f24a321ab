"""Tool-level round trips: metric logger + analyze, offline scorer with a
fake dataset tree, export round trip (tiny)."""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_metric_logger_and_load(tmp_path):
    from fusionocc_tpu.utils.logging import MetricLogger, load_scalars
    log = MetricLogger(str(tmp_path), use_tensorboard=False)
    for i in range(3):
        log.log(i + 1, {'loss': 3.0 - i, 'sec_per_iter': 0.5})
    log.close()
    recs = load_scalars(str(tmp_path))
    assert len(recs) == 3
    assert recs[-1]['train/loss'] == 1.0


def test_offline_scorer_round_trip(tmp_path):
    """Fake GT tree + perfect predictions -> mIoU 100 for present classes."""
    rng = np.random.RandomState(0)
    n = 2
    infos = []
    pred_dir = tmp_path / 'preds'
    pred_dir.mkdir()
    for i in range(n):
        scene = f'scene-{i:04d}'
        token = f'tok{i}'
        gt_dir = tmp_path / 'gts' / scene / token
        gt_dir.mkdir(parents=True)
        sem = rng.randint(0, 18, (20, 20, 4)).astype(np.uint8)
        mask = rng.rand(20, 20, 4) > 0.3
        np.savez(gt_dir / 'labels.npz', semantics=sem,
                 mask_camera=mask.astype(np.uint8),
                 mask_lidar=mask.astype(np.uint8))
        np.savez_compressed(pred_dir / f'pred_{i:06d}.npz', occ_pred=sem)
        infos.append({'token': token, 'timestamp': i,
                      'occ_path': str(gt_dir),
                      'lidar_path': 'unused.bin'})
    ann = tmp_path / 'infos_val.pkl'
    with open(ann, 'wb') as f:
        pickle.dump({'data_list': infos}, f)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'compute_metrics.py'),
         '--pred-dir', str(pred_dir), '--ann-file', str(ann)],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res['mIoU'] == 100.0
    assert res['samples'] == n


def test_create_data_from_fake_tables(tmp_path):
    """tools/create_data.py over a minimal synthetic nuScenes table set."""
    version = 'v1.0-mini'
    vdir = tmp_path / version
    vdir.mkdir()
    cams = ['CAM_FRONT_LEFT', 'CAM_FRONT', 'CAM_FRONT_RIGHT',
            'CAM_BACK_LEFT', 'CAM_BACK', 'CAM_BACK_RIGHT']
    sensors = [{'token': f's_{c}', 'channel': c, 'modality': 'camera'}
               for c in cams] + [{'token': 's_LIDAR_TOP',
                                  'channel': 'LIDAR_TOP',
                                  'modality': 'lidar'}]
    calib, poses, sdata, samples = [], [], [], []
    scenes = [{'token': 'sc0', 'name': 'scene-0001'}]
    for i in range(2):
        stoken = f'sample{i}'
        samples.append({'token': stoken, 'scene_token': 'sc0',
                        'timestamp': 1000 + i})
        for s in sensors:
            ch = s['channel']
            ct = f'c_{ch}_{i}'
            pt = f'p_{ch}_{i}'
            calib.append({'token': ct, 'sensor_token': s['token'],
                          'rotation': [1, 0, 0, 0],
                          'translation': [0, 0, 1.5],
                          'camera_intrinsic':
                              [[800, 0, 800], [0, 800, 450], [0, 0, 1]]
                              if ch != 'LIDAR_TOP' else []})
            poses.append({'token': pt, 'rotation': [1, 0, 0, 0],
                          'translation': [i * 1.0, 0, 0],
                          'timestamp': 1000 + i})
            ext = 'jpg' if ch != 'LIDAR_TOP' else 'bin'
            sdata.append({'token': f'sd_{ch}_{i}', 'sample_token': stoken,
                          'calibrated_sensor_token': ct,
                          'ego_pose_token': pt, 'is_key_frame': True,
                          'filename': f'samples/{ch}/{i}.{ext}',
                          'timestamp': 1000 + i})
    for name, rows in (('sample', samples), ('sample_data', sdata),
                       ('calibrated_sensor', calib), ('ego_pose', poses),
                       ('sensor', sensors), ('scene', scenes)):
        with open(vdir / f'{name}.json', 'w') as f:
            json.dump(rows, f)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'create_data.py'),
         '--root', str(tmp_path), '--version', version],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    with open(tmp_path / 'fusionocc-nuscenes_infos_train.pkl', 'rb') as f:
        data = pickle.load(f)
    assert len(data['data_list']) == 2
    info = data['data_list'][0]
    assert set(info['cams']) == set(cams)
    assert info['lidar2ego_translation'] == [0, 0, 1.5]


def test_burnin_tool_smoke(tmp_path):
    """Burn-in tool: finite losses, checkpoint mid-run, bit-exact resume
    replay (unified recipe: accum + backbone lr_mult)."""
    import importlib.util
    import sys
    spec = importlib.util.spec_from_file_location(
        'burnin', os.path.join(os.path.dirname(__file__), '..', 'tools',
                               'burnin.py'))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    argv = sys.argv
    sys.argv = ['burnin.py', '--tiny', '--steps', '4', '--accum', '2',
                '--ckpt-at', '2', '--num-batches', '2',
                '--out', str(tmp_path)]
    try:
        m.main()
    finally:
        sys.argv = argv
    assert (tmp_path / 'loss_curve.jsonl').exists()


def test_analyze_occ_gt_and_filter_samples(tmp_path):
    """GT statistics + scene-description filtering on a fake dataset tree."""
    rng = np.random.RandomState(2)
    infos = []
    for i in range(3):
        token = f'tok{i}'
        gt_dir = tmp_path / 'gts' / f'scene-{i:04d}' / token
        gt_dir.mkdir(parents=True)
        sem = rng.randint(0, 18, (20, 20, 4)).astype(np.uint8)
        mask = rng.rand(20, 20, 4) > 0.3
        np.savez(gt_dir / 'labels.npz', semantics=sem,
                 mask_camera=mask.astype(np.uint8),
                 mask_lidar=mask.astype(np.uint8))
        infos.append({'token': token, 'timestamp': i,
                      'occ_path': str(gt_dir),
                      'scene_token': f'sc{i}'})
    ann = tmp_path / 'infos_val.pkl'
    with open(ann, 'wb') as f:
        pickle.dump({'data_list': infos}, f)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'analyze_occ_gt.py'),
         '--ann-file', str(ann)],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'camera-mask coverage' in out.stdout
    assert 'driveable_surface' in out.stdout

    # scene.json with descriptions; filter by 'rain'
    ver = tmp_path / 'v1.0-trainval'
    ver.mkdir()
    with open(ver / 'scene.json', 'w') as f:
        json.dump([{'token': 'sc0', 'description': 'Sunny day'},
                   {'token': 'sc1', 'description': 'Heavy RAIN at night'},
                   {'token': 'sc2', 'description': 'rainy intersection'}], f)
    outp = tmp_path / 'filtered.pkl'
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'filter_samples.py'),
         '--input-pkl', str(ann), '--data-root', str(tmp_path),
         '--query', 'rain', '--output', str(outp)],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
    assert out.returncode == 0, out.stderr[-2000:]
    with open(outp, 'rb') as f:
        kept = pickle.load(f)['data_list']
    assert [k['token'] for k in kept] == ['tok1', 'tok2']
