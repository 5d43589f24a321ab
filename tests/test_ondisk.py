"""On-disk dataset integration: raw nuScenes tables -> tools/create_data.py
-> infos pkl -> NuScenesOccDataset file-reading path -> tools/test.py eval,
with NO --synthetic shortcut anywhere.

This pins the create_data output schema against the dataset's expectations
(reference chain: tools/create_data_fusionocc.py ->
fusionocc/datasets/fusionocc_dataset.py:137-478): JPEG decode + aug, seg
.npy maps, labels.npz occupancy GT, lidar .bin sweeps, pose quaternions.
"""
import json
import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CAMS = ['CAM_FRONT_LEFT', 'CAM_FRONT', 'CAM_FRONT_RIGHT',
        'CAM_BACK_LEFT', 'CAM_BACK', 'CAM_BACK_RIGHT']

RAW_HW = (96, 160)        # raw camera size (downscaled nuScenes 900x1600)
OCC_SHAPE = (20, 20, 4)   # tiny_model_config grid
N_SAMPLES = 3


def _quat_yaw(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _quat_cam(yaw):
    """Camera sensor2ego rotation: yaw about ego z COMPOSED WITH the
    optical-to-forward rotation (camera +z -> ego forward, +x -> right,
    +y -> down), as in real nuScenes calibrated_sensor records.  Without
    the composition the cameras stare straight up and no frustum point
    lands inside the occupancy grid."""
    cz, sz = np.cos(yaw), np.sin(yaw)
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1.0]])
    r0 = np.array([[0, 0, 1.0], [-1.0, 0, 0], [0, -1.0, 0]])  # optical->fwd
    m = rz @ r0
    # matrix -> quaternion [w, x, y, z] (Shepperd, w-branch is safe here:
    # trace(m) = trace(rz @ r0) >= -1 + 2*cos(yaw) > -1 for |yaw| < pi)
    w = np.sqrt(max(0.0, 1.0 + m[0, 0] + m[1, 1] + m[2, 2])) / 2
    if w > 1e-6:
        x = (m[2, 1] - m[1, 2]) / (4 * w)
        y = (m[0, 2] - m[2, 0]) / (4 * w)
        z = (m[1, 0] - m[0, 1]) / (4 * w)
    else:  # yaw ~= pi: fall back to the largest diagonal branch
        x = np.sqrt(max(0.0, 1 + m[0, 0] - m[1, 1] - m[2, 2])) / 2
        y = (m[0, 1] + m[1, 0]) / (4 * x)
        z = (m[0, 2] + m[2, 0]) / (4 * x)
        w = (m[2, 1] - m[1, 2]) / (4 * x)
    return [float(w), float(x), float(y), float(z)]


def make_fake_raw_tree(root: str, version: str = 'v1.0-mini',
                       seed: int = 0) -> None:
    """Write RAW nuScenes tables + sample files (the create_data INPUT):
    json tables under <root>/<version>/, JPEGs + .bin under samples/,
    labels.npz under gts/<scene>/<token>/, seg .npy under img_seg/."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    H, W = RAW_HW
    os.makedirs(os.path.join(root, version), exist_ok=True)

    scene = {'token': 'sc0', 'name': 'scene-0001',
             'first_sample_token': 'tok0', 'last_sample_token': 'tok2'}
    sensors, calibs, poses, samples, sample_datas = [], [], [], [], []

    channels = CAMS + ['LIDAR_TOP']
    for ch in channels:
        sensors.append({'token': f'sensor_{ch}', 'channel': ch,
                        'modality': 'lidar' if ch == 'LIDAR_TOP'
                        else 'camera'})

    yy, xx = np.mgrid[0:H, 0:W]
    base = np.stack([(xx * 255 / W), (yy * 255 / H), ((xx + yy) % 256)],
                    -1).astype(np.float32)

    for i in range(N_SAMPLES):
        stoken = f'tok{i}'
        samples.append({'token': stoken, 'scene_token': 'sc0',
                        'timestamp': 1000000 + i * 500000})
        for n, ch in enumerate(channels):
            is_lidar = ch == 'LIDAR_TOP'
            ctoken = f'calib_{ch}_{i}'
            ptoken = f'pose_{ch}_{i}'
            dtoken = f'sd_{ch}_{i}'
            yaw = 2 * np.pi * n / len(CAMS) if not is_lidar else 0.0
            calibs.append({
                'token': ctoken, 'sensor_token': f'sensor_{ch}',
                'rotation': _quat_yaw(yaw) if is_lidar else _quat_cam(yaw),
                'translation': [0.9, 0.0, 1.8] if is_lidar
                else [1.0, 0.0, 1.5],
                'camera_intrinsic': [] if is_lidar else
                [[126.6, 0, 80.0], [0, 126.6, 48.0], [0, 0, 1]],
            })
            poses.append({'token': ptoken, 'rotation': [1, 0, 0, 0],
                          'translation': [i * 2.0, 0.0, 0.0],
                          'timestamp': 1000000 + i * 500000})
            if is_lidar:
                fname = os.path.join('samples', ch, f'{i:04d}.bin')
                path = os.path.join(root, fname)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                pts = rng.randn(4000, 5).astype(np.float32)
                pts[:, :2] *= 4.0
                pts[:, 2] = pts[:, 2] * 0.5 + 0.5
                pts[:, 4] = rng.randint(0, 32, 4000)
                pts.tofile(path)
            else:
                fname = os.path.join('samples', ch, f'{i:04d}.jpg')
                path = os.path.join(root, fname)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                img = base + rng.randn(8, 8, 3).repeat(H // 8, 0).repeat(
                    W // 8, 1) * 40
                Image.fromarray(
                    np.clip(img, 0, 255).astype(np.uint8)).save(
                        path, quality=90)
                # 1/8-res seg label map (gen_seg_depth.py output schema:
                # mirrors the samples/ subtree under img_seg_dir)
                seg = rng.randint(0, 18, (H // 8, W // 8)).astype(np.uint8)
                seg_path = os.path.join(root, 'img_seg', ch,
                                        f'{i:04d}.npy')
                os.makedirs(os.path.dirname(seg_path), exist_ok=True)
                np.save(seg_path, seg)
            sample_datas.append({
                'token': dtoken, 'sample_token': stoken,
                'calibrated_sensor_token': ctoken,
                'ego_pose_token': ptoken, 'filename': fname,
                'is_key_frame': True,
                'timestamp': 1000000 + i * 500000,
            })
        # occupancy GT where create_data points occ_path
        occ_dir = os.path.join(root, 'gts', scene['name'], stoken)
        os.makedirs(occ_dir, exist_ok=True)
        np.savez(os.path.join(occ_dir, 'labels.npz'),
                 semantics=rng.randint(0, 18, OCC_SHAPE).astype(np.uint8),
                 mask_camera=(rng.rand(*OCC_SHAPE) > 0.3).astype(np.uint8),
                 mask_lidar=(rng.rand(*OCC_SHAPE) > 0.3).astype(np.uint8))

    # a non-key-frame row must be ignored by create_data
    sample_datas.append({
        'token': 'sd_skip', 'sample_token': 'tok0',
        'calibrated_sensor_token': 'calib_LIDAR_TOP_0',
        'ego_pose_token': 'pose_LIDAR_TOP_0',
        'filename': 'samples/LIDAR_TOP/0000.bin', 'is_key_frame': False,
        'timestamp': 999999,
    })

    tables = {'scene': [scene], 'sensor': sensors,
              'calibrated_sensor': calibs, 'ego_pose': poses,
              'sample': samples, 'sample_data': sample_datas}
    for name, rows in tables.items():
        with open(os.path.join(root, version, f'{name}.json'), 'w') as f:
            json.dump(rows, f)


@pytest.fixture(scope='module')
def raw_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('nusc'))
    make_fake_raw_tree(root)
    return root


def test_create_data_schema_feeds_dataset(raw_tree):
    """create_data.build_infos output must load through the REAL
    NuScenesOccDataset file-reading path (JPEG/bin/npz/npy decode)."""
    from tools.create_data import build_infos
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.dataset import NuScenesOccDataset

    train, val = build_infos(raw_tree, 'v1.0-mini', None)
    assert len(train) == N_SAMPLES and not val
    # split routing by scene name
    t2, v2 = build_infos(raw_tree, 'v1.0-mini', {'scene-0001'})
    assert len(v2) == N_SAMPLES and not t2
    # timestamps sorted, all cameras present, absolute paths resolvable
    ts = [e['timestamp'] for e in train]
    assert ts == sorted(ts)
    for e in train:
        assert set(e['cams']) == set(CAMS)
        assert os.path.exists(e['lidar_path'])
        assert os.path.exists(os.path.join(e['occ_path'], 'labels.npz'))

    ann = os.path.join(raw_tree, 'fusionocc-nuscenes_infos_train.pkl')
    with open(ann, 'wb') as f:
        pickle.dump({'data_list': train}, f)

    cfg = tiny_model_config()
    ds = NuScenesOccDataset(ann, cfg, data_root='',
                            img_seg_dir=os.path.join(raw_tree, 'img_seg'),
                            train=True)
    assert len(ds) == N_SAMPLES
    s = ds[1]
    F, N = cfg.num_frame, 6
    H, W = cfg.input_size
    assert s['imgs'].shape == (F, N, H, W, 3)
    assert s['segs'].shape == (N, H, W)
    assert s['segs'].max() < 18
    assert s['voxel_semantics'].shape == OCC_SHAPE
    assert s['points'].shape == (cfg.lidar.point_capacity, 5)
    assert s['points_mask'].any()
    assert s['sparse_depth'].shape == (N, H, W)
    assert np.isfinite(s['sensor2keyego']).all()
    # temporal adjacency: frame 1 of sample 1 is sample 0's ego pose,
    # so sensor2keyego differs between the two frames
    assert not np.allclose(s['sensor2keyego'][0], s['sensor2keyego'][1])


def test_tools_test_runs_on_disk_tree(raw_tree, capsys, monkeypatch):
    """tools/test.py end-to-end WITHOUT --synthetic: real file reads,
    data_loader batching, jitted predict, metric computation."""
    from tools.create_data import build_infos
    import tools.test as tt

    train, _ = build_infos(raw_tree, 'v1.0-mini', None)
    ann = os.path.join(raw_tree, 'fusionocc-nuscenes_infos_val.pkl')
    with open(ann, 'wb') as f:
        pickle.dump({'data_list': train}, f)

    monkeypatch.setattr(sys, 'argv', [
        'test.py', '--ann-file', ann, '--tiny', '--max-samples', '2',
        '--warmup', '0',
        '--img-seg-dir', os.path.join(raw_tree, 'img_seg')])
    tt.main()
    out = capsys.readouterr().out.strip().splitlines()
    res = json.loads(out[-1])
    assert res['samples'] == 2
    assert np.isfinite(res['mIoU'])
    assert res['fps'] > 0
    assert np.isfinite(res['latency_mean_ms'])
