"""Offline data preparation: build info pkls from raw nuScenes tables.

Devkit-free equivalent of the reference's tools/create_data_fusionocc.py +
tools/data_converter/nuscenes_converter.py: reads the nuScenes JSON tables
directly (sample, sample_data, calibrated_sensor, ego_pose, sensor, scene),
assembles per-key-frame info dicts (poses as quaternion+translation, camera
paths/intrinsics, occ GT path), splits train/val by scene, and pickles
{'data_list': [...]} sorted for the NuScenesOccDataset.

Usage:
  python tools/create_data.py --root data/nuscenes --version v1.0-trainval \
      --out-dir data/nuscenes
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAMS = ['CAM_FRONT_LEFT', 'CAM_FRONT', 'CAM_FRONT_RIGHT',
        'CAM_BACK_LEFT', 'CAM_BACK', 'CAM_BACK_RIGHT']

# official nuScenes trainval scene split (subset check by name prefix is not
# enough; the canonical split ships with the devkit. We accept an explicit
# split file, else fall back to modulo split for mini/testing.)


def load_table(root: str, version: str, name: str):
    with open(os.path.join(root, version, f'{name}.json')) as f:
        rows = json.load(f)
    return {r['token']: r for r in rows}


def build_infos(root: str, version: str, val_scene_names=None):
    tables = {n: load_table(root, version, n) for n in
              ('sample', 'sample_data', 'calibrated_sensor', 'ego_pose',
               'sensor', 'scene')}
    samples, sample_data = tables['sample'], tables['sample_data']
    calib, ego_pose = tables['calibrated_sensor'], tables['ego_pose']
    sensors, scenes = tables['sensor'], tables['scene']

    # key-frame sample_data by (sample, channel)
    by_sample = {}
    for sd in sample_data.values():
        if not sd['is_key_frame']:
            continue
        ch = sensors[calib[sd['calibrated_sensor_token']]['sensor_token']][
            'channel']
        by_sample.setdefault(sd['sample_token'], {})[ch] = sd

    train, val = [], []
    for stoken, sample in samples.items():
        scene = scenes[sample['scene_token']]
        frames = by_sample.get(stoken, {})
        if 'LIDAR_TOP' not in frames:
            continue
        lsd = frames['LIDAR_TOP']
        lcal = calib[lsd['calibrated_sensor_token']]
        lpose = ego_pose[lsd['ego_pose_token']]
        info = {
            'token': stoken,
            'scene_token': sample['scene_token'],
            'scene_name': scene['name'],
            'timestamp': sample['timestamp'],
            'lidar_path': os.path.join(root, lsd['filename']),
            'lidar2ego_rotation': lcal['rotation'],
            'lidar2ego_translation': lcal['translation'],
            'ego2global_rotation': lpose['rotation'],
            'ego2global_translation': lpose['translation'],
            'occ_path': os.path.join(root, 'gts', scene['name'], stoken),
            'cams': {},
        }
        ok = True
        for cam in CAMS:
            if cam not in frames:
                ok = False
                break
            csd = frames[cam]
            ccal = calib[csd['calibrated_sensor_token']]
            cpose = ego_pose[csd['ego_pose_token']]
            info['cams'][cam] = {
                'data_path': os.path.join(root, csd['filename']),
                'sample_data_token': csd['token'],
                'sensor2ego_rotation': ccal['rotation'],
                'sensor2ego_translation': ccal['translation'],
                'ego2global_rotation': cpose['rotation'],
                'ego2global_translation': cpose['translation'],
                'cam_intrinsic': ccal['camera_intrinsic'],
                'timestamp': csd['timestamp'],
            }
        if not ok:
            continue
        is_val = (val_scene_names is not None
                  and scene['name'] in val_scene_names)
        (val if is_val else train).append(info)

    for lst in (train, val):
        lst.sort(key=lambda e: e['timestamp'])
    return train, val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--version', default='v1.0-trainval')
    ap.add_argument('--out-dir', default=None)
    ap.add_argument('--val-scenes', default=None,
                    help='text file with one val scene name per line')
    args = ap.parse_args()

    val_names = None
    if args.val_scenes:
        with open(args.val_scenes) as f:
            val_names = {line.strip() for line in f if line.strip()}

    train, val = build_infos(args.root, args.version, val_names)
    out = args.out_dir or args.root
    os.makedirs(out, exist_ok=True)
    for split, data in (('train', train), ('val', val)):
        if not data:
            continue
        path = os.path.join(out, f'fusionocc-nuscenes_infos_{split}.pkl')
        with open(path, 'wb') as f:
            pickle.dump({'data_list': data}, f)
        print(f'{split}: {len(data)} samples -> {path}')


if __name__ == '__main__':
    main()
