"""Filter an infos pkl by nuScenes scene description (rain, night, ...).

Devkit-free analog of the reference's
tools/filter_samples_by_scene_description.py (which imports the nuscenes
devkit): reads {data_root}/{version}/scene.json directly, keeps samples
whose scene description contains the query substring (case-insensitive),
and writes a filtered pkl usable by tools/test.py / compute_metrics.py —
the standard way to evaluate condition-sliced subsets (rain/night).

Usage:
    python tools/filter_samples.py --input-pkl infos_val.pkl \
        --data-root data/nuscenes --query rain --output infos_val_rain.pkl
        [--version v1.0-trainval] [--invert]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input-pkl', required=True)
    ap.add_argument('--data-root', required=True)
    ap.add_argument('--version', default='v1.0-trainval')
    ap.add_argument('--query', required=True,
                    help='substring matched against the scene description, '
                         'case-insensitive (e.g. "rain", "night")')
    ap.add_argument('--output', required=True)
    ap.add_argument('--invert', action='store_true',
                    help='keep samples NOT matching the query')
    args = ap.parse_args()

    with open(os.path.join(args.data_root, args.version,
                           'scene.json')) as f:
        scenes = {s['token']: s.get('description', '')
                  for s in json.load(f)}

    with open(args.input_pkl, 'rb') as f:
        data = pickle.load(f)
    key = 'data_list' if 'data_list' in data else 'infos'
    infos = data[key]

    q = args.query.lower()

    def match(info):
        return q in scenes.get(info.get('scene_token', ''), '').lower()

    kept = [i for i in infos if match(i) != args.invert]
    out = dict(data)
    out[key] = kept
    with open(args.output, 'wb') as f:
        pickle.dump(out, f)
    print(f'{len(kept)}/{len(infos)} samples '
          f'({"NOT " if args.invert else ""}matching "{args.query}") '
          f'-> {args.output}')


if __name__ == '__main__':
    main()
