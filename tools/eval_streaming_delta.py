"""Quantify the streaming-cache approximation (VERDICT r4 item 6).

The headline serving mode (`predict_streaming` / `predict_streaming_scan`)
warps the PREVIOUS frame's BEV feature into the current key-ego grid
instead of re-pooling the previous images through the full geometry as the
reference's primary path does
(/root/reference/projects/FusionOcc/fusionocc/fusion_occ.py:289-316).
This tool measures the cost of that approximation on a multi-scene
synthetic val set with realistic ego motion (0.5 m/frame, the synthetic
rig's trajectory), treating the two-pass prediction as the reference
label set:

  - per-frame voxel agreement (streaming argmax == two-pass argmax),
    frames 2..T tracking whether cache error compounds;
  - "divergence mIoU": mIoU of streaming predictions against
    two-pass-as-GT through the real evaluator (eval/metrics.py);
  - per-class agreement for the classes present;
  - mean |logit delta| / mean |logit|.

Synthetic GT is random, so mIoU-vs-GT deltas are noise by construction;
mode-vs-mode divergence is the meaningful, measurable bound.  Runs on CPU
with the tiny config (~2 min); results printed + written to
results/round5_streaming_delta.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp  # noqa: F401

    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.eval.metrics import confusion_matrix, miou_from_hist
    from fusionocc_tpu.models.fusion_occ import FusionOcc

    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    n_scenes, n_frames = 3, 4
    ncls = cfg.num_classes

    b0 = synthetic_batch(cfg, 1, 0, num_points=512)
    variables = jax.jit(lambda bb: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        bb, train=False))(b0)
    # untrained weights collapse the argmax to one class (agreement is
    # then trivially 1.0) — perturb the params so the head produces a
    # varied class map and the mode-vs-mode divergence is non-degenerate
    rngs = np.random.RandomState(7)
    variables = dict(variables)
    variables['params'] = jax.tree.map(
        lambda v: v + (0.3 * float(np.std(np.asarray(v)) or 1.0) + 0.05)
        * rngs.randn(*v.shape).astype(np.float32),
        variables['params'])

    full_fn = jax.jit(lambda v, bb: model.apply(
        v, bb, train=False)['occ_logits'])
    step_fn = jax.jit(lambda v, bb, s: model.apply(
        v, bb, s, method=FusionOcc.predict_streaming))

    hist = np.zeros((ncls, ncls), np.float64)
    per_frame_agree = [[] for _ in range(n_frames)]
    mae_num = mae_den = 0.0
    for scene in range(n_scenes):
        state = model.apply(variables, 1,
                            method=FusionOcc.init_streaming_state)
        prev = None
        for t in range(n_frames):
            seed = scene * 100 + t
            b = synthetic_batch(cfg, 1, seed, num_points=512)
            if prev is not None:
                # frame t's adjacent images ARE frame t-1's key images
                # (the synthetic ego advances +0.5 m/frame and the adj
                # pose chain already encodes -0.5 m)
                b = b._replace(imgs=np.concatenate(
                    [b.imgs[:, :1], prev.imgs[:, :1]], axis=1))
            full = np.asarray(full_fn(variables, b))
            _, out_s, state = step_fn(variables, b, state)
            stream = np.asarray(out_s['occ_logits'])
            pf = full.argmax(-1)
            ps = stream.argmax(-1)
            per_frame_agree[t].append(float((pf == ps).mean()))
            if t > 0:   # frames where the cache path actually differs
                m = np.ones(pf.shape, bool)
                hist += np.asarray(confusion_matrix(
                    jnp.asarray(ps), jnp.asarray(pf), jnp.asarray(m), ncls))
                mae_num += float(np.abs(stream - full).sum())
                mae_den += float(np.abs(full).sum())
            prev = b
            print(f'scene {scene} frame {t}: agree='
                  f'{per_frame_agree[t][-1]:.4f}', flush=True)

    res = miou_from_hist(hist)
    agree_by_frame = [float(np.mean(a)) for a in per_frame_agree]
    out = {
        'agree_by_frame': agree_by_frame,
        'divergence_miou': res.pop('mIoU'),
        'per_class_iou_vs_twopass': res,
        'rel_logit_mae': mae_num / max(mae_den, 1e-9),
        'n_scenes': n_scenes, 'n_frames': n_frames,
        'config': 'tiny', 'note':
            'two-pass prediction used as the reference label set; '
            'frames 1.. only (frame 0 has no cache)',
    }
    print(json.dumps(out, indent=2, default=float))
    os.makedirs('results', exist_ok=True)
    with open('results/round5_streaming_delta.json', 'w') as f:
        json.dump(out, f, indent=2, default=float)


if __name__ == '__main__':
    main()
