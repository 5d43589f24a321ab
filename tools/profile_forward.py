"""Stage-wise latency bisection of the full-size forward on the real chip.

Times each sub-graph with a hard barrier (full-output fetch) — the only
reliable timing on the tunnel backend, where block_until_ready can return
before device work completes.  Used to locate the dominant cost of the
end-to-end step (see BENCH.md round-2 notes).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, n=3):
    """Barrier-fetch timing via the shared helper
    (fusionocc_tpu/utils/timing.py): a jitted scalar reduction of the first
    output leaf + 4-byte fetch after each call."""
    from fusionocc_tpu.utils.timing import best_call_seconds, scalar_barrier
    out = fn(*args)                      # compile + warm
    scalar_barrier(out)
    dt = best_call_seconds(fn, *args, n=n, warm=False)
    print(f'{name:38s} {dt * 1e3:9.1f} ms', flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update('jax_compilation_cache_dir', '/tmp/fusionocc_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from fusionocc_tpu.config import full_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.models.fusion_occ import (FusionOcc,
                                                 frame_pooling_index)

    cfg = full_model_config()
    model = FusionOcc(cfg)
    b = jax.device_put(synthetic_batch(cfg, batch_size=1, seed=0))
    variables = jax.jit(lambda bb: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        bb, train=False))(b)

    # --- pooling index (the in-graph rank sort) ---------------------------
    pool_fn = jax.jit(lambda bb: frame_pooling_index(
        cfg, bb.sensor2keyego[:, 0], bb.intrins[:, 0], bb.post_rots[:, 0],
        bb.post_trans[:, 0], bb.bda))
    pool_idx = timed('frame_pooling_index (rank sort)', pool_fn, b)

    # --- lidar branch ------------------------------------------------------
    lidar_fn = jax.jit(lambda v, bb: model.apply(
        v, bb, False, method=FusionOcc._lidar_feat))
    lidar_feat = timed('lidar branch (voxelize+spconv)', lidar_fn, variables, b)

    # --- camera branch: swin+neck only ------------------------------------
    enc_fn = jax.jit(lambda v, imgs: model.apply(
        v, imgs, False, method=FusionOcc.image_encoder))
    feat2d = timed('image encoder 6-img (swin+fpn)', enc_fn, variables,
                   b.imgs[:, 0])

    # --- camera branch: one whole frame (encoder+VT+pool+preproc) ---------
    def frame_fn(v, bb, pi):
        return model.apply(
            v, bb.imgs[:, 0], bb.sensor2keyego[:, 0], bb.sensor2keyego[:, 0],
            bb.intrins[:, 0], bb.post_rots[:, 0], bb.post_trans[:, 0],
            bb.bda, bb.sparse_depth, False, pi,
            method=FusionOcc._frame_voxel_feat)
    frame_jit = jax.jit(frame_fn)
    voxel = timed('camera frame (enc+VT+pool+pre)', frame_jit, variables,
                  b, pool_idx)

    # --- full predict ------------------------------------------------------
    pool_idxs = (pool_idx,) + (None,) * (cfg.num_frame - 1)
    pred_fn = jax.jit(lambda v, bb, pi: model.apply(
        v, bb, pool_idxs=pi, method=FusionOcc.predict))
    timed('full two-pass predict', pred_fn, variables, b, pool_idxs)

    pred_bf = jax.jit(lambda v, bb: model.apply(
        v, bb, batch_frames=True, method=FusionOcc.predict))
    timed('full two-pass predict (batched)', pred_bf, variables, b)


if __name__ == '__main__':
    main()
