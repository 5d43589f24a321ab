"""FusionOcc: multi-modal temporal 3D semantic occupancy model (flax).

TPU-native re-design of the reference detector
(projects/FusionOcc/fusionocc/fusion_occ.py:431-920):

  camera branch (per temporal frame, adjacent frames under stop_gradient):
    Swin-Base -> FPN_LSS -> CrossModalLSS lift-splat -> pre_process ResNet3D
  LiDAR branch:
    voxelize -> sparse encoder -> dense voxel volume
  fusion: channel concat [adj frames ..., key frame, lidar]
    -> CustomResNet3D (3 scales) -> LSSFPN3D -> final conv -> MLP predicter
    -> (B, X, Y, Z, num_classes) occupancy logits.

Notes vs the reference:
  - The pose chain (sensor2keyego) is computed host-side in float64
    (data pipeline); the model consumes prepared per-frame poses.
  - `align_after_view_transformation` is effectively False in the reference
    (FusionOCC.__init__ overrides it, fusion_occ.py:509): every frame is
    pooled directly into the key-ego voxel grid with its own pose, which is
    also the fully-static-shape-friendly formulation — so that is the
    primary path here.  A grid_sample shift path exists in ops for parity.
  - All voxel tensors are channels-last (B, Z, Y, X, C).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..geometry import frustum_to_ego, get_mlp_input, make_frustum
from ..ops.bev_pool import prepare_pooling_index
from .fpn import FPN_LSS, LSSFPN3D, CustomResNet3D
from .lidar_encoder import SparseEncoder
from .lss import CrossModalLSS
from ..nn.swin import SwinTransformer

Dtype = Any


class Batch(NamedTuple):
    """One training/eval batch. F = num_frame (key + adjacent), N = cams."""
    imgs: jnp.ndarray            # (B, F, N, H, W, 3) normalized images
    sensor2keyego: jnp.ndarray   # (B, F, N, 4, 4) float32
    intrins: jnp.ndarray         # (B, F, N, 3, 3)
    post_rots: jnp.ndarray       # (B, F, N, 3, 3)
    post_trans: jnp.ndarray      # (B, F, N, 3)
    bda: jnp.ndarray             # (B, 3, 3)
    points: jnp.ndarray          # (B, P, 5) padded ego-frame points
    points_mask: jnp.ndarray     # (B, P) bool
    sparse_depth: jnp.ndarray    # (B, N, H, W) metres (key frame)
    segs: Optional[jnp.ndarray] = None             # (B, N, H, W) int32
    voxel_semantics: Optional[jnp.ndarray] = None  # (B, X, Y, Z) int32
    mask_camera: Optional[jnp.ndarray] = None      # (B, X, Y, Z) bool
    ego2global: Optional[jnp.ndarray] = None       # (B, 4, 4) key ego pose


class StreamingState(NamedTuple):
    """Temporal BEV cache for streaming inference: the previous key frame's
    camera voxel feature (in its own ego frame) + its ego pose."""
    voxel_feat: jnp.ndarray      # (B, Z, Y, X, C_img)
    ego2global: jnp.ndarray      # (B, 4, 4)
    valid: jnp.ndarray           # (B,) bool — False at scene starts


def frame_pooling_index(cfg: ModelConfig, s2k, intrins, post_rots, post_trans,
                        bda) -> 'PoolingIndex':
    """Pooling index for one temporal frame's camera geometry.

    The TPU-native `accelerate` path (view_transformer.py:175-194): at
    inference the camera rig, intrinsics, and (deterministic) image aug are
    fixed, so the frustum->voxel rank sort — the most expensive non-conv op
    in the forward — can be computed ONCE and passed into the jitted step as
    an ordinary input instead of being re-sorted every call.  Callers cache
    the result keyed on the geometry (tools/test.py, bench.py) and must
    recompute when geometry changes (e.g. per-scene intrinsics).
    """
    frustum = make_frustum(cfg.grid.depth, cfg.input_size,
                           cfg.vt.downsample, cfg.vt.sid)
    coor = frustum_to_ego(frustum, s2k, intrins, post_rots, post_trans, bda)
    return prepare_pooling_index(coor, cfg.grid)


def streaming_fold_pooling_index(cfg: ModelConfig, stacked,
                                 chunk: int, cam_chunk: int = 0):
    """Pooling index for predict_streaming_batch's time-fold.

    Folds the first n stacked (T, B, ...) frames into the batch axis —
    n = the CAMERA fold: cam_chunk when the camera encoder is microbatched
    inside the block, else chunk — taking each frame's key temporal-frame
    geometry.  The eval rig is identical across frames, so one folded
    index serves every chunk block.  This fold order must match
    predict_streaming_batch exactly; keep it the single source of truth
    for benches/tools.  Callers jit this and trim the result
    (ops.bev_pool.trim_pooling_index).
    """
    n = cam_chunk if (cam_chunk and cam_chunk < chunk) else chunk

    def fold(a):
        return a[:n].reshape((-1,) + a.shape[2:])

    return frame_pooling_index(
        cfg, fold(stacked.sensor2keyego)[:, 0], fold(stacked.intrins)[:, 0],
        fold(stacked.post_rots)[:, 0], fold(stacked.post_trans)[:, 0],
        fold(stacked.bda))


def batched_frames_pooling_index(cfg: ModelConfig, batch):
    """Pooling index for predict(batch_frames=True)'s (B, F) fold.

    All temporal frames go through ONE camera pass, so the index is built
    on the (B*F)-folded geometry with bda repeated per frame — must match
    _batched_frame_feats' fold order exactly; single source of truth for
    benches/tools.  Callers jit + trim as above.
    """
    def fold(a):
        return a.reshape((-1,) + a.shape[2:])

    return frame_pooling_index(
        cfg, fold(batch.sensor2keyego), fold(batch.intrins),
        fold(batch.post_rots), fold(batch.post_trans),
        jnp.repeat(batch.bda, batch.sensor2keyego.shape[1], axis=0))


class FusionOcc(nn.Module):
    """cfg: model hyper-parameters.  mesh: optional jax Mesh whose 'spatial'
    axis (if present) shards the camera batch and the BEV grid across chips
    (model parallelism on top of data parallelism — sharding constraints are
    inserted at the camera-branch input and the fused volume; XLA partitions
    the convolutions and inserts halo exchanges over ICI)."""
    cfg: ModelConfig
    mesh: Any = None

    def _constrain(self, x, *spec):
        from jax.sharding import PartitionSpec as P
        from ..parallel.mesh import constrain
        return constrain(x, self.mesh, P(*spec))

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        self.img_backbone = SwinTransformer(cfg.swin, dtype=dt)
        self.img_neck = FPN_LSS(cfg.img_neck_out_channels, dtype=dt)
        self.img_view_transformer = CrossModalLSS(cfg.vt, cfg.grid, dtype=dt)
        self.pre_process_net = CustomResNet3D(
            (cfg.img_channels,), (1,), (1,), (0,), dtype=dt)
        self.lidar_encoder = SparseEncoder(cfg.lidar, cfg.grid, dtype=dt)
        self.bev_backbone = CustomResNet3D(
            cfg.bev_channels, cfg.bev_num_layer, cfg.bev_strides,
            (0, 1, 2), dtype=dt)
        self.bev_neck = LSSFPN3D(cfg.occ_channels, dtype=dt)
        self.final_conv = nn.Conv(cfg.occ_channels, (3, 3, 3), use_bias=True,
                                  dtype=dt, param_dtype=jnp.float32)
        self.predicter_fc1 = nn.Dense(cfg.occ_channels * 2, dtype=dt,
                                      param_dtype=jnp.float32)
        self.predicter_fc2 = nn.Dense(cfg.num_classes, dtype=jnp.float32,
                                      param_dtype=jnp.float32)

    def _lidar_feat(self, batch: Batch, train: bool) -> jnp.ndarray:
        """LiDAR voxel feature, or zeros in image-only mode (the reference's
        image-only fallback path, fusion_occ.py:1475-1482)."""
        cfg = self.cfg
        if not cfg.use_lidar:
            gx, gy, gz = cfg.grid.grid_size
            B = batch.imgs.shape[0]
            return jnp.zeros((B, gz, gy, gx, cfg.lidar_out_channels),
                             cfg.dtype)
        return self.lidar_encoder(batch.points, batch.points_mask,
                                  train=train)

    def image_encoder(self, imgs, train: bool):
        """(B, N, H, W, 3) -> (B, N, h, w, C_neck). fusion_occ.py:126-141."""
        cfg = self.cfg
        B, N, H, W, _ = imgs.shape
        x = imgs.reshape(B * N, H, W, 3).astype(cfg.dtype)
        # camera model-parallelism: cameras spread over the 'spatial' axis
        x = self._constrain(x, ('data', 'spatial'))
        feats = self.img_backbone(x, deterministic=not train)
        if cfg.swin.return_stereo_feat:
            feats = feats[1:]
        y = self.img_neck(feats, train=train)
        h, w = y.shape[1], y.shape[2]
        return y.reshape(B, N, h, w, -1)

    def _frame_voxel_feat(self, imgs_f, s2k_f, s2k_key, intrin_f, post_rot_f,
                          post_tran_f, bda, sparse_depth, train: bool,
                          pool_idx=None):
        """One temporal frame through the camera branch.

        Geometry uses the frame's own sensor2keyego so that adjacent frames
        land directly in the key-ego grid (see module docstring).
        pool_idx: optional precomputed index (see frame_pooling_index);
        None recomputes it in-graph (required in training, where BDA/aug
        change the geometry every step).
        """
        cfg = self.cfg
        mlp_input = get_mlp_input(s2k_key, intrin_f, post_rot_f, post_tran_f,
                                  bda)
        x = self.image_encoder(imgs_f, train)
        if pool_idx is None:
            pool_idx = frame_pooling_index(cfg, s2k_f, intrin_f, post_rot_f,
                                           post_tran_f, bda)
        voxel, depth, seg = self.img_view_transformer(
            x, sparse_depth, mlp_input, pool_idx, train=train)
        voxel = self.pre_process_net(voxel, train=train)[0]
        return voxel, depth, seg

    def _batched_frame_feats(self, batch: Batch, train: bool,
                             pool_idx=None):
        """All temporal frames through the camera branch in ONE pass.

        Folds the frame axis into the batch axis (B*F) so the Swin/FPN/VT
        matmuls run at 12-image occupancy instead of two 6-image passes,
        and the frustum rank sort runs once over the merged point set.
        Eval-only: training keeps the per-frame loop so adjacent frames
        stay under stop_gradient (the reference's no_grad adjacent
        extraction, fusion_occ.py:276-327).

        Returns (voxel_feats oldest..newest order list, depth_key, seg_key).
        """
        cfg = self.cfg
        B, F, N, H, W, _ = batch.imgs.shape
        imgs_all = batch.imgs.reshape(B * F, N, H, W, 3)
        x_all = self.image_encoder(imgs_all, train)       # (B*F, N, h, w, C)

        mlps = [get_mlp_input(batch.sensor2keyego[:, 0],
                              batch.intrins[:, f], batch.post_rots[:, f],
                              batch.post_trans[:, f], batch.bda)
                for f in range(F)]
        mlp_all = jnp.stack(mlps, 1).reshape(B * F, N, -1)
        sd_all = jnp.broadcast_to(batch.sparse_depth[:, None],
                                  (B, F, N, H, W)).reshape(B * F, N, H, W)

        if pool_idx is None:
            # in-graph rank sort over the merged (B*F) point set; eval
            # callers with static geometry pass a precomputed folded index
            # instead (frame_pooling_index on (B*F)-folded geometry — the
            # accelerate path, view_transformer.py:175-194)
            frustum = make_frustum(cfg.grid.depth, cfg.input_size,
                                   cfg.vt.downsample, cfg.vt.sid)
            coors = [frustum_to_ego(frustum, batch.sensor2keyego[:, f],
                                    batch.intrins[:, f],
                                    batch.post_rots[:, f],
                                    batch.post_trans[:, f], batch.bda)
                     for f in range(F)]
            coor_all = jnp.stack(coors, 1)              # (B, F, N, D, h, w, 3)
            coor_all = coor_all.reshape((B * F,) + coor_all.shape[2:])
            pool_idx = prepare_pooling_index(coor_all, cfg.grid)

        voxel, depth, seg = self.img_view_transformer(
            x_all, sd_all, mlp_all, pool_idx, train=train)
        voxel = self.pre_process_net(voxel, train=train)[0]
        gz, gy, gx = voxel.shape[1:4]
        voxel = voxel.reshape(B, F, gz, gy, gx, -1)
        h, w = depth.shape[2], depth.shape[3]
        depth_key = depth.reshape(B, F, N, h, w, -1)[:, 0]
        seg_key = seg.reshape(B, F, N, h, w, -1)[:, 0]
        # loop order is [frame F-1 (oldest) ... frame 0]
        feats = [voxel[:, f] for f in range(F - 1, -1, -1)]
        return feats, depth_key, seg_key

    def __call__(self, batch: Batch, train: bool = False,
                 pool_idxs=None, batch_frames: bool = False,
                 pool_idx_folded=None) -> Dict[str, Any]:
        """pool_idxs: optional per-frame precomputed pooling indices
        (sequence of PoolingIndex or None, indexed by frame id).
        batch_frames: eval-only — run all temporal frames through the
        camera branch in one batched pass (see _batched_frame_feats);
        pool_idx_folded optionally supplies its precomputed (B*F)-folded
        pooling index."""
        cfg = self.cfg
        F = cfg.num_frame

        lidar_feat = self._lidar_feat(batch, train)

        if batch_frames and not train and F > 1:
            voxel_feats, depth_key, seg_key = self._batched_frame_feats(
                batch, train, pool_idx=pool_idx_folded)
        else:
            voxel_feats = []      # order: [frame F-1 (oldest) ... frame 0]
            depth_key = seg_key = None
            for fid in range(F - 1, -1, -1):
                voxel, depth, seg = self._frame_voxel_feat(
                    batch.imgs[:, fid], batch.sensor2keyego[:, fid],
                    batch.sensor2keyego[:, 0], batch.intrins[:, fid],
                    batch.post_rots[:, fid], batch.post_trans[:, fid],
                    batch.bda, batch.sparse_depth, train,
                    pool_idx=None if pool_idxs is None else pool_idxs[fid])
                if fid == 0:
                    depth_key, seg_key = depth, seg
                else:
                    voxel = jax.lax.stop_gradient(voxel)
                voxel_feats.append(voxel)

        fusion = jnp.concatenate(
            voxel_feats + [lidar_feat.astype(cfg.dtype)], axis=-1)
        # BEV spatial parallelism: grid Y axis over 'spatial' (halo
        # exchanges inserted by XLA for the 3D convs)
        fusion = self._constrain(fusion, 'data', None, 'spatial')
        if train and cfg.remat_bev:
            # one remat boundary over the BEV trunk: its jvp residuals
            # (neck concat + ConvBN pre-activations, ~1.4 GB at full size)
            # were top HBM allocations of the train step; recomputing the
            # trunk in the bwd pass costs little (BEV flops << camera).
            # Inference traces the plain branch — HLO unchanged.
            def _bev_trunk(m, f):
                return m.bev_neck(m.bev_backbone(f, train=True), train=True)
            x = nn.remat(_bev_trunk)(self, fusion)      # (B, Z, Y, X, C)
        else:
            feats = self.bev_backbone(fusion, train=train)
            x = self.bev_neck(feats, train=train)       # (B, Z, Y, X, C)
        x = nn.relu(self.final_conv(x))
        x = jnp.transpose(x, (0, 3, 2, 1, 4))           # (B, X, Y, Z, C)
        h = nn.softplus(self.predicter_fc1(x))
        logits = self.predicter_fc2(h)                  # (B, X, Y, Z, ncls)
        return {
            'occ_logits': logits.astype(jnp.float32),
            'depth': depth_key,     # (B, N, h, w, D) softmaxed
            'seg_logits': seg_key,  # (B, N, h, w, num_seg)
        }

    def predict(self, batch: Batch, pool_idxs=None,
                batch_frames: bool = False,
                pool_idx_folded=None) -> jnp.ndarray:
        """Inference: (B, X, Y, Z) uint8 class ids (fusion_occ.py:877-920)."""
        out = self(batch, train=False, pool_idxs=pool_idxs,
                   batch_frames=batch_frames,
                   pool_idx_folded=pool_idx_folded)
        return jnp.argmax(out['occ_logits'], axis=-1).astype(jnp.uint8)

    # -- streaming inference with a temporal BEV cache ----------------------
    def _shift_bev(self, feat: jnp.ndarray, dst2src: jnp.ndarray
                   ) -> jnp.ndarray:
        """Warp a (B, Z, Y, X, C) ego-frame voxel feature from a source ego
        frame onto the destination ego grid (planar x-y warp; z is carried).

        The static-shape equivalent of the reference's shift_feature /
        gen_grid BEV alignment (fusion_occ.py:329-428): dst grid-cell centers
        are mapped through dst2src and bilinearly sampled from the source.
        """
        from ..ops.grid_sample import grid_sample_2d
        grid = self.cfg.grid
        B, Z, Y, X, C = feat.shape
        xs = grid.lower_bound[0] + (jnp.arange(X) + 0.5) * grid.interval[0]
        ys = grid.lower_bound[1] + (jnp.arange(Y) + 0.5) * grid.interval[1]
        gy, gx = jnp.meshgrid(ys, xs, indexing='ij')      # (Y, X)
        ones = jnp.ones_like(gx)
        pts = jnp.stack([gx, gy, jnp.zeros_like(gx), ones], -1)  # (Y, X, 4)
        src = jnp.einsum('bij,yxj->byxi', dst2src.astype(jnp.float32), pts)
        # normalized sample coords in the source grid (align_corners=True
        # over cell centers)
        nx = (src[..., 0] - grid.lower_bound[0]) / grid.interval[0] - 0.5
        ny = (src[..., 1] - grid.lower_bound[1]) / grid.interval[1] - 0.5
        nx = nx / (X - 1) * 2.0 - 1.0
        ny = ny / (Y - 1) * 2.0 - 1.0
        sample_grid = jnp.stack([nx, ny], -1)             # (B, Y, X, 2)
        flat = jnp.transpose(feat, (0, 4, 1, 2, 3)).reshape(B, C * Z, Y, X)
        warped = grid_sample_2d(flat.astype(jnp.float32), sample_grid)
        warped = warped.reshape(B, C, Z, Y, X)
        return jnp.transpose(warped, (0, 2, 3, 4, 1)).astype(feat.dtype)

    def predict_streaming(self, batch: Batch, state: StreamingState,
                          pool_idx=None, reset=None):
        """One-frame inference reusing the cached previous-frame BEV feature.

        Runs the camera branch ONCE (for the new key frame), warps the cached
        adjacent feature into the new ego frame, fuses, and predicts — the
        static-shape realisation of 'temporal fusion without recompilation'.
        Where the cache is invalid (scene start) the current frame's feature
        substitutes, mirroring the dataset's current-frame duplication
        (fusionocc_dataset.py:253-266).

        batch: single-frame inputs (F axis = 1) with ego2global set.
        pool_idx: optional precomputed key-frame pooling index
          (frame_pooling_index) — at eval the geometry is static, so callers
          cache it and the steady-state step runs zero rank sorts.
        reset: optional (B,) bool — True where this sample starts a new
          scene; the cached feature from the previous scene is discarded
          (the dataset's scene-bounded adjacency, fusionocc_dataset.py:253-266).
        Returns (pred, outputs, new_state).
        """
        cfg = self.cfg
        assert batch.ego2global is not None
        assert cfg.num_adj == 1, 'streaming cache assumes one adjacent frame'
        if reset is not None:
            state = state._replace(valid=state.valid & ~reset)
        lidar_feat = self._lidar_feat(batch, train=False)
        voxel, depth, seg = self._frame_voxel_feat(
            batch.imgs[:, 0], batch.sensor2keyego[:, 0],
            batch.sensor2keyego[:, 0], batch.intrins[:, 0],
            batch.post_rots[:, 0], batch.post_trans[:, 0],
            batch.bda, batch.sparse_depth, train=False, pool_idx=pool_idx)

        dst2src = jnp.einsum(
            'bij,bjk->bik',
            jnp.linalg.inv(state.ego2global.astype(jnp.float32)),
            batch.ego2global.astype(jnp.float32))
        warped_prev = self._shift_bev(state.voxel_feat, dst2src)
        prev = jnp.where(state.valid[:, None, None, None, None],
                         warped_prev, voxel)

        # channel order matches training: [adjacent, key, lidar]
        fusion = jnp.concatenate(
            [prev, voxel, lidar_feat.astype(cfg.dtype)], axis=-1)
        feats = self.bev_backbone(fusion, train=False)
        x = self.bev_neck(feats, train=False)
        x = nn.relu(self.final_conv(x))
        x = jnp.transpose(x, (0, 3, 2, 1, 4))
        h = nn.softplus(self.predicter_fc1(x))
        logits = self.predicter_fc2(h).astype(jnp.float32)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        new_state = StreamingState(
            voxel_feat=voxel, ego2global=batch.ego2global,
            valid=jnp.ones_like(state.valid))
        return pred, {'occ_logits': logits, 'depth': depth,
                      'seg_logits': seg}, new_state

    def predict_streaming_scan(self, frames: Batch, state: StreamingState,
                               resets=None, pool_idx=None):
        """Streaming inference over T consecutive frames in ONE program.

        frames: a Batch whose leaves carry a leading time axis (T, B, ...);
        resets: optional (T, B) bool scene-boundary flags.  The temporal
        cache threads through a lax.scan, so a whole clip runs in a single
        device program — amortizing per-launch overhead, keeping the BEV
        cache in device memory, and letting XLA pipeline the T iterations.
        This is the deployment serving mode; the reference processes frames
        one python call at a time (tools/test.py loop).

        Returns (preds (T, B, X, Y, Z) uint8, final state).
        """
        if resets is None:
            resets = jnp.zeros(
                (jax.tree_util.tree_leaves(frames)[0].shape[0],
                 state.valid.shape[0]), bool)

        def body(s, xs):
            frame, reset = xs
            pred, _, ns = self.predict_streaming(frame, s, pool_idx=pool_idx,
                                                 reset=reset)
            return ns, pred

        final, preds = jax.lax.scan(body, state, (frames, resets))
        return preds, final

    def predict_streaming_batch(self, frames: Batch, state: StreamingState,
                                resets=None, pool_idx=None,
                                chunk: int = 4, cam_chunk: int = 0):
        """Streaming inference over T frames with time FOLDED INTO BATCH.

        Same math as predict_streaming_scan (equivalence tested in
        tests/test_streaming.py), but restructured on the observation that
        the temporal cache is the previous frame's CAMERA voxel feature —
        which this very pass computes for every frame.  So within a block of
        `chunk` frames, ``prev[t] = warp(voxel[t-1])`` has no serial
        dependence: the LiDAR + camera branches and the fused BEV head run
        batched over (chunk*B).  Measured on-chip, the sort-based index
        builds and the batch-1 convolutions are launch/latency-bound, so
        folding time amortizes them ~chunk-fold; only the sparse-conv
        gathers scale linearly.

        Blocks advance under ONE lax.scan (carrying the last frame's voxel
        feature/pose), so the compiled program contains a single copy of the
        model graph no matter how long the clip — python-unrolled chunk
        loops at T=8 full scale overwhelmed the TPU compiler.

        frames: Batch with leading (T, B, ...) axes and ego2global set;
          T % chunk == 0.
        pool_idx: optional pooling index computed on a (chunk*B)-folded
          geometry (eval geometry is identical across frames, so one folded
          index serves every block).
        chunk: frames per block (camera encoder and BEV head run at
          chunk*B); bounded by HBM.
        cam_chunk: 0/chunk = camera branch at full chunk*B; otherwise run
          the camera encoder sequentially over cam_chunk-frame microbatches
          (lax.map) inside the block.  The camera branch is FLOP-bound and
          gains nothing from the fold — the fold exists to amortize the
          LiDAR/voxelize sorts — so microbatching it bounds the Swin
          activation peak (chunk=8 is 48 images of 512x1408 otherwise)
          without giving up the amortization.  pool_idx must then be built
          on the (cam_chunk*B)-folded geometry.
        Returns (preds (T, B, X, Y, Z) uint8, final state).
        """
        cfg = self.cfg
        T = jax.tree_util.tree_leaves(frames)[0].shape[0]
        B = state.valid.shape[0]
        assert frames.ego2global is not None
        assert cfg.num_adj == 1, 'streaming cache assumes one adjacent frame'
        assert T % chunk == 0, (T, chunk)
        G = T // chunk
        if resets is None:
            resets = jnp.zeros((T, B), bool)

        # (T, B, ...) -> (G, chunk, B, ...) scan inputs
        grouped = jax.tree_util.tree_map(
            lambda a: a.reshape((G, chunk) + a.shape[1:]), frames)
        resets_g = resets.reshape(G, chunk, B)

        def body(carry, xs):
            prev_voxel, prev_pose, prev_valid_c = carry
            fg, rg = xs                       # leaves (chunk, B, ...)
            fb = jax.tree_util.tree_map(
                lambda a: a.reshape((chunk * B,) + a.shape[2:]), fg)

            lidar = self._lidar_feat(fb, train=False)   # (chunk*B, ...)
            if cam_chunk and cam_chunk < chunk:
                assert chunk % cam_chunk == 0, (chunk, cam_chunk)
                g2 = chunk // cam_chunk
                cam_in = jax.tree_util.tree_map(
                    lambda a: a.reshape((g2, cam_chunk * B) + a.shape[1:]),
                    (fb.imgs[:, 0], fb.sensor2keyego[:, 0],
                     fb.intrins[:, 0], fb.post_rots[:, 0],
                     fb.post_trans[:, 0], fb.bda, fb.sparse_depth))

                def cam_body(xs):
                    imgs, s2k, intr, pr, pt, bda2, sd = xs
                    v, _, _ = self._frame_voxel_feat(
                        imgs, s2k, s2k, intr, pr, pt, bda2, sd,
                        train=False, pool_idx=pool_idx)
                    return v
                voxel = jax.lax.map(cam_body, cam_in)
                voxel = voxel.reshape((chunk * B,) + voxel.shape[2:])
            else:
                voxel, _, _ = self._frame_voxel_feat(
                    fb.imgs[:, 0], fb.sensor2keyego[:, 0],
                    fb.sensor2keyego[:, 0], fb.intrins[:, 0],
                    fb.post_rots[:, 0], fb.post_trans[:, 0],
                    fb.bda, fb.sparse_depth, train=False, pool_idx=pool_idx)
            vox_t = voxel.reshape((chunk, B) + voxel.shape[1:])

            pose = fg.ego2global.astype(jnp.float32)    # (chunk, B, 4, 4)
            prev_feat = jnp.concatenate([prev_voxel[None], vox_t[:-1]], 0)
            pp = jnp.concatenate([prev_pose[None], pose[:-1]], 0)
            pv = jnp.concatenate(
                [prev_valid_c[None], jnp.ones((chunk - 1, B), bool)], 0)
            pv = pv & ~rg
            dst2src = jnp.einsum('tbij,tbjk->tbik', jnp.linalg.inv(pp), pose)

            def f2(x):
                return x.reshape((chunk * B,) + x.shape[2:])
            warped = self._shift_bev(f2(prev_feat), f2(dst2src))
            prev = jnp.where(
                f2(pv)[:, None, None, None, None], warped, voxel)
            fusion = jnp.concatenate(
                [prev, voxel, lidar.astype(cfg.dtype)], axis=-1)
            feats = self.bev_backbone(fusion, train=False)
            x = self.bev_neck(feats, train=False)
            x = nn.relu(self.final_conv(x))
            x = jnp.transpose(x, (0, 3, 2, 1, 4))
            h = nn.softplus(self.predicter_fc1(x))
            logits = self.predicter_fc2(h).astype(jnp.float32)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            pred = pred.reshape((chunk, B) + pred.shape[1:])

            new_carry = (vox_t[-1], pose[-1], jnp.ones((B,), bool))
            return new_carry, pred

        carry0 = (state.voxel_feat,
                  state.ego2global.astype(jnp.float32), state.valid)
        (vox_last, _, _), preds = jax.lax.scan(body, carry0,
                                               (grouped, resets_g))
        new_state = StreamingState(
            voxel_feat=vox_last, ego2global=frames.ego2global[-1],
            valid=jnp.ones_like(state.valid))
        return preds.reshape((T, B) + preds.shape[3:]), new_state

    def init_streaming_state(self, batch_size: int = 1) -> StreamingState:
        cfg = self.cfg
        gx, gy, gz = cfg.grid.grid_size
        return StreamingState(
            voxel_feat=jnp.zeros((batch_size, gz, gy, gx, cfg.img_channels),
                                 cfg.dtype),
            ego2global=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                        (batch_size, 4, 4)),
            valid=jnp.zeros((batch_size,), bool))
