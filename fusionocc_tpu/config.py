"""Typed configuration for the TPU-native FusionOcc framework.

Frozen dataclasses replace the reference's mmengine python-file config system
(reference: projects/FusionOcc/configs/fusion_occ.py).  Every component reads
its hyper-parameters from here; derived sizes (frustum depth bins, feature map
shapes, voxel grid dims) are exposed as properties so that tiny test configs
scale consistently.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class GridConfig:
    """BEV/voxel grid bounds. Reference: configs/fusion_occ.py:38-43."""
    x: Tuple[float, float, float] = (-40.0, 40.0, 0.4)
    y: Tuple[float, float, float] = (-40.0, 40.0, 0.4)
    z: Tuple[float, float, float] = (-1.0, 5.4, 0.4)
    depth: Tuple[float, float, float] = (1.0, 45.0, 0.5)

    @property
    def size_x(self) -> int:
        return int(round((self.x[1] - self.x[0]) / self.x[2]))

    @property
    def size_y(self) -> int:
        return int(round((self.y[1] - self.y[0]) / self.y[2]))

    @property
    def size_z(self) -> int:
        return int(round((self.z[1] - self.z[0]) / self.z[2]))

    @property
    def num_depth_bins(self) -> int:
        lo, hi, step = self.depth
        return int(round((hi - lo) / step))

    @property
    def lower_bound(self):
        return jnp.asarray([self.x[0], self.y[0], self.z[0]], jnp.float32)

    @property
    def interval(self):
        return jnp.asarray([self.x[2], self.y[2], self.z[2]], jnp.float32)

    @property
    def grid_size(self):
        return (self.size_x, self.size_y, self.size_z)

    @property
    def point_cloud_range(self) -> Tuple[float, ...]:
        return (self.x[0], self.y[0], self.z[0], self.x[1], self.y[1], self.z[1])


@dataclass(frozen=True)
class SwinConfig:
    """Swin backbone. Reference: configs/fusion_occ.py:69-91 (Swin-Base)."""
    embed_dims: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    patch_size: int = 4
    mlp_ratio: int = 4
    out_indices: Tuple[int, ...] = (2, 3)
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    return_stereo_feat: bool = True
    with_cp: bool = True  # remat the transformer blocks
    # Fused Pallas window attention (scores stay VMEM-resident); interpret
    # mode off-TPU, so the flag is safe everywhere.
    fused_attn: bool = True
    # Only fuse stages with <= this many heads.  The kernel body unrolls
    # one matmul pair per head; the head-blocked grid (4-head groups per
    # Pallas step) keeps Mosaic compile time flat, and the round-3 on-chip
    # A/B (results/onchip_20260818_155235/profile_camera.log) measured
    # fused faster at EVERY stage — stage2 shifted blocks 33.3 -> 28.3 ms
    # (x9 blocks/pass), stage3 27.6 -> 26.2 — so all stages fuse now.
    fused_attn_max_heads: int = 32
    # int8 serving: route the transformer's Dense layers (qkv/proj/mlp/
    # patch-merge) through dynamic int8 MXU matmuls (quant.int8_dot_general)
    # — the analog of the reference's TRT INT8 engines (tools/test.py
    # --int8-engines).  Toggled at eval time; parameters are unchanged.
    int8_dense: bool = False

    @property
    def num_features(self) -> Tuple[int, ...]:
        return tuple(self.embed_dims * 2 ** i for i in range(len(self.depths)))


@dataclass(frozen=True)
class SparseEncoderConfig:
    """LiDAR sparse encoder. Reference: fusionocc/lidar_encoder.py:33-57.

    Static capacities (TPU requirement): points and per-stage active-voxel
    buffers are padded to fixed sizes so that every step compiles once.
    """
    in_channels: int = 5
    base_channels: int = 16
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16, 16, 32), (32, 32, 48), (48, 48, 64), (64, 64))
    output_channels: int = 32
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.05)
    # Padded capacities: points after range filtering; active voxels per
    # stage.  A real 8-sweep nuScenes cloud after the reference's ring/20%
    # subsampling and range filter is ~100-140k points (the beam-model
    # synthetic matches); 2^17 holds that with margin and halves the
    # voxelize sort vs 2^18.
    point_capacity: int = 2 ** 17
    # Stages 1..3 must hold the stride-2 DILATED active sets (1.8x growth
    # at stage 1): measured on the beam-model cloud 88k/160k/83k/34k
    # actives.  Round-2's (2^17, 2^16, 2^15, 2^14) silently truncated ~60%
    # of stage-1..3 voxels.
    voxel_capacity: Tuple[int, ...] = (2 ** 17, 196608, 98304, 49152)
    # Encoder backend:
    #   'coo'   — gather-GEMM over per-voxel COO rows (reference-shaped);
    #   'tile'  — dense MXU convs over halo'd ts^3 tiles (measured 10x
    #             SLOWER end-to-end: halo HBM traffic; kept as a documented
    #             alternative formulation);
    #   'zfold' — 8 z-consecutive cells folded into one 128-lane super row
    #             (ops/zfold.py): 256+ B gather descriptors, F-times
    #             smaller index tables, convs as clean MXU GEMMs.
    backend: str = 'zfold'
    # COO gather flavor: 'row' issues 27 single-row gathers per output
    # voxel; 'block' exploits z-fastest key order (a column's found z-taps
    # occupy consecutive rows) to fetch 9 contiguous 3-row slices instead
    # — 3x fewer gather descriptors (ops/sparse_conv.py
    # sparse_conv_apply_block).  Measured on chip: 'block' is 2.1x SLOWER
    # (85.9 vs 41.0 ms at stage 0) — its (V, 9) bool temps pad 14.2x in
    # TPU tile layout — so 'row' stays the default.
    gather: str = 'row'
    # Neighbor-map builds: 'table' scatters row ids into a dense per-cell
    # int32 table and reads taps with O(1) gathers (no sorts — XLA's TPU
    # sort is a log^2 n bitonic network and the merge builds cost ~114 ms
    # per stage at V=131k); 'merge' keeps the sort-merge formulation
    # (ops/sparse_conv.py stage_indices_table vs build_subm_index).
    index: str = 'table'
    tile_size: int = 8
    # Active-tile capacities per stage (~12.6k/7k/3k/1k measured on the
    # beam-model cloud at stage 0..3 + dilation headroom).
    tile_capacity: Tuple[int, ...] = (2 ** 14, 2 ** 13, 2 ** 12, 1250)
    # zfold backend: fold factor (8 x base_channels 16 = exactly one
    # 128-lane tile) and per-stage active-SUPER capacities.  Measured on
    # the beam-model cloud: 67260 / 72628 / 63083 / 24624 candidate supers
    # (stages 1+ use the conservative super-level dilation rule, hence
    # stage2's 63k vs 34k true) — pinned by tests/test_capacity.py.
    zfold: int = 8
    zfold_capacity: Tuple[int, ...] = (81920, 86016, 73728, 32768)
    # Gather-temp bound for the lifted zfold convs: 27 taps one-shot
    # materializes (B, S, 27*F*C) — GBs at F*C=512 — and OOMs the chip once
    # the camera branch shares the program; tap_chunk=9 scans 3 groups of 9
    # taps with a bounded temp (ops/sparse_conv.py sparse_conv_apply).
    tap_chunk: int = 9
    # zfold conv formulation (ops/zfold.py), on-chip A/B 2026-08-19
    # (late-round-3 run, log not retained — see BENCH.md round-3 table;
    # full-size encoder end-to-end):
    #   'zband'  333 ms — lifted weight sliced to its nonzero z-bands:
    #            9 full-width + 18 Cin-wide taps, one GEMM per z-shift
    #            (3x less gather traffic, ~F/3 x fewer MACs); DEFAULT.
    #   'lifted' 412 ms — dense (27, F*Cin, F*Cout) super kernel (F x the
    #            true MACs; the z-banded zeros ride the MXU anyway).
    #   'zslice' 514-536 ms — per-tap window slices at exact cell FLOPs,
    #            but the slices triple the window traffic and the
    #            (.., Cout) GEMMs waste the 128-lane tile; negative result.
    #   'zwin'   — fused windowed gather-GEMM Pallas kernel
    #            (ops/pallas/zwin_conv.py): neighbor monotonicity turns the
    #            row gathers into 3 contiguous window DMAs per output block
    #            + one-hot MXU row selection in VMEM; exact (lax.cond
    #            fallback to zband when a window overflows).
    # Round-5 default flip to zwin: encoder e2e 331.6 (zband) -> 291.6 ms
    # (zwin b128 n6 bf.03125 + dense_from=3 + shared plans,
    # results/round5_zwin3.log); training forward also runs the kernel,
    # backward recomputes through zband's VJP (test_zwin grads).
    zconv: str = 'zwin'
    # zwin kernel tiling: output rows per grid step, and window size in
    # blocks (usable neighbor span = (zwin_nwin-1)*zwin_block rows).
    zwin_block: int = 128
    zwin_nwin: int = 6
    # Overflow-block recompute capacity as a fraction of the output
    # blocks: blocks whose span exceeds the window (the x-slab-boundary
    # tail, tools/check_zwin_spans.py: p99 span ~2-5 blocks but max up to
    # 16) are recomputed exactly by a compacted zband pass; only past
    # this cap does the whole layer fall back.
    # Round-5 sweep (results/round5_zwin3.log): the patch pass runs at
    # static capacity every conv, so smaller is faster — 0.0625 -> 296.6,
    # 0.03125 -> 291.6, 0.015625 -> 288.9 ms e2e; 0.0078 tips into the
    # whole-layer fallback (303.3).  0.03125 keeps ~2x margin over the
    # measured bad-block count for denser-than-benchmark clouds.
    zwin_bad_frac: float = 0.03125
    # Merged-tap zwin kernel body: per dx ONE stacked one-hot selection
    # matmul + ONE banded weight matmul instead of 9 of each (the round-4
    # bisection shows the kernel is per-matmul-cost bound, not FLOP bound;
    # ops/pallas/zwin_conv.py::_make_kernel_merged).
    zwin_merged: bool = False
    # Fuse the eval-mode BN affine + ReLU + lane mask into the zwin
    # kernel epilogue (ops/pallas/zwin_conv.py::zwin_conv_infer).
    # Measured SLOWER on chip (round-5: 302.0 fused vs 295.0 unfused
    # e2e, results/round5_zwin2.log): XLA already fuses the BN
    # elementwise chain, while the epilogue forces materializing the
    # (B, S, L_out) lane multiplier as a kernel input.  Kept for
    # reference / future layouts; default OFF.  The per-stage window
    # plan (zwin_plan) is shared across a stage's convs regardless.
    zwin_fuse: bool = False
    # kernel columns per zslice scan step (divisor of 9): bounds live
    # window temps at col_chunk * (B, S, 3*F*Cin)
    col_chunk: int = 3
    # Dense-conv crossover for the LATE encoder stages: stages >=
    # dense_from run as masked dense convs over the densified volume
    # (ops/dense_conv.py) — by stages 2-3 the grids are small enough that
    # plain dense conv beats the sparse selection machinery and needs no
    # index tables.  4 = never (all stages sparse).  Only meaningful for
    # backend='zfold'.
    # Round-5 on-chip A/B (results/round5_zwin.log): dense_from=3 beats
    # all-sparse by 10 ms e2e (303.6 -> 293.5 ms) while dense_from=2
    # LOSES (332.8 — stage-2 dense bandwidth exceeds its sparse cost),
    # so the crossover default is 3.
    dense_from: int = 3
    # Dense conv formulation: 'zbatch' folds z into the batch axis (3
    # z-shifted 2D convs at true cell FLOPs); 'xla3d' one NDHWC conv call.
    dense_mode: str = 'zbatch'
    # Profiling support: truncate the encoder after a named phase and
    # return the live intermediate ('vox', 'input', 'regroup', 'table0'..,
    # 'stage0'.., 'conv_out'); '' runs the full encoder.  Used by
    # tools/profile_lidar.py for the on-chip stage bisection.
    stop_after: str = ''
    # Profiling support: run the zfold stages with BN+ReLU stripped from
    # every sparse conv (numbers INVALID — attribution of the per-conv
    # XLA elementwise glue only; tools/profile_zwin.py).
    profile_no_bn: bool = False
    # Training memory: jax.checkpoint each zfold conv apply so the
    # backward recomputes the 27-tap gather instead of holding the
    # (B, S, taps*F*Cin) gather temp as a jvp residual — the largest
    # per-conv residual class in the full-size train step (BENCH.md
    # round 3 OOM analysis).  Default True: without it the full-size
    # train step OOMs (17.5G vs 15.75G HBM); with it, measured
    # 1.784 s/iter on v5e (results/round3_zband/train_remat_conv.log).
    # No effect on inference HLO (checkpoint is identity without grads);
    # value/grad equivalence pinned by tests/test_zfold.py.
    remat_conv: bool = True

    def sparse_shape(self, grid: GridConfig) -> Tuple[int, int, int]:
        pcr = grid.point_cloud_range
        return (
            int(round((pcr[3] - pcr[0]) / self.voxel_size[0])),
            int(round((pcr[4] - pcr[1]) / self.voxel_size[1])),
            int(round((pcr[5] - pcr[2]) / self.voxel_size[2])),
        )


@dataclass(frozen=True)
class ViewTransformerConfig:
    """CrossModalLSS. Reference: configs/fusion_occ.py:100-114."""
    in_channels: int = 256        # FPN output
    mid_channels: int = 128
    feature_channels: int = 32    # lifted context channels (16 seg + 16 ctx)
    seg_num_classes: int = 18
    downsample: int = 16
    aspp_mid_channels: int = 96
    depth_drop_rate: float = 0.5  # random depth-input dropping in training
    sid: bool = False
    collapse_z: bool = False


@dataclass(frozen=True)
class ModelConfig:
    """Full FusionOcc model."""
    num_cams: int = 6
    num_adj: int = 1              # temporal adjacent camera frames
    input_size: Tuple[int, int] = (512, 1408)
    num_classes: int = 18
    grid: GridConfig = field(default_factory=GridConfig)
    swin: SwinConfig = field(default_factory=SwinConfig)
    lidar: SparseEncoderConfig = field(default_factory=SparseEncoderConfig)
    vt: ViewTransformerConfig = field(default_factory=ViewTransformerConfig)
    img_neck_out_channels: int = 256
    img_channels: int = 32        # per-frame image voxel channels
    lidar_out_channels: int = 32
    bev_num_layer: Tuple[int, ...] = (1, 2, 3)
    bev_strides: Tuple[int, ...] = (1, 2, 2)
    use_mask: bool = True
    use_lidar: bool = True   # False = image-only mode (zero lidar features,
                             # the reference's fallback, fusion_occ.py:1475-1482)
    mask_mode: str = 'baseline_with_mask'  # training-mask ablation (data/masks.py)
    # condition_C distance threshold in metres (reference ablation
    # fusion_occ_occ3d_miou_unified_condition_C_20m.py:185: 20.0 vs the
    # condition_C default 35.0); only read when mask_mode='condition_C'.
    mask_dist_threshold_c: float = 35.0
    temperature: float = 1.0  # calibration temperature for probability outputs
    use_predicter: bool = True
    fuse_loss_weight: float = 0.1
    depth_loss_weight: float = 1.0
    # numeric policy
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # remat the BEV trunk (backbone+neck) in the train step. Measured
    # NEGATIVE at full size on v5e (BENCH.md round 3): the coarse remat
    # boundary makes the trunk's backward one unschedulable block whose
    # recompute + transpose temps peak HIGHER (17.99G) than storing the
    # jvp residuals (17.48G). Off by default; inference programs are
    # unaffected either way (the plain branch traces when train=False).
    remat_bev: bool = False

    @property
    def num_frame(self) -> int:
        return self.num_adj + 1

    @property
    def feat_size(self) -> Tuple[int, int]:
        return (self.input_size[0] // self.vt.downsample,
                self.input_size[1] // self.vt.downsample)

    @property
    def fusion_channels(self) -> int:
        """Channels entering the BEV encoder: image frames + lidar."""
        return self.img_channels * self.num_frame + self.lidar_out_channels

    @property
    def occ_channels(self) -> int:
        """numC_Trans in the reference: img + lidar channel count."""
        return self.img_channels + self.lidar_out_channels

    @property
    def bev_channels(self) -> Tuple[int, ...]:
        c = self.occ_channels
        return (c, c * 2, c * 4)

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def pdtype(self):
        return jnp.dtype(self.param_dtype)


@dataclass(frozen=True)
class OptimConfig:
    """Reference: configs/fusion_occ.py:259-282 (baseline recipe)."""
    lr: float = 5e-5
    weight_decay: float = 1e-2
    clip_norm: float = 5.0
    warmup_iters: int = 500
    warmup_start_factor: float = 1.0 / 3.0
    max_epochs: int = 24
    iters_per_epoch: int = 28130   # nuScenes train size / batch 1
    eta_min_factor: float = 1e-3
    ema_momentum: float = 0.001    # EMAHook momentum (decay = 1 - momentum)
    accumulate_steps: int = 1
    backbone_lr_mult: float = 1.0  # unified recipe uses 0.1 for backbone/VT


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation protocol — the reference's eval-variant config axis
    (configs/fusion_occ_occ3d_{miou,rayiou}_*.py, *_calib_{train,eval}*.py).

    metric: 'miou' (masked Occ3D mIoU) or 'rayiou' (exact-traversal RayIoU;
      implies NO camera mask at eval — visibility is handled by ray casting,
      reference fusion_occ_occ3d_rayiou_unified.py use_image_mask=False).
    use_image_mask: apply the camera-visibility mask in the evaluator
      (reference test_dataloader use_image_mask).
    split: which infos file the variant evaluates on — 'val',
      'val_eval' (held-out calibration-eval split) or 'val_calib'
      (temperature-fitting split); tools/test.py maps it to
      fusionocc-nuscenes_infos_<split>.pkl next to --ann-file.
    """
    metric: str = 'miou'
    use_image_mask: bool = True
    split: str = 'val'


@dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    batch_size: int = 1            # per device
    seed: int = 0


def tiny_model_config(**overrides) -> ModelConfig:
    """A scaled-down config used by unit tests (CPU-friendly).

    Keeps every structural property of the full model (two temporal frames,
    Swin stages, sparse encoder stages, LSS frustum) at toy sizes.
    """
    grid = GridConfig(
        x=(-8.0, 8.0, 0.8), y=(-8.0, 8.0, 0.8), z=(-1.0, 2.2, 0.8),
        depth=(1.0, 9.0, 1.0))
    swin = SwinConfig(
        embed_dims=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
        window_size=4, drop_path_rate=0.0, with_cp=False,
        # interpret-mode Pallas makes CPU compiles of the tiny training
        # step ~2.3x slower; the kernel has its own parity tests, so the
        # driver-facing tiny config keeps the plain XLA path.
        fused_attn=False)
    lidar = SparseEncoderConfig(
        in_channels=5, base_channels=4,
        encoder_channels=((4, 4, 8), (8, 8, 12), (12, 12, 16), (16, 16)),
        output_channels=8,
        voxel_size=(0.1, 0.1, 0.1),
        point_capacity=2048,
        voxel_capacity=(1024, 512, 256, 128),
        tile_capacity=(512, 256, 64, 16),
        zfold_capacity=(1024, 512, 256, 128),
        # Compile-cheap sparse path for the tiny config: the driver's
        # multichip dryrun compiles THREE training graphs of this model on
        # a 1-core CPU host, and round 3's zfold+remat+tap-scan defaults
        # pushed that past the driver's budget (MULTICHIP_r03.json rc=124).
        # zfold/zband/remat correctness is covered by dedicated tests
        # (tests/test_zfold.py, tests/test_sharding.py); the tiny config
        # exists to exercise the full COMPOSITION cheaply.
        backend='coo', index='merge', remat_conv=False, tap_chunk=0)
    vt = ViewTransformerConfig(
        in_channels=32, mid_channels=16, feature_channels=8,
        seg_num_classes=18, downsample=16, aspp_mid_channels=8)
    cfg = ModelConfig(
        num_cams=2, num_adj=1, input_size=(64, 128),
        grid=grid, swin=swin, lidar=lidar, vt=vt,
        img_neck_out_channels=32, img_channels=8, lidar_out_channels=8,
        compute_dtype="float32")
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def midsize_model_config(**overrides) -> ModelConfig:
    """A mid-scale config that hits the FULL-SIZE structural edge cases the
    tiny config cannot, while staying CPU-golden-testable:

      - window-12 Swin on grids non-divisible by 12 in BOTH axes
        (176x352 input -> 44x88 stage-0 tokens; full size pads 128x352
        the same way) — exercises window padding + shifted masks at the
        production window size;
      - the production depth axis: D=88 bins (1..45 m at 0.5) at
        downsample 16 — the real frustum/pooling ratios;
      - zfold backend with a NON-FULL last fold (sparse z 32 -> stage-3
        supers hold f_out=4 < 8), torch-goldened via the dense-conv
        equivalence (the full 1600^2 grid is not torch-dense-testable).

    Used by tests/test_full_golden.py alongside the tiny config.
    """
    base = tiny_model_config()
    swin = dataclasses.replace(
        base.swin, embed_dims=32, depths=(1, 1, 2, 1),
        num_heads=(1, 2, 4, 8), window_size=12)
    lidar = dataclasses.replace(base.lidar, backend='zfold', zconv='zband')
    grid = dataclasses.replace(base.grid, depth=(1.0, 45.0, 0.5))  # D=88
    cfg = dataclasses.replace(
        base, input_size=(176, 352), swin=swin, lidar=lidar, grid=grid)
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def full_model_config(**overrides) -> ModelConfig:
    cfg = ModelConfig()
    return dataclasses.replace(cfg, **overrides) if overrides else cfg
