"""Fused windowed gather-GEMM Pallas kernel for the z-folded sparse conv.

The z-folded sparse conv (ops/zfold.py, the TPU-native formulation of the
reference's spconv stack, fusionocc/lidar_encoder.py:125-220) spends almost
all of its time in XLA row gathers: `zband_conv_apply` materializes a
(B, S, 9*band*Cin) HBM temp per z-shift, and the random-access row gather
runs at ~11 GB/s effective (measured round 3: stage-0 apply 51.4 ms for
~0.6 GB of useful traffic; the encoder's feature path is ~270 ms of the
333 ms total).

This kernel exploits the *monotonicity* of the neighbor map: voxel rows are
sorted by (x, y, z-super) key, and a kernel tap's key offset is a constant,
so for every (dx, dy, ds) tap the neighbor row index is non-decreasing in
the output row index.  Taps sharing dx differ only by |dy*ssz + ds| <= ssz+1
in key space, so a block of Vb consecutive output rows reads, per dx in
{-1, 0, +1}, one contiguous *window* of input rows.  The kernel:

  1. streams 3 windows (K aligned Vb-row blocks each) from HBM to VMEM as
     contiguous DMAs at full bandwidth — no gather descriptors at all;
  2. selects each tap's neighbor rows from the window with a one-hot MXU
     matmul (rel-position one-hot (Vb, K*Vb) @ window (K*Vb, band)) —
     exact, since a one-hot bf16 matmul copies rows bit-for-bit;
  3. immediately multiplies by the tap's z-banded lifted weight slice and
     accumulates in fp32 VMEM — the gathered rows never touch HBM.

Window capacity is (K-1)*Vb rows.  Real nuScenes-like clouds keep per-block
neighbor spans near Vb (neighbor density tracks output density between
adjacent 5 cm slices), but a pathological cloud can exceed any static
window; the wrapper therefore computes an `overflow` flag in XLA (one
max-reduce over the precomputed rel offsets) and `lax.cond`s to the exact
XLA path (`zband_conv_apply`) when any tap falls outside its window — the
kernel is *always exact*, not approximately so.

Training: `zwin_conv_apply` carries a custom VJP whose forward is the
Pallas kernel and whose backward is the VJP of the numerically identical
`zband_conv_apply` — so `remat_conv` recomputation also runs the fast
forward.

Off-TPU the kernel runs in interpret mode so the CPU test suite exercises
the identical code path (tests/test_zwin.py).
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..zfold import expand_weight, zband_conv_apply


def _use_interpret() -> bool:
    return jax.default_backend() != 'tpu'


def z_bands(f_in: int, f_out: int, stride: int) -> List[Tuple[int, int]]:
    """Nonzero (zi_lo, nzi) input-lane band per super z-shift ds in 0..2.

    Same band analysis as zband_conv_apply: tap (zo, dz) reads input cell
    r = stride*zo + dz - 1, which lives in super shift ds = r//f_in + 1 at
    lane zi = r % f_in.  Returns [(zi_lo, nzi)] with nzi == 0 for empty ds.
    """
    bands = []
    for ds in range(3):
        zis = [stride * zo + dz - 1 - (ds - 1) * f_in
               for zo in range(f_out) for dz in range(3)
               if (stride * zo + dz - 1) // f_in + 1 == ds]
        if zis:
            bands.append((min(zis), max(zis) - min(zis) + 1))
        else:
            bands.append((0, 0))
    return bands


def _epilogue_in_kernel(acc, refs, act: bool, out_dtype):
    """Fused eval epilogue: BN affine + ReLU + lane mask, VMEM-resident.

    refs = (inv_ref (1, L_out) f32, bias_ref (1, L_out) f32,
    lane_ref (1, Vb, L_out)).  Saves the per-conv XLA elementwise pass
    over the (B, S, L_out) fp32 BN intermediate (round-5 micro: the
    in-program conv cost is ~2-3x the isolated kernel cost — the glue,
    not the matmuls, is the gap)."""
    inv_ref, bias_ref, lane_ref = refs
    y = acc * inv_ref[:] + bias_ref[:]          # (Vb, L) * (1, L)
    if act:
        y = jnp.maximum(y, 0.0)
    y = y * lane_ref[0].astype(jnp.float32)
    return y.astype(out_dtype)


def _make_kernel_merged(taps, n_win: int, cin: int, block_v: int,
                        win_rows: int, dtype):
    """Merged-tap kernel body: per dx ONE stacked selection matmul + ONE
    banded weight matmul, instead of 9 of each.

    Round-4 measurement (BENCH.md): the tap-by-tap kernel is bound by the
    fixed per-matmul cost of ~27 taps x 2 small MXU ops per block (~1.3 us
    per tap), not by window FLOPs.  Stacking the one-hots of the taps that
    share a window (same dx) along the sublane axis turns the selection
    into one (n_t*Vb, win) @ (win, l_in) MXU op; the per-tap z-band slices
    are then STATIC sublane/lane slices of the result, lane-concatenated
    into one (Vb, sum nzi*cin) operand for a single banded weight matmul
    per dx.  Selection now reads full l_in for the thin taps (the band
    zeros ride the MXU), trading ~2x selection FLOPs for ~9x fewer ops.
    """
    k = n_win

    def kernel(blk_ref, rel_ref, *refs):
        win_refs, w_ref, o_ref = refs[:3 * k], refs[3 * k], refs[3 * k + 1]
        del blk_ref  # only used by the index maps
        rel = rel_ref[0]                                  # (Vb, 27) int32
        l_out = o_ref.shape[-1]
        acc = jnp.zeros((block_v, l_out), jnp.float32)
        w_lo = 0
        for dx in range(3):
            taps_dx = [tp for tp in taps if tp[1] == dx]
            if not taps_dx:
                continue
            win = jnp.concatenate(
                [win_refs[dx * k + j][0] for j in range(k)], axis=0)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (block_v, win_rows), 1)
            oh = jnp.concatenate(
                [(rel[:, t:t + 1] == iota).astype(dtype)
                 for t, _, _, _, _ in taps_dx], axis=0)   # (n_t*Vb, win)
            sel = jnp.dot(oh, win,
                          preferred_element_type=jnp.float32).astype(dtype)
            g = jnp.concatenate(
                [sel[i * block_v:(i + 1) * block_v,
                     zi_lo * cin:(zi_lo + nzi) * cin]
                 for i, (_, _, zi_lo, nzi, _) in enumerate(taps_dx)],
                axis=1)                                   # (Vb, w_dx)
            w_dx = g.shape[1]
            acc = acc + jnp.dot(g, w_ref[w_lo:w_lo + w_dx, :],
                                preferred_element_type=jnp.float32)
            w_lo += w_dx
        o_ref[0] = acc.astype(o_ref.dtype)

    return kernel


def _make_kernel(taps, n_win: int, cin: int, block_v: int, win_rows: int,
                 dtype, epi: bool = False, act: bool = True):
    """Build the kernel body with static per-tap lane slices baked in.

    taps: list of (tap_idx, dx, zi_lo, nzi, w_row_offset).  With ``epi``
    three extra refs (inv, bias, lane) follow the weight ref and the BN
    affine + ReLU + lane mask run in VMEM (_epilogue_in_kernel).
    """
    k = n_win

    def kernel(blk_ref, rel_ref, *refs):
        win_refs, w_ref = refs[:3 * k], refs[3 * k]
        o_ref = refs[-1]
        del blk_ref  # only used by the index maps
        rel = rel_ref[0]                                  # (Vb, 27) int32
        iota = jax.lax.broadcasted_iota(jnp.int32, (block_v, win_rows), 1)
        wins = [jnp.concatenate([win_refs[dx * k + j][0] for j in range(k)],
                                axis=0) for dx in range(3)]
        l_out = o_ref.shape[-1]
        acc = jnp.zeros((block_v, l_out), jnp.float32)
        for t, dx, zi_lo, nzi, w_off in taps:
            onehot = (rel[:, t:t + 1] == iota).astype(dtype)
            opnd = wins[dx][:, zi_lo * cin:(zi_lo + nzi) * cin]
            rows = jnp.dot(onehot, opnd,
                           preferred_element_type=jnp.float32).astype(dtype)
            wk = w_ref[w_off:w_off + nzi * cin, :]
            acc = acc + jnp.dot(rows, wk,
                                preferred_element_type=jnp.float32)
        if epi:
            o_ref[0] = _epilogue_in_kernel(acc, refs[3 * k + 1:3 * k + 4],
                                           act, o_ref.dtype)
        else:
            o_ref[0] = acc.astype(o_ref.dtype)

    return kernel


def _prepare(nbr_idx: jnp.ndarray, s_in: int, block_v: int, n_win: int):
    """XLA-side precompute: per-(block, dx) aligned window base blocks, the
    in-window rel offsets per tap, and per-block overflow flags.

    Returns (blk, rel, bad_blk):
      blk: (B, nb, 3) int32 block indices into the Vb-padded feats;
      rel: (B, S_out, 27) int32 offsets into the dx window, sentinel K*Vb
        for misses / out-of-window taps;
      bad_blk: (B, nb) bool — True where a FOUND tap fell outside its
        window (that block's kernel output is partial and must be patched
        by the compacted zband pass).
    """
    b, s_out, _ = nbr_idx.shape
    nb = s_out // block_v
    win_rows = n_win * block_v
    n_pad_blocks = -(-s_in // block_v) + n_win      # feats padded to this
    found = nbr_idx < s_in                          # (B, S, 27)
    big = jnp.int32(2 ** 30)
    # per-(block, dx) min found row over (Vb rows x 9 taps of that dx)
    by_dx = jnp.where(found, nbr_idx, big).reshape(b, nb, block_v, 3, 9)
    start = jnp.min(by_dx, axis=(2, 4))             # (B, nb, 3)
    blk = jnp.clip(start // block_v, 0, n_pad_blocks - n_win)
    base = (blk * block_v)                          # (B, nb, 3)
    base_full = jnp.repeat(base[:, :, None, :], block_v, axis=2)
    base_full = jnp.repeat(base_full.reshape(b, s_out, 3)[..., None], 9,
                           axis=-1).reshape(b, s_out, 27)
    rel = nbr_idx - base_full
    ok = found & (rel >= 0) & (rel < win_rows)
    bad_blk = jnp.any((found & ~ok).reshape(b, nb, block_v * 27), axis=-1)
    rel = jnp.where(ok, rel, win_rows).astype(jnp.int32)
    return blk.astype(jnp.int32), rel, bad_blk


def zwin_conv_apply(feats: jnp.ndarray, mask_out: jnp.ndarray,
                    nbr_idx: jnp.ndarray, weight: jnp.ndarray,
                    f_in: int, f_out: int, stride: int,
                    block_v: int = 128, n_win: int = 4,
                    bad_frac: float = 0.125,
                    merged: bool = False) -> jnp.ndarray:
    """Drop-in replacement for zband_conv_apply (same contract/result).

    feats: (B, S_in, f_in*Cin) zi-major lanes; nbr_idx: (B, S_out, 27)
    super-grid neighbor map in KERNEL_OFFSETS order (miss -> S_in);
    weight: unlifted (27, Cin, Cout).  Returns (B, S_out, f_out*Cout).

    Falls back to the XLA zband path (statically) when shapes don't tile.
    Blocks whose neighbor span overflows the n_win*block_v-row window are
    recomputed exactly by a compacted zband pass (capacity
    ceil(bad_frac * n_blocks) blocks; measured spans:
    tools/check_zwin_spans.py); only when MORE blocks than that overflow
    does the whole layer lax.cond to zband — the result is always exact.
    """
    b, s_in, l_in = feats.shape
    cin, cout = weight.shape[1], weight.shape[2]
    s_out = nbr_idx.shape[1]
    if (s_out % block_v != 0 or s_in < block_v
            or l_in != f_in * cin):
        return zband_conv_apply(feats, mask_out, nbr_idx, weight,
                                f_in, f_out, stride)
    return _zwin_custom(feats, mask_out, nbr_idx, weight, f_in, f_out,
                        stride, block_v, n_win, bad_frac, merged)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _zwin_custom(feats, mask_out, nbr_idx, weight, f_in, f_out, stride,
                 block_v, n_win, bad_frac, merged):
    return _zwin_fwd_impl(feats, mask_out, nbr_idx, weight, f_in, f_out,
                          stride, block_v, n_win, bad_frac, merged)


class ZwinPlan(NamedTuple):
    """Per-neighbor-map precompute, shared by every conv on that map.

    A stage's 2-3 SubM convs use the SAME neighbor map, so the window
    bases / rel offsets / overflow compaction need computing once per
    stage, not once per conv (round-5: the per-conv XLA glue, not the
    kernel matmuls, dominates the in-program cost)."""
    blk: jnp.ndarray       # (B, nb, 3) window base blocks
    rel: jnp.ndarray       # (B, S_out, 27) in-window offsets
    bad_ids: jnp.ndarray   # (B, n_bad_cap) compacted bad-block ids
    is_bad: jnp.ndarray    # (B, n_bad_cap) bool
    n_bad: jnp.ndarray     # () total bad blocks
    block_v: int
    n_win: int


def zwin_plan(nbr_idx: jnp.ndarray, s_in: int, block_v: int, n_win: int,
              bad_frac: float) -> ZwinPlan:
    """Window bases + overflow compaction for one neighbor map."""
    b = nbr_idx.shape[0]
    nb = nbr_idx.shape[1] // block_v
    blk, rel, bad_blk = _prepare(nbr_idx, s_in, block_v, n_win)
    n_bad_cap = max(1, min(nb, int(-(-nb * bad_frac // 1))))
    # compaction order: bad block ids first (index order), then good ids
    n_bad = bad_blk.sum()
    iota_nb = jnp.arange(nb, dtype=jnp.int32)[None]
    order = jnp.argsort(jnp.where(bad_blk, iota_nb, nb + iota_nb), axis=1)
    bad_ids = order[:, :n_bad_cap]                       # (B, nbc)
    is_bad = jnp.take_along_axis(bad_blk, bad_ids, axis=1)
    return ZwinPlan(blk.astype(jnp.int32), rel, bad_ids.astype(jnp.int32),
                    is_bad, n_bad, block_v, n_win)


def _zwin_run(feats, mask_out, nbr_idx, weight, f_in, f_out, stride,
              block_v, n_win, bad_frac, merged, plan=None, epilogue=None):
    """Shared zwin implementation.

    epilogue: None (raw conv, train path) or (inv_b, bias_b, lane_exp,
    act) — BN affine (L_out,) fp32 vectors + (B, S_out, L_out) lane
    multiplier fused into the kernel (eval serving path).
    """
    b, s_in, l_in = feats.shape
    cin, cout = weight.shape[1], weight.shape[2]
    l_out = f_out * cout
    s_out = nbr_idx.shape[1]
    nb = s_out // block_v
    win_rows = n_win * block_v
    dtype = feats.dtype

    # static band analysis + per-tap weight slices (full L_out columns,
    # zeros outside the tap's zo band ride the MXU for free)
    bands = z_bands(f_in, f_out, stride)
    w_e = expand_weight(weight, f_in, f_out, stride).astype(dtype)
    taps, w_slices, w_off = [], [], 0
    for t in range(27):
        ds = t % 3
        dx = t // 9
        zi_lo, nzi = bands[ds]
        if nzi == 0:
            continue
        taps.append((t, dx, zi_lo, nzi, w_off))
        w_slices.append(w_e[t, zi_lo * cin:(zi_lo + nzi) * cin, :])
        w_off += nzi * cin
    w_cat = jnp.concatenate(w_slices, axis=0)            # (w_off, L_out)

    if plan is None:
        plan = zwin_plan(nbr_idx, s_in, block_v, n_win, bad_frac)
    blk, rel = plan.blk, plan.rel
    bad_ids, is_bad, n_bad = plan.bad_ids, plan.is_bad, plan.n_bad
    n_bad_cap = bad_ids.shape[1]
    n_pad_blocks = -(-s_in // block_v) + n_win
    pad_rows = n_pad_blocks * block_v - s_in
    feats_pad = jnp.concatenate(
        [feats, jnp.zeros((b, pad_rows, l_in), dtype)], axis=1)

    epi = epilogue is not None
    if epi:
        inv_b, bias_b, lane_exp, act = epilogue
        inv_b = inv_b.reshape(1, l_out).astype(jnp.float32)
        bias_b = bias_b.reshape(1, l_out).astype(jnp.float32)
        lane_exp = lane_exp.astype(dtype)

    def win_spec(dx, j):
        return pl.BlockSpec(
            (1, block_v, l_in),
            lambda bi, i, blk_ref, dx=dx, j=j:
                (bi, blk_ref[bi, i, dx] + j, 0))

    epi_specs = []
    if epi:
        epi_specs = [
            pl.BlockSpec((1, l_out), lambda bi, i, blk_ref: (0, 0)),
            pl.BlockSpec((1, l_out), lambda bi, i, blk_ref: (0, 0)),
            pl.BlockSpec((1, block_v, l_out),
                         lambda bi, i, blk_ref: (bi, i, 0))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nb),
        in_specs=(
            [pl.BlockSpec((1, block_v, 27),
                          lambda bi, i, blk_ref: (bi, i, 0))]
            + [win_spec(dx, j) for dx in range(3) for j in range(n_win)]
            + [pl.BlockSpec(w_cat.shape,
                            lambda bi, i, blk_ref: (0, 0))]
            + epi_specs),
        out_specs=pl.BlockSpec((1, block_v, l_out),
                               lambda bi, i, blk_ref: (bi, i, 0)),
    )
    if merged and not epi:
        kernel = _make_kernel_merged(taps, n_win, cin, block_v, win_rows,
                                     dtype)
    else:
        kernel = _make_kernel(taps, n_win, cin, block_v, win_rows, dtype,
                              epi=epi, act=epi and act)

    def finish(y_rows, row_mask, rows_nbr=None, lane_rows=None):
        """XLA-side epilogue for the zband-computed rows."""
        if not epi:
            return y_rows
        y = y_rows.astype(jnp.float32) * inv_b[None] + bias_b[None]
        if act:
            y = jnp.maximum(y, 0.0)
        if lane_rows is not None:
            y = y * lane_rows.astype(jnp.float32)
        return jnp.where(row_mask[..., None], y, 0.0).astype(dtype)

    def pallas_then_patch(operands):
        feats_pad, rel, blk, w_cat = operands
        wins = [feats_pad] * (3 * n_win)
        extra = (blk, rel, *wins, w_cat)
        if epi:
            extra = extra + (inv_b, bias_b, lane_exp)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, s_out, l_out), dtype),
            interpret=_use_interpret(),
        )(*extra)
        # exact recompute of the (few) bad blocks: zband on the compacted
        # (n_bad_cap * Vb)-row problem, block-scattered over the output
        nbr_b = jnp.take_along_axis(
            nbr_idx.reshape(b, nb, block_v * 27), bad_ids[:, :, None],
            axis=1).reshape(b, n_bad_cap * block_v, 27)
        mask_b = jnp.broadcast_to(
            is_bad[:, :, None],
            (b, n_bad_cap, block_v)).reshape(b, n_bad_cap * block_v)
        corr = zband_conv_apply(feats, mask_b, nbr_b, weight,
                                f_in, f_out, stride)
        if epi:
            lane_b = jnp.take_along_axis(
                lane_exp.reshape(b, nb, block_v * l_out),
                bad_ids[:, :, None], axis=1).reshape(
                    b, n_bad_cap * block_v, l_out)
            corr = finish(corr, mask_b, lane_rows=lane_b)
        ids_safe = jnp.where(is_bad, bad_ids, nb)        # drop pad slots
        out3 = out.reshape(b, nb, block_v * l_out)
        corr3 = corr.reshape(b, n_bad_cap, block_v * l_out)
        out3 = out3.at[jnp.arange(b)[:, None], ids_safe].set(
            corr3, mode='drop')
        return out3.reshape(b, s_out, l_out)

    def xla_path(operands):
        del operands
        y = zband_conv_apply(feats, jnp.ones_like(mask_out), nbr_idx,
                             weight, f_in, f_out, stride)
        return finish(y, jnp.ones_like(mask_out),
                      lane_rows=lane_exp if epi else None)

    out = jax.lax.cond(n_bad > n_bad_cap, xla_path, pallas_then_patch,
                       (feats_pad, rel, blk, w_cat))
    return jnp.where(mask_out[..., None], out, 0)


def zwin_conv_infer(feats: jnp.ndarray, mask_out: jnp.ndarray,
                    nbr_idx: jnp.ndarray, weight: jnp.ndarray,
                    f_in: int, f_out: int, stride: int,
                    block_v: int = 128, n_win: int = 4,
                    bad_frac: float = 0.125, merged: bool = False,
                    plan: ZwinPlan | None = None,
                    affine=None, act: bool = True,
                    lane_exp: jnp.ndarray | None = None) -> jnp.ndarray:
    """Eval-only zwin conv with the BN affine + ReLU + lane mask fused
    into the kernel epilogue and an optional precomputed per-stage plan.

    affine: (inv_b, bias_b) — (L_out,) fp32 vectors with
    y = conv * inv_b + bias_b == the eval-mode MaskedBatchNorm affine;
    lane_exp: (B, S_out, L_out) lane multiplier (expand_lane_mask).
    No custom VJP: training uses zwin_conv_apply (unfused BN stats).
    """
    b, s_in, l_in = feats.shape
    cin = weight.shape[1]
    s_out = nbr_idx.shape[1]
    if (s_out % block_v != 0 or s_in < block_v or l_in != f_in * cin):
        y = zband_conv_apply(feats, mask_out, nbr_idx, weight,
                             f_in, f_out, stride)
        if affine is not None:
            yf = y.astype(jnp.float32) * affine[0][None, None, :] \
                + affine[1][None, None, :]
            if act:
                yf = jnp.maximum(yf, 0.0)
            if lane_exp is not None:
                yf = yf * lane_exp.astype(jnp.float32)
            y = jnp.where(mask_out[..., None], yf, 0.0).astype(feats.dtype)
        return y
    epilogue = None
    if affine is not None:
        epilogue = (affine[0], affine[1], lane_exp, act)
    return _zwin_run(feats, mask_out, nbr_idx, weight, f_in, f_out, stride,
                     block_v, n_win, bad_frac, merged, plan=plan,
                     epilogue=epilogue)


def _zwin_fwd_impl(feats, mask_out, nbr_idx, weight, f_in, f_out, stride,
                   block_v, n_win, bad_frac, merged=False):
    return _zwin_run(feats, mask_out, nbr_idx, weight, f_in, f_out, stride,
                     block_v, n_win, bad_frac, merged)


def _zwin_fwd(feats, mask_out, nbr_idx, weight, f_in, f_out, stride,
              block_v, n_win, bad_frac, merged):
    out = _zwin_fwd_impl(feats, mask_out, nbr_idx, weight, f_in, f_out,
                         stride, block_v, n_win, bad_frac, merged)
    return out, (feats, mask_out, nbr_idx, weight)


def _zwin_bwd(f_in, f_out, stride, block_v, n_win, bad_frac, merged,
              res, g):
    """Backward = VJP of the numerically identical XLA zband path."""
    feats, mask_out, nbr_idx, weight = res
    _, vjp = jax.vjp(
        lambda f, w: zband_conv_apply(f, mask_out, nbr_idx, w,
                                      f_in, f_out, stride),
        feats, weight)
    d_feats, d_weight = vjp(g)
    return d_feats, None, None, d_weight


_zwin_custom.defvjp(_zwin_fwd, _zwin_bwd)
