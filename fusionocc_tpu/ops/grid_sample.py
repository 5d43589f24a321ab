"""Bilinear grid sampling via XLA gathers (F.grid_sample equivalent).

Used for the temporal BEV alignment path (reference: fusion_occ.py:414-428
``shift_feature``) and the stereo cost-volume warp (view_transformer.py:609).
Matches torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros') semantics for both align_corners settings.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(img: jnp.ndarray, grid: jnp.ndarray,
                   align_corners: bool = True) -> jnp.ndarray:
    """Sample (B, C, H, W) at normalized grid (B, Ho, Wo, 2) of (x, y).

    Grid coords in [-1, 1]; out-of-range samples read zeros.
    """
    B, C, H, W = img.shape
    x, y = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (W - 1)
        fy = (y + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((x + 1.0) * W - 1.0) * 0.5
        fy = ((y + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    def tap(xi, yi):
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = img.reshape(B, C, H * W)
        idx = (yc * W + xc).reshape(B, -1)                    # (B, Ho*Wo)
        vals = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
        vals = vals.reshape(B, C, *xi.shape[1:])
        return jnp.where(ok[:, None], vals, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    wx = wx[:, None]
    wy = wy[:, None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = True
                    ) -> jnp.ndarray:
    """Bilinear up/downsample of (B, C, H, W) — torch nn.Upsample equivalent."""
    B, C, H, W = x.shape
    Ho, Wo = out_hw
    if align_corners:
        ys = jnp.linspace(0.0, H - 1.0, Ho)
        xs = jnp.linspace(0.0, W - 1.0, Wo)
    else:
        ys = (jnp.arange(Ho) + 0.5) * (H / Ho) - 0.5
        xs = (jnp.arange(Wo) + 0.5) * (W / Wo) - 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing='ij')
    # express as normalized align_corners grid and reuse the sampler
    nx = gx / max(W - 1, 1) * 2.0 - 1.0
    ny = gy / max(H - 1, 1) * 2.0 - 1.0
    grid = jnp.broadcast_to(jnp.stack([nx, ny], -1)[None], (B, Ho, Wo, 2))
    return grid_sample_2d(x, grid, align_corners=True)


def resize_trilinear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Trilinear ×scale upsample of (B, C, D, H, W), align_corners=True.

    Matches torch nn.Upsample(scale_factor=scale, mode='trilinear',
    align_corners=True) for integer scale (used by LSSFPN3D,
    necks/lss_fpn.py:130-133). Separable: interpolate one axis at a time.
    """
    def up_axis(arr, axis, n_out):
        n_in = arr.shape[axis]
        if n_in == 1:
            reps = [1] * arr.ndim
            reps[axis] = n_out
            return jnp.tile(arr, reps)
        pos = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (pos - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = n_out
        w = w.reshape(shape)
        return a * (1 - w) + b * w

    B, C, D, H, W = x.shape
    x = up_axis(x, 2, D * scale)
    x = up_axis(x, 3, H * scale)
    x = up_axis(x, 4, W * scale)
    return x
