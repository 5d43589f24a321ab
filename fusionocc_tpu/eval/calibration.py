"""Confidence calibration: temperature scaling + uncertainty maps.

Re-implements the reference's calibration toolchain
(fusion_occ.py:1497-1602, tools/export_occ_logits.py,
tools/train_temperature.py): export per-voxel logits, fit a scalar
temperature by NLL on masked voxels, apply it at inference, and derive
MSP / entropy uncertainty maps.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def nll_at_temperature(logits: jnp.ndarray, labels: jnp.ndarray,
                       mask: Optional[jnp.ndarray], temperature: float
                       ) -> jnp.ndarray:
    """Mean masked NLL of temperature-scaled logits."""
    logp = jax.nn.log_softmax(
        logits.astype(jnp.float32) / temperature, axis=-1)
    flat_lp = logp.reshape(-1, logits.shape[-1])
    flat_lbl = labels.reshape(-1).astype(jnp.int32)
    nll = -jnp.take_along_axis(flat_lp, flat_lbl[:, None], axis=1)[:, 0]
    if mask is not None:
        w = mask.reshape(-1).astype(jnp.float32)
        return jnp.sum(nll * w) / jnp.maximum(1.0, jnp.sum(w))
    return jnp.mean(nll)


def fit_temperature(logits, labels, mask=None,
                    lo: float = 0.05, hi: float = 10.0,
                    iters: int = 60) -> float:
    """Scalar temperature minimizing masked NLL (golden-section search).

    Equivalent of tools/train_temperature.py's NLL fit; the objective is
    unimodal in log-temperature.
    """
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels)
    mask = jnp.asarray(mask) if mask is not None else None
    f = jax.jit(lambda t: nll_at_temperature(logits, labels, mask, t))

    phi = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = np.log(lo), np.log(hi)
    c, d = b - phi * (b - a), a + phi * (b - a)
    fc, fd = float(f(np.exp(c))), float(f(np.exp(d)))
    for _ in range(iters):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - phi * (b - a)
            fc = float(f(np.exp(c)))
        else:
            a, c, fc = c, d, fd
            d = a + phi * (b - a)
            fd = float(f(np.exp(d)))
    return float(np.exp((a + b) / 2.0))


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """Scaled probabilities (fusion_occ.py:1513-1515)."""
    return jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)


def uncertainty_maps(logits: jnp.ndarray,
                     temperature: float = 1.0) -> Dict[str, jnp.ndarray]:
    """MSP + normalized predictive entropy (fusion_occ.py:1555-1602)."""
    probs = apply_temperature(logits, temperature)
    msp = jnp.max(probs, axis=-1)
    p = jnp.clip(probs, 1e-12, 1.0)
    ent = -jnp.sum(p * jnp.log(p), axis=-1) / np.log(logits.shape[-1])
    return {'probs': probs, 'msp': msp, 'entropy': ent,
            'pred': jnp.argmax(probs, axis=-1).astype(jnp.uint8)}


def export_logits(model, variables, batch) -> Dict[str, np.ndarray]:
    """Dense logits + GT export for offline calibration
    (export_occ_logits flag, fusion_occ.py:1497-1511)."""
    out = model.apply(variables, batch, train=False)
    return {
        'logits': np.asarray(out['occ_logits'], np.float16),
        'voxel_semantics': np.asarray(batch.voxel_semantics),
        'mask_camera': np.asarray(batch.mask_camera),
    }
