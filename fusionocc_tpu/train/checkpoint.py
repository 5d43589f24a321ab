"""Checkpointing: orbax save/restore of train state + PyTorch weight import.

Replaces the reference's mmengine CheckpointHook / --resume machinery
(configs/fusion_occ.py:411, tools/train.py:128-136) and its ad-hoc
checkpoint-repair paths (spconv layout conversion write_spconv2.py:42-60,
Swin official-key remap swin.py:32-84, test-time BN repair
fusion_occ.py:1335-1365) with:
  - orbax OCDBT checkpoints of {params, batch_stats, opt_state, ema, step}
  - a torch->flax importer (`import_torch_checkpoint`) that maps the
    reference's state_dict onto this model's parameter tree for parity
    testing once real checkpoints/data are available.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state, step: Optional[int] = None) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tag = os.path.join(path, f'step_{int(step if step is not None else state.step)}')
    ckptr.save(tag, state, force=True)
    ckptr.wait_until_finished()
    return tag


def restore_checkpoint(path: str, abstract_state):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_state)


def latest_checkpoint(root: str) -> Optional[str]:
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        if name.startswith('step_'):
            try:
                steps.append((int(name.split('_')[1]), name))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(root, max(steps)[1])


def import_torch_checkpoint(state_dict: Dict[str, np.ndarray], params,
                            batch_stats, cfg) -> Any:
    """Map a reference FusionOCC torch state_dict onto our parameter trees.

    Thin alias for train.torch_import.import_state_dict (the rule-table
    importer, golden-tested in tests/test_torch_golden.py).
    """
    from .torch_import import import_state_dict
    return import_state_dict(state_dict, params, batch_stats, cfg)
