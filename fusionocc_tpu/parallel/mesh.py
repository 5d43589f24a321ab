"""Device mesh / sharding setup.

The reference scales with torch.distributed.launch + DDP over NCCL
(tools/dist_train.sh:11-19); here parallelism is a jax.sharding.Mesh and
NamedShardings: parameters replicated, batch sharded over the 'data' axis,
gradient reduction and BatchNorm statistics handled by XLA collectives over
ICI/DCN.  Multi-host initialization goes through jax.distributed.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (no-op on a single host). The jax-native replacement
    for the reference's NNODES/NODE_RANK/MASTER_ADDR launcher env."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ('data',))


def hybrid_mesh(n_data: int, n_spatial: int,
                devices: Optional[Sequence] = None) -> Mesh:
    """2-D (data, spatial) mesh: batch over 'data', cameras + BEV grid over
    'spatial' (model parallelism for the camera branch and the dense 3D
    encoder — XLA partitions the convolutions with halo exchanges)."""
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_spatial
    arr = np.asarray(devices[:n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(arr, ('data', 'spatial'))


def constrain(x, mesh: Optional[Mesh], spec: P):
    """with_sharding_constraint that no-ops without a mesh or when the spec
    names axes the mesh doesn't have."""
    if mesh is None:
        return x
    names = set()
    for entry in spec:
        if entry is None:
            continue
        for n in (entry if isinstance(entry, tuple) else (entry,)):
            names.add(n)
    if not names.issubset(set(mesh.axis_names)):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P('data'))
