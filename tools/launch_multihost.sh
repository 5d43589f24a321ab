#!/usr/bin/env bash
# Multi-host training launcher — the analog of the reference's
# tools/dist_train.sh / tools/slurm_train.sh (NNODES/NODE_RANK/MASTER_ADDR
# over torch.distributed) re-expressed for jax.distributed: ONE process per
# host, every process runs the same command, process 0's address is the
# coordinator.  On TPU pods the per-host device set is discovered by the
# runtime; the training step is jitted over the global mesh
# (fusionocc_tpu/parallel/mesh.py) and XLA moves gradients/BN stats over
# ICI/DCN.
#
# Slurm (preferred; variables are read automatically by tools/train.py):
#   srun --ntasks="$NUM_HOSTS" --ntasks-per-node=1 \
#     bash tools/launch_multihost.sh --ann-file ... [train.py args...]
#
# Manual two-host example:
#   host0$ FUSIONOCC_COORDINATOR=host0:8476 FUSIONOCC_NUM_PROCESSES=2 \
#          FUSIONOCC_PROCESS_ID=0 bash tools/launch_multihost.sh --synthetic
#   host1$ FUSIONOCC_COORDINATOR=host0:8476 FUSIONOCC_NUM_PROCESSES=2 \
#          FUSIONOCC_PROCESS_ID=1 bash tools/launch_multihost.sh --synthetic
set -euo pipefail

# Under slurm, derive the coordinator from the first node of the allocation
# unless the caller pinned one explicitly.
if [[ -z "${FUSIONOCC_COORDINATOR:-}" && -n "${SLURM_JOB_NODELIST:-}" ]]; then
  first_node=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
  export FUSIONOCC_COORDINATOR="${first_node}:${FUSIONOCC_PORT:-8476}"
fi

exec python "$(dirname "$0")/train.py" "$@"
