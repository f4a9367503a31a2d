#!/usr/bin/env bash
# SLURM training launcher (ref contract: tools/slurm_train.sh).
#
# TPU-native shape: ONE srun task per TPU-VM host (not one per chip —
# a single JAX process drives all local chips), and
# jax.distributed.initialize() autodetects the coordinator from the
# SLURM_* environment (SLURM_JOB_NODELIST / SLURM_PROCID / SLURM_NTASKS),
# so no MASTER_ADDR/PORT plumbing is needed.
#
# Usage: GPUS_PER_NODE is kept as an env knob name-compatible with the
# reference but means "TPU-VM hosts per node is always 1"; use NODES.
#   NODES=4 tools/slurm_train.sh <partition> <config> [train.py args...]
set -x

PARTITION=$1
CONFIG=$2
JOB_NAME=${JOB_NAME:-segdistill}
NODES=${NODES:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-96}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:3}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --nodes=${NODES} \
    --ntasks=${NODES} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")"/train.py ${CONFIG} --multi-host \
        --seed 42 --deterministic ${PY_ARGS}
