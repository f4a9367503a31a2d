#!/usr/bin/env bash
# SLURM evaluation launcher (ref contract: tools/slurm_test.sh).
# Same shape as slurm_train.sh: one srun task per TPU-VM host,
# jax.distributed.initialize() autodetects the cluster from SLURM_* env.
#   NODES=4 tools/slurm_test.sh <partition> <config> <checkpoint> [args...]
set -x

PARTITION=$1
CONFIG=$2
CHECKPOINT=$3
JOB_NAME=${JOB_NAME:-segdistill-eval}
NODES=${NODES:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-96}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:4}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --nodes=${NODES} \
    --ntasks=${NODES} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")"/test.py ${CONFIG} ${CHECKPOINT} \
        --multi-host ${PY_ARGS}
