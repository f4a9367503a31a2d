#!/usr/bin/env bash
# Multi-host training launcher (ref contract: tools/dist_train.sh).
# Single-controller JAX: run THIS SAME command on every host of the slice;
# jax.distributed.initialize() discovers the cluster from the TPU runtime
# environment. No torch.distributed.launch / process-per-GPU matrix.
CONFIG=$1
shift
python "$(dirname "$0")"/train.py "$CONFIG" --multi-host --seed 42 \
    --deterministic "$@"
