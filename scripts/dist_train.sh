#!/usr/bin/env bash
# Multi-host training launcher — equivalent of
# TrainTestGSASR/scripts/dist_train.sh (torch.distributed.launch / NCCL).
#
# On a TPU pod slice, jax.distributed.initialize() discovers the topology
# from the TPU runtime, so every host simply runs the same command:
#   ./scripts/dist_train.sh <config.yml> [extra args...]
#
# Off-pod (e.g. CPU simulation or GPU clusters), set the standard JAX
# rendezvous variables first:
#   JAX_COORDINATOR_ADDRESS=host0:4321 JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i
if [ $# -lt 1 ]; then
  echo "usage: ./scripts/dist_train.sh [path to option file] [extra args...]"
  exit 1
fi
CONFIG=$1
PYTHONPATH="$(dirname "$0")/..:${PYTHONPATH:-}" \
python -m gsasr_tpu.cli.train -opt "$CONFIG" --multihost --auto_resume "${@:2}"
