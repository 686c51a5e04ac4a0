#!/bin/bash
# Serialized TPU job runner for the single-tenant axon tunnel.
# Usage: scripts/tpu_run.sh <logfile> <python-script> [args...]
# - flock-serialized (other TPU jobs wait)
# - the tunnel occasionally wedges a client on a futex mid-compile; each
#   attempt gets a hard timeout and is retried — the persistent JAX
#   compilation cache makes retries resume cheaply.
set -u
LOG="$1"; shift
LOCK=/tmp/gsasr_tpu.lock
ATTEMPT_TIMEOUT=${TPU_RUN_TIMEOUT:-600}
RETRIES=${TPU_RUN_RETRIES:-3}
exec 9>"$LOCK"
if ! flock -w 2400 9; then
  echo "tpu_run: timed out waiting for lock" >&2
  exit 1
fi
for i in $(seq 1 "$RETRIES"); do
  sleep 15   # let a previous client's claim clear
  echo "[tpu_run attempt $i]" >> "$LOG"
  timeout --signal=KILL "$ATTEMPT_TIMEOUT" \
    env PYTHONPATH=/root/repo:${PYTHONPATH:-} python "$@" >> "$LOG" 2>&1
  rc=$?
  echo "[tpu_run attempt $i exit $rc]" >> "$LOG"
  if [ $rc -eq 0 ]; then exit 0; fi
  [ $rc -ne 137 ] && exit $rc   # real failure, don't retry
done
exit 137
