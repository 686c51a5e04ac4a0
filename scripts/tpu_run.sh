#!/bin/bash
# Serialized TPU job runner for the single-tenant axon tunnel.
# Usage: scripts/tpu_run.sh <logfile> <python-script> [args...]
# - waits for the lock (other TPU jobs) with a global timeout
# - appends repo to PYTHONPATH without clobbering /root/.axon_site
set -u
LOG="$1"; shift
LOCK=/tmp/gsasr_tpu.lock
exec 9>"$LOCK"
if ! flock -w 1800 9; then
  echo "tpu_run: timed out waiting for lock" >&2
  exit 1
fi
# small settle delay — a freshly-exited client's claim needs a beat to clear
sleep 5
PYTHONPATH=/root/repo:${PYTHONPATH:-} python "$@" > "$LOG" 2>&1
rc=$?
echo "[tpu_run exit $rc]" >> "$LOG"
exit $rc
