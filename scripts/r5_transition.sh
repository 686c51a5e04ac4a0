#!/usr/bin/env bash
# r5 orchestration: wait for the flagship trainer to exit, run the endgame
# battery on the idle chip, then launch the Enhanced-family arm with a
# total_iter budget fitted to the remaining wall-clock.
# Usage: nohup bash scripts/r5_transition.sh <flagship_pid> <deadline_epoch> &
set -uo pipefail
PID=${1:?flagship pid}
DEADLINE=${2:?unix epoch by which the enhanced run must STOP}

while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[transition] flagship exited at $(date)"

CKPT=$(ls -d experiments/r5_edsr_fp32_v3/checkpoints/*/ 2>/dev/null \
       | grep -E '/[0-9]+/$' | sort -t/ -k4 -n | tail -1)
CKPT=${CKPT%/}
echo "[transition] final ckpt: $CKPT"

bash scripts/final_eval_r5.sh "$CKPT" 2>&1 | grep -v -i warning
echo "[transition] battery done at $(date)"

# Enhanced budget: assume ~0.62 s/iter + ~120 s/2k-iter val block; leave
# 10 min of slack before the deadline.
NOW=$(date +%s)
AVAIL=$(( DEADLINE - NOW - 600 ))
ITERS=$(( AVAIL * 100 / 65 ))          # 0.65 s/iter effective
for CAND in 18000 16000 14000 12000 10000 8000 6000 4000; do
  if [ "$ITERS" -ge "$CAND" ]; then ITERS=$CAND; break; fi
done
if [ "$ITERS" -lt 4000 ]; then
  echo "[transition] not enough time for an enhanced run ($AVAIL s)"; exit 0
fi
M1=$(( ITERS / 2 )); M2=$(( ITERS * 8 / 10 ))
M3=$(( ITERS * 9 / 10 )); M4=$(( ITERS * 95 / 100 ))
echo "[transition] launching enhanced run: total_iter=$ITERS"
# Supervisor loop: the axon host-side transfer buffers leak ~6 MB/iter
# (BENCH_NOTES r5), so long runs can die by OOM; --auto_resume restarts
# from the last checkpoint with a fresh process.
(
  while true; do
    python -m gsasr_tpu.cli.train -opt configs/train_edsr_enhanced_r5.yml \
      --auto_resume --force_yml train:total_iter=$ITERS \
      "train:scheduler:milestones=[$M1, $M2, $M3, $M4]" \
      >> logs/train_r5_enhanced.log 2>&1
    rc=$?
    [ $rc -eq 0 ] && break
    echo "[supervisor] trainer rc=$rc at $(date) — auto_resume restart" \
      >> logs/train_r5_enhanced.log
    [ "$(date +%s)" -ge "$DEADLINE" ] && break
    sleep 10
  done
) &
echo "pid $!" > logs/train_r5_enhanced.pid
echo "[transition] enhanced supervisor pid $(cat logs/train_r5_enhanced.pid)"
