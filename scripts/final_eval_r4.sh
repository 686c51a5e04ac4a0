#!/usr/bin/env bash
# Round-4 endgame battery (run after the flagship training stops):
#   1. bench.py (classed-render A/B vs the r3-era numbers comes free)
#   2. bench.py with the fused decoder fast path
#   3. multi-scale val of the final checkpoint (fp32 eval)
# Usage: bash scripts/final_eval_r4.sh <orbax_step_dir>
set -uo pipefail
CKPT=${1:?orbax step dir}
echo "=== bench (classed render) ==="
python bench.py
echo "=== bench (fused decoder) ==="
GSASR_FUSED_DECODER=1 python bench.py
echo "=== val x4 (fused decoder) ==="
GSASR_FUSED_DECODER=1 timeout 900 python -m gsasr_tpu.cli.test --gt datasets/val/gt \
  --lq datasets/val/lrx4 --scale 4 --model EDSR --version paper \
  --orbax_ckpt "$CKPT" 2>/dev/null | tail -1
for S in 4 2 3 6.5; do
  LQ=lrx${S/6.5/65}; LQ=${LQ/.}
  echo "=== val x$S ==="
  timeout 900 python -m gsasr_tpu.cli.test --gt datasets/val/gt \
    --lq datasets/val/$LQ --scale $S --model EDSR --version paper \
    --orbax_ckpt "$CKPT" 2>/dev/null | tail -1
done
