#!/usr/bin/env bash
# Round-5 endgame battery (run after the flagship training stops):
#   1. bench.py (chunklist render + static perm + enhanced row come free)
#   2. render-path A/B on an otherwise-idle chip (the mid-training pause
#      A/B was invalidated by HBM/tunnel contention from the suspended
#      trainer — BENCH_NOTES r5)
#   3. multi-scale val of the final checkpoint vs bicubic
#   4. fused-vs-module training-step timing
# Usage: bash scripts/final_eval_r5.sh <orbax_step_dir>
set -uo pipefail
CKPT=${1:?orbax step dir}
echo "=== bench ==="
python bench.py
echo "=== render A/B (idle chip) ==="
timeout 1800 python scripts/r5_onchip_ab.py render "$CKPT"
echo "=== train-step A/B (fused decoder) ==="
timeout 1800 python scripts/r5_onchip_ab.py train
for S in 4 2 3 6.5; do
  LQ=lrx${S}; LQ=${LQ/6.5/65}
  echo "=== val x$S ==="
  timeout 900 python -m gsasr_tpu.cli.test --gt datasets/val/gt \
    --lq datasets/val/$LQ --scale $S --model EDSR --version paper \
    --orbax_ckpt "$CKPT" 2>/dev/null | tail -1
done
echo "=== bicubic baselines ==="
python - <<'EOF'
import cv2
import numpy as np
from gsasr_tpu.data.matlab_resize import imresize_new
from gsasr_tpu.metrics import calculate_psnr
import os
for s, name in [(4, 'lrx4'), (2, 'lrx2'), (3, 'lrx3'), (6.5, 'lrx65')]:
    ps = []
    for f in sorted(os.listdir('datasets/val/gt')):
        gt = cv2.imread(f'datasets/val/gt/{f}')
        lr = cv2.imread(f'datasets/val/{name}/{f}').astype(np.float32)/255.0
        up = imresize_new(lr, gt.shape[0]/lr.shape[0], gt.shape[1]/lr.shape[1])
        up = (np.clip(up,0,1)*255).round().astype(np.uint8)
        up = up[:gt.shape[0], :gt.shape[1]]
        ps.append(calculate_psnr(up, gt, crop_border=int(np.ceil(s)),
                                 test_y_channel=True))
    print(f"bicubic x{s}: {np.mean(ps):.4f} dB")
EOF
