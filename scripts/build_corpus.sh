#!/usr/bin/env bash
# Rebuild the in-env training corpus (datasets/ is gitignored and the
# workspace is reset between rounds). Produces:
#   datasets/train_sub2  — 256^2 training sub-images (≈750) from the 7
#                          natural source images available in-image,
#                          expanded with a no-upscale Lanczos pyramid
#   datasets/val/{gt,lrx4} — 4x 240^2 held-out 0892 crops + MATLAB-bicubic
#                          x4 LR (the r3 config's val set)
# Usage: bash scripts/build_corpus.sh   (from the repo root)
set -euo pipefail

mkdir -p datasets/src_train datasets/val_src
cp /root/reference/assets/0846x4.png /root/reference/assets/0873x4.png \
   /root/reference/assets/tree.png /root/reference/assets/sampling.png \
   datasets/src_train/
cp /opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/sample_data/grace_hopper.jpg \
   datasets/src_train/grace_hopper.jpg
cp /opt/venv/lib/python3.12/site-packages/sklearn/datasets/images/flower.jpg \
   datasets/src_train/flower.jpg
cp /opt/venv/lib/python3.12/site-packages/sklearn/datasets/images/china.jpg \
   datasets/src_train/china.jpg
cp /root/reference/assets/0892x4.png datasets/val_src/

python -m gsasr_tpu.cli.prepare_data multiscale --src datasets/src_train \
    --dst datasets/src_train_ms --shortest-edge 256
cp datasets/src_train/* datasets/src_train_ms/
python -m gsasr_tpu.cli.prepare_data extract-subimages \
    --src datasets/src_train_ms --dst datasets/train_sub2 \
    --crop 256 --step 96

python - <<'EOF'
import cv2, os, random
import numpy as np
from gsasr_tpu.data.matlab_resize import imresize_new
img = cv2.imread('datasets/val_src/0892x4.png')
rng = random.Random(0)
os.makedirs('datasets/val/gt', exist_ok=True)
os.makedirs('datasets/val/lrx4', exist_ok=True)
h, w = img.shape[:2]
for i in range(4):
    y = rng.randint(0, h-240); x = rng.randint(0, w-240)
    crop = img[y:y+240, x:x+240]
    cv2.imwrite(f'datasets/val/gt/0892_c{i}.png', crop)
    lr = imresize_new(crop.astype(np.float32)/255.0, 0.25, 0.25)
    cv2.imwrite(f'datasets/val/lrx4/0892_c{i}.png',
                (np.clip(lr, 0, 1)*255).round().astype(np.uint8))
print('val written:', sorted(os.listdir('datasets/val/gt')))
EOF

echo "corpus: $(ls datasets/train_sub2 | wc -l) train sub-images"
