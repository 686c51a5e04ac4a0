#!/usr/bin/env bash
# Rebuild the in-env training corpora (datasets/ is gitignored and the
# workspace is reset between rounds). Produces:
#   datasets/train_sub2  — the round-3 corpus (753 256^2 sub-images from
#                          the 7 in-env natural sources + no-upscale
#                          Lanczos pyramid). KEPT ONLY for reproducing the
#                          r3/r4 A/B runs: round-4 analysis showed 73% of
#                          it is crops of sampling.png — a paper DIAGRAM
#                          (white background, blur blobs, mosaics, text)
#                          — which skews training badly.
#   datasets/train_sub3  — the round-4 corpus: 6 genuine natural sources
#                          (sampling.png dropped) + Lanczos pyramid
#                          (205 sub-images, duplicated x2 for sampling
#                          weight) + 400 dead-leaves synthetic images
#                          with colors drawn from the natural sources
#                          (`prepare_data synthetic`).
#   datasets/val/{gt,lrx4} — 4x 240^2 held-out 0892 crops + MATLAB-bicubic
#                          x4 LR (the r3/r4 configs' val set)
# Usage: bash scripts/build_corpus.sh   (from the repo root)
set -euo pipefail

mkdir -p datasets/src_train datasets/src6 datasets/val_src
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

# r3 corpus (reproduction only — see header)
python -m gsasr_tpu.cli.prepare_data multiscale --src datasets/src_train \
    --dst datasets/src_train_ms --shortest-edge 256
cp datasets/src_train/* datasets/src_train_ms/
python -m gsasr_tpu.cli.prepare_data extract-subimages \
    --src datasets/src_train_ms --dst datasets/train_sub2 \
    --crop 256 --step 96

# r4 corpus
cp datasets/src_train/0846x4.png datasets/src_train/0873x4.png \
   datasets/src_train/tree.png datasets/src_train/china.jpg \
   datasets/src_train/flower.jpg datasets/src_train/grace_hopper.jpg \
   datasets/src6/
python -m gsasr_tpu.cli.prepare_data multiscale --src datasets/src6 \
    --dst datasets/src6_ms --shortest-edge 256
cp datasets/src6/* datasets/src6_ms/
python -m gsasr_tpu.cli.prepare_data extract-subimages \
    --src datasets/src6_ms --dst datasets/train_nat3 --crop 256 --step 96 \
    --workers 2
python -m gsasr_tpu.cli.prepare_data synthetic --dst datasets/train_dl3 \
    --n 400 --palette-src datasets/src6 --workers 2
mkdir -p datasets/train_sub3
cp datasets/train_dl3/* datasets/train_sub3/
for f in datasets/train_nat3/*; do
    b=$(basename "$f")
    cp "$f" "datasets/train_sub3/$b"
    cp "$f" "datasets/train_sub3/dup_$b"
done

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

echo "r3 corpus: $(ls datasets/train_sub2 | wc -l) sub-images (train_sub2)"
echo "r4 corpus: $(ls datasets/train_sub3 | wc -l) sub-images (train_sub3)"

# r5 corpus (v3): natural x3 + 4 synthetic families (dead-leaves kept from
# train_dl3, plus text / procedural-texture / piecewise-smooth composites
# — see `prepare_data synthetic --family`). ~45% natural by count.
python -m gsasr_tpu.cli.prepare_data synthetic --dst datasets/train_tx5 \
    --n 140 --family text --palette-src datasets/src6 --workers 4
python -m gsasr_tpu.cli.prepare_data synthetic --dst datasets/train_pt5 \
    --n 140 --family texture --palette-src datasets/src6 --workers 4
python -m gsasr_tpu.cli.prepare_data synthetic --dst datasets/train_pc5 \
    --n 180 --family composite --palette-src datasets/src6 --workers 4
mkdir -p datasets/train_sub4
ls datasets/train_dl3 | head -300 | while read f; do
    cp "datasets/train_dl3/$f" datasets/train_sub4/; done
cp datasets/train_tx5/* datasets/train_pt5/* datasets/train_pc5/* \
   datasets/train_sub4/
for f in datasets/train_nat3/*; do
    b=$(basename "$f")
    cp "$f" "datasets/train_sub4/$b"
    cp "$f" "datasets/train_sub4/dup_$b"
    cp "$f" "datasets/train_sub4/dup2_$b"
done
echo "r5 corpus: $(ls datasets/train_sub4 | wc -l) sub-images (train_sub4)"

# multi-scale val LR sets for the endgame battery (x2/x3/x6.5)
python - <<'EOF2'
import cv2, os
import numpy as np
from gsasr_tpu.data.matlab_resize import imresize_new
for s, name in [(2, 'lrx2'), (3, 'lrx3'), (6.5, 'lrx65')]:
    os.makedirs(f'datasets/val/{name}', exist_ok=True)
    for f in sorted(os.listdir('datasets/val/gt')):
        img = cv2.imread(f'datasets/val/gt/{f}').astype(np.float32)/255.0
        lr = imresize_new(img, 1/s, 1/s)
        cv2.imwrite(f'datasets/val/{name}/{f}',
                    (np.clip(lr,0,1)*255).round().astype(np.uint8))
print('val multi-scale LR sets written')
EOF2
