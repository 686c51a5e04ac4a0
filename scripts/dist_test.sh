#!/usr/bin/env bash
# Evaluation launcher — equivalent of TrainTestGSASR/scripts/dist_test.sh.
# Eval is single-host in the reference too (dist_validation runs on rank 0
# only, basicsr/models/gsasr_model.py:429-431); metrics are per-image, so
# multi-host adds nothing. This wrapper exists for CLI parity.
if [ $# -lt 2 ]; then
  echo "usage: ./scripts/dist_test.sh [--gt GT] [--lq LQ] [args...]"
  exit 1
fi
PYTHONPATH="$(dirname "$0")/..:${PYTHONPATH:-}" \
python -m gsasr_tpu.cli.test "$@"
