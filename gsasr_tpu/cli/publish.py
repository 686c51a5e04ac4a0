"""Model publishing CLI — equivalent of
`TrainTestGSASR/scripts/publish_models.py`.

The reference stamps each released ``.pth`` with the first 8 hex chars of
its sha256 (``name-<sha8>.pth``), warning when the checkpoint lacks the
``params``/``params_ema`` keys (`publish_models.py:8-37`). Ours does the
same for this framework's artifacts:

- ``.npz`` checkpoints (the converter output of
  `gsasr_tpu/utils/torch_convert.py`) — key check applies;
- arbitrary single files (hash of contents);
- orbax checkpoint *directories* — hashed via a sorted manifest of
  (relpath, file sha256) so the stamp is stable across filesystems.

Usage: ``python -m gsasr_tpu.cli.publish PATH [PATH ...] [--dry-run]``
"""

from __future__ import annotations

import argparse
import hashlib
import os
from pathlib import Path


def _sha256_file(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _sha256_dir(path: Path) -> str:
    h = hashlib.sha256()
    for p in sorted(path.rglob("*")):
        if p.is_file():
            h.update(str(p.relative_to(path)).encode())
            h.update(_sha256_file(p).encode())
    return h.hexdigest()


def check_param_keys(path: Path) -> bool:
    """True if the artifact exposes params/params_ema (npz only)."""
    if path.suffix != ".npz":
        return True
    import numpy as np
    with np.load(path, allow_pickle=False) as z:
        keys = z.files
    return any(k == "params" or k == "params_ema"
               or k.startswith(("params/", "params_ema/",
                                "params.", "params_ema.")) for k in keys)


def update_sha(paths, *, dry_run: bool = False, allow_missing_keys: bool
               = False):
    """Stamp/refresh ``-<sha8>`` suffixes; returns the final paths."""
    out = []
    for idx, p in enumerate(paths):
        path = Path(p)
        print(f"{idx + 1:03d}: Processing {path}")
        if not check_param_keys(path) and not allow_missing_keys:
            raise ValueError(
                f"{path.name} has no 'params'/'params_ema' key; pass "
                "--allow-missing-keys to publish anyway")
        sha = (_sha256_dir(path) if path.is_dir()
               else _sha256_file(path))[:8]
        stem, suffix = path.stem, path.suffix
        if "-" in stem:
            base, old_sha = stem.rsplit("-", 1)
            if old_sha == sha:
                out.append(path)
                continue
            final = path.with_name(f"{base}-{sha}{suffix}")
        else:
            final = path.with_name(f"{stem}-{sha}{suffix}")
        print(f"\tSave from {path} to {final}")
        if not dry_run:
            os.rename(path, final)
        out.append(final)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--allow-missing-keys", action="store_true")
    args = ap.parse_args()
    update_sha(args.paths, dry_run=args.dry_run,
               allow_missing_keys=args.allow_missing_keys)


if __name__ == "__main__":
    main()
