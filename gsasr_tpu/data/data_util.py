"""Path-pairing helpers — equivalent of `basicsr/data/data_util.py`
(`paired_paths_from_folder` :200-231, `paired_paths_from_meta_info_file`
:156-197, `paired_paths_from_lmdb` :95-153).

Each function returns a list of dicts `{'<key>_path': ..., ...}` in the
BasicSR convention so dataset classes can consume either source.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List


def paired_paths_from_folder(folders, keys, filename_tmpl="{}") -> List[dict]:
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    input_names = set(os.listdir(input_folder))
    paths = []
    for gt_name in sorted(os.listdir(gt_folder)):
        basename, ext = os.path.splitext(gt_name)
        input_name = filename_tmpl.format(basename) + ext
        assert input_name in input_names, (
            f"{input_name} missing in {input_folder}")
        paths.append({
            f"{input_key}_path": os.path.join(input_folder, input_name),
            f"{gt_key}_path": os.path.join(gt_folder, gt_name),
        })
    return paths


def paired_paths_from_meta_info_file(folders, keys, meta_info_file,
                                     filename_tmpl="{}") -> List[dict]:
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    with open(meta_info_file) as f:
        gt_names = [line.strip().split(" ")[0] for line in f if line.strip()]
    paths = []
    for gt_name in gt_names:
        basename, ext = os.path.splitext(gt_name)
        input_name = filename_tmpl.format(basename) + ext
        paths.append({
            f"{input_key}_path": os.path.join(input_folder, input_name),
            f"{gt_key}_path": os.path.join(gt_folder, gt_name),
        })
    return paths


def paired_paths_from_lmdb(folders, keys) -> List[dict]:
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    if not (str(input_folder).endswith(".lmdb")
            and str(gt_folder).endswith(".lmdb")):
        raise ValueError("lmdb pairing requires both folders to be .lmdb")

    def read_keys(folder):
        with open(Path(folder) / "meta_info.txt") as f:
            return [line.split(".")[0] for line in f if line.strip()]

    input_keys = set(read_keys(input_folder))
    paths = []
    for k in sorted(read_keys(gt_folder)):
        assert k in input_keys, f"{k} missing in {input_folder}"
        paths.append({f"{input_key}_path": k, f"{gt_key}_path": k})
    return paths
