"""Path-pairing and sequence helpers — equivalent of
`basicsr/data/data_util.py`:

- `paired_paths_from_folder` (:200-231), `paired_paths_from_meta_info_file`
  (:156-197), `paired_paths_from_lmdb` (:95-153), `paths_from_folder`
  (:234-246), `paths_from_lmdb` (:249-264);
- `read_img_seq` (:11-41) returning the TPU-idiomatic (T, H, W, C) RGB
  float32 stack, `generate_frame_indices` (:43-93);
- `generate_gaussian_kernel` (:267-282) and `duf_downsample` (:285-315) —
  the latter as a jittable jax depthwise conv on NHWC frames.

Each pairing function returns a list of dicts `{'<key>_path': ...}` in the
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


def paths_from_folder(folder) -> List[str]:
    """All image paths under a folder (`data_util.py:234-246`)."""
    return [os.path.join(folder, name) for name in sorted(os.listdir(folder))]


def paths_from_lmdb(folder) -> List[str]:
    """Keys of an lmdb dataset via its meta_info.txt (`data_util.py:249-264`)."""
    if not str(folder).endswith(".lmdb"):
        raise ValueError(f"Folder {folder} should in lmdb format.")
    with open(Path(folder) / "meta_info.txt") as f:
        return [line.split(".")[0] for line in f if line.strip()]


def read_img_seq(path, require_mod_crop: bool = False, scale: int = 1,
                 return_imgname: bool = False):
    """Read a folder (or explicit list) of frames into a (T, H, W, C) RGB
    float32 stack in [0, 1] (`data_util.py:11-41`; the reference returns a
    (T, C, H, W) torch tensor — NHWC is this framework's device layout)."""
    import numpy as np

    from gsasr_tpu.data.datasets import imread_rgb
    from gsasr_tpu.data.transforms import mod_crop

    img_paths = path if isinstance(path, list) else [
        os.path.join(path, n) for n in sorted(os.listdir(path))]
    imgs = [imread_rgb(p) for p in img_paths]
    if require_mod_crop:
        imgs = [mod_crop(img, scale) for img in imgs]
    stack = np.stack(imgs, axis=0).astype(np.float32)
    if return_imgname:
        return stack, [os.path.splitext(os.path.basename(p))[0]
                       for p in img_paths]
    return stack


def generate_frame_indices(crt_idx: int, max_frame_num: int, num_frames: int,
                           padding: str = "reflection") -> List[int]:
    """Center-window frame indices with border padding
    (`data_util.py:43-93`): replicate / reflection / reflection_circle /
    circle."""
    assert num_frames % 2 == 1, "num_frames should be an odd number."
    assert padding in ("replicate", "reflection", "reflection_circle",
                       "circle"), f"Wrong padding mode: {padding}."
    last = max_frame_num - 1
    pad = num_frames // 2
    indices = []
    for i in range(crt_idx - pad, crt_idx + pad + 1):
        if i < 0:
            idx = {"replicate": 0, "reflection": -i,
                   "reflection_circle": crt_idx + pad - i,
                   "circle": num_frames + i}[padding]
        elif i > last:
            idx = {"replicate": last, "reflection": 2 * last - i,
                   "reflection_circle": crt_idx - pad - (i - last),
                   "circle": i - num_frames}[padding]
        else:
            idx = i
        indices.append(idx)
    return indices


def generate_gaussian_kernel(kernel_size: int = 13, sigma: float = 1.6):
    """Gaussian filter as a smoothed dirac (`data_util.py:267-282`)."""
    import numpy as np
    from scipy.ndimage import gaussian_filter

    kernel = np.zeros((kernel_size, kernel_size))
    kernel[kernel_size // 2, kernel_size // 2] = 1
    return gaussian_filter(kernel, sigma)


def duf_downsample(x, kernel_size: int = 13, scale: int = 4):
    """DUF-style Gaussian-blur downsampling (`data_util.py:285-315`) on
    NHWC (or (B, T, H, W, C)) jax frames: reflect-pad, depthwise conv with
    a sigma=0.4*scale Gaussian at stride `scale`, trim 2 border pixels.
    Jittable (static kernel_size/scale)."""
    import jax.numpy as jnp
    from jax import lax

    assert scale in (2, 3, 4), f"Only support scale (2, 3, 4), got {scale}."
    orig_ndim = x.ndim
    if x.ndim == 5:  # (B, T, H, W, C) -> fold T into batch
        b, t = x.shape[:2]
        x = x.reshape(b * t, *x.shape[2:])
    elif x.ndim == 4:
        b, t = x.shape[0], None
    else:
        raise ValueError(f"expected 4 or 5 dims, got {x.ndim}")

    pad = kernel_size // 2 + scale * 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    c = x.shape[-1]
    k = jnp.asarray(generate_gaussian_kernel(kernel_size, 0.4 * scale),
                    x.dtype)
    # depthwise: (H, W, 1, C) filter with feature_group_count=C
    filt = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    out = lax.conv_general_dilated(
        x, filt, window_strides=(scale, scale), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    out = out[:, 2:-2, 2:-2, :]
    if orig_ndim == 5:
        out = out.reshape(b, t, *out.shape[1:])
    return out
