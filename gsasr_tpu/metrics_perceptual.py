"""Perceptual similarity metrics: LPIPS, DISTS, FID.

Equivalents of the reference metric wrappers
(`basicsr/metrics/lpips.py:11-63`, `basicsr/metrics/dists.py:35-56`,
`basicsr/metrics/fid.py:10-88`). The reference delegates the networks to
the `lpips` / `DISTS_pytorch` / pretrained-Inception packages; those
pretrained weights are not bundled here (zero-egress image), so the
networks are implemented natively in flax and the weights load through
converters from the official checkpoints when the user supplies them
(`convert_lpips`, `convert_dists`). The distance math itself is fully
implemented and tested.

LPIPS network (richzhang/PerceptualSimilarity): scaling layer ->
AlexNet/VGG16 features at 5 taps -> channel-unit-normalize -> squared
diff -> learned 1x1 "lin" heads -> spatial mean -> sum over taps.

DISTS network (dingkeyan93/DISTS): VGG16 trunk with L2 (hann-windowed)
pooling; per-stage mean/cov statistics combined with learned alpha/beta
weights into structure+texture similarity.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------

LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)

# torchvision AlexNet `features` layout; taps after each ReLU.
_ALEX_CFG = [
    # (out_ch, kernel, stride, padding)
    (64, 11, 4, 2), "relu", "pool",
    (192, 5, 1, 2), "relu", "pool",
    (384, 3, 1, 1), "relu",
    (256, 3, 1, 1), "relu",
    (256, 3, 1, 1), "relu", "pool",
]
ALEX_CHNS = (64, 192, 384, 256, 256)

# VGG16 taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512]
VGG16_CHNS = (64, 128, 256, 512, 512)
_VGG16_TAPS = (3, 8, 15, 22, 29)  # feature indices of the tap ReLUs


def _max_pool(x, window: int, stride: int):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, window, window, 1),
                             (1, stride, stride, 1), "VALID")


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features with taps after each ReLU (the 5
    LPIPS slices). Convs named conv_{torchvision feature index}."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        taps = []
        idx = 0
        for item in _ALEX_CFG:
            if item == "relu":
                x = nn.relu(x)
                taps.append(x)
                idx += 1
            elif item == "pool":
                x = _max_pool(x, 3, 2)
                idx += 1
            else:
                ch, k, s, p = item
                x = nn.Conv(ch, (k, k), strides=(s, s), padding=p,
                            dtype=self.dtype, name=f"conv_{idx}")(x)
                idx += 1
        return tuple(taps)


class VGG16Features(nn.Module):
    """torchvision VGG16.features with LPIPS taps. Convs named
    conv_{torchvision feature index}."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        taps = []
        idx = 0
        for item in _VGG16_CFG:
            if item == "M":
                x = _max_pool(x, 2, 2)
                idx += 1
            else:
                x = nn.Conv(item, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{idx}")(x)
                idx += 1
                x = nn.relu(x)
                if idx in _VGG16_TAPS:
                    taps.append(x)
                idx += 1
        return tuple(taps)


def _normalize_tensor(x, eps=1e-10):
    """Unit-normalize along channels (lpips.normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """LPIPS distance. Inputs (B, H, W, 3) RGB; `normalize=True` treats
    them as [0, 1] (else [-1, 1], the package's native range)."""
    net: str = "alex"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, normalize: bool = True):
        if normalize:
            x = 2.0 * x - 1.0
            y = 2.0 * y - 1.0
        shift = jnp.asarray(LPIPS_SHIFT, x.dtype)
        scale = jnp.asarray(LPIPS_SCALE, x.dtype)
        x = (x - shift) / scale
        y = (y - shift) / scale
        backbone = (AlexNetFeatures(dtype=self.dtype, name="backbone")
                    if self.net == "alex"
                    else VGG16Features(dtype=self.dtype, name="backbone"))
        fx = backbone(x)
        fy = backbone(y)
        chns = ALEX_CHNS if self.net == "alex" else VGG16_CHNS
        total = 0.0
        for k, _ in enumerate(chns):
            d = (_normalize_tensor(fx[k]) - _normalize_tensor(fy[k])) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          name=f"lin_{k}")(d)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total  # (B,)


def convert_lpips(sd, net: str = "alex") -> Dict:
    """Official `lpips` checkpoint (net.slice{i}.{idx}.* from the backbone
    + lins.{k}.model.1.weight heads, or the package's split lin .pth with
    only lin weights) -> flax params."""

    def _np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t)

    params: Dict[str, Any] = {"backbone": {}}
    n_taps = len(ALEX_CHNS if net == "alex" else VGG16_CHNS)
    # backbone keys: net.slice{s}.{idx}.weight, idx = torchvision index
    for key in sd:
        if key.startswith("net.slice") and key.endswith(".weight"):
            idx = int(key.split(".")[2])
            params["backbone"][f"conv_{idx}"] = {
                "kernel": _np(sd[key]).transpose(2, 3, 1, 0),
                "bias": _np(sd[key.replace(".weight", ".bias")]),
            }
    for k in range(n_taps):
        for cand in (f"lins.{k}.model.1.weight", f"lin{k}.model.1.weight"):
            if cand in sd:
                params[f"lin_{k}"] = {
                    "kernel": _np(sd[cand]).transpose(2, 3, 1, 0)}
                break
    return params


# ---------------------------------------------------------------------------
# DISTS
# ---------------------------------------------------------------------------

DISTS_CHNS = (3, 64, 128, 256, 512, 512)
_DISTS_MEAN = (0.485, 0.456, 0.406)
_DISTS_STD = (0.229, 0.224, 0.225)


def l2_pool(x, channels: int, filter_size: int = 5, stride: int = 2):
    """DISTS L2pooling: sqrt of hann-windowed average of x^2 (per
    channel). hanning(5)[1:-1] => 3x3 window, padding 1."""
    a = np.hanning(filter_size)[1:-1]
    g = np.outer(a, a)
    g = (g / g.sum()).astype(np.float32)
    k = g.shape[0]
    pad = (filter_size - 2) // 2
    rhs = jnp.asarray(np.tile(g[:, :, None, None], (1, 1, 1, channels)))
    out = lax.conv_general_dilated(
        x * x, rhs, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels)
    return jnp.sqrt(out + 1e-12)


class DISTSNet(nn.Module):
    """VGG16 trunk with L2 pooling; returns the 6 DISTS feature stages
    (input + 5 relu taps)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        h = (x - jnp.asarray(_DISTS_MEAN, x.dtype)) \
            / jnp.asarray(_DISTS_STD, x.dtype)
        feats = [x]
        idx = 0
        chans = 3
        for item in _VGG16_CFG:
            if item == "M":
                h = l2_pool(h, chans)
                idx += 1
            else:
                h = nn.Conv(item, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{idx}")(h)
                chans = item
                idx += 1
                h = nn.relu(h)
                if idx in _VGG16_TAPS:
                    feats.append(h)
                idx += 1
        return tuple(feats)


class DISTS(nn.Module):
    """DISTS score in [0, 1]-ish (lower = more similar); inputs
    (B, H, W, 3) RGB in [0, 1]."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        net = DISTSNet(dtype=self.dtype, name="net")
        fx = net(x)
        fy = net(y)
        total_ch = sum(DISTS_CHNS)
        alpha = self.param("alpha", nn.initializers.normal(0.01),
                           (total_ch,))
        beta = self.param("beta", nn.initializers.normal(0.01), (total_ch,))
        w_sum = alpha.sum() + beta.sum()
        alphas = jnp.split(alpha / w_sum, np.cumsum(DISTS_CHNS)[:-1])
        betas = jnp.split(beta / w_sum, np.cumsum(DISTS_CHNS)[:-1])
        c1 = c2 = 1e-6
        dist1 = 0.0
        dist2 = 0.0
        for k in range(len(DISTS_CHNS)):
            xm = fx[k].mean(axis=(1, 2))          # (B, C)
            ym = fy[k].mean(axis=(1, 2))
            s1 = (2 * xm * ym + c1) / (xm ** 2 + ym ** 2 + c1)
            dist1 = dist1 + jnp.sum(alphas[k] * s1, axis=-1)
            xv = ((fx[k] - xm[:, None, None, :]) ** 2).mean(axis=(1, 2))
            yv = ((fy[k] - ym[:, None, None, :]) ** 2).mean(axis=(1, 2))
            xy_cov = (fx[k] * fy[k]).mean(axis=(1, 2)) - xm * ym
            s2 = (2 * xy_cov + c2) / (xv + yv + c2)
            dist2 = dist2 + jnp.sum(betas[k] * s2, axis=-1)
        return 1.0 - (dist1 + dist2)  # (B,)


def convert_dists(sd) -> Dict:
    """Official DISTS `weights.pt` (alpha/beta) + torchvision VGG16
    state_dict -> flax params. The DISTS package stores the backbone
    inside `stage{i}.{idx}` modules with torchvision feature indices."""

    def _np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t)

    params: Dict[str, Any] = {"net": {}}
    for key in sd:
        if ".weight" in key and ("stage" in key or key.startswith("features")):
            idx = int(key.split(".")[-2])
            params["net"][f"conv_{idx}"] = {
                "kernel": _np(sd[key]).transpose(2, 3, 1, 0),
                "bias": _np(sd[key.replace(".weight", ".bias")]),
            }
    if "alpha" in sd:
        params["alpha"] = _np(sd["alpha"]).reshape(-1)
        params["beta"] = _np(sd["beta"]).reshape(-1)
    return params


# ---------------------------------------------------------------------------
# Metric protocol wrappers (reference basicsr/metrics signatures)
# ---------------------------------------------------------------------------


def calculate_lpips(img, img2, crop_border, params, net: str = "alex",
                    input_order: str = "HWC", **kwargs) -> float:
    """`basicsr/metrics/lpips.py:11-63` protocol: BGR uint8-range images,
    crop border, [0,1] -> [-1,1], LPIPS. `params` must hold converted
    official weights for the chosen backbone."""
    if input_order == "CHW":
        img = img.transpose(1, 2, 0)
        img2 = img2.transpose(1, 2, 0)
    img = img.astype(np.float64) / 255.0
    img2 = img2.astype(np.float64) / 255.0
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    # BGR -> RGB (reference img2tensor(bgr2rgb=True))
    img = img[..., ::-1].copy()
    img2 = img2[..., ::-1].copy()
    model = LPIPS(net=net)
    val = model.apply({"params": params},
                      jnp.asarray(img[None], dtype=jnp.float32),
                      jnp.asarray(img2[None], dtype=jnp.float32),
                      normalize=True)
    return float(val[0])


def calculate_dists(img, img2, crop_border, params,
                    color_order: str = "BGR", **kwargs) -> float:
    """`basicsr/metrics/dists.py:35-56` protocol (note the reference calls
    model(img2, img), i.e. GT first)."""
    if color_order == "BGR":
        img = img[..., ::-1].copy()
        img2 = img2[..., ::-1].copy()
    img = img.astype(np.float64) / 255.0
    img2 = img2.astype(np.float64) / 255.0
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    model = DISTS()
    val = model.apply({"params": params},
                      jnp.asarray(img2[None], dtype=jnp.float32),
                      jnp.asarray(img[None], dtype=jnp.float32))
    return float(val[0])


# ---------------------------------------------------------------------------
# FID
# ---------------------------------------------------------------------------


def compute_feature_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu, sigma) sample statistics."""
    feats = np.asarray(feats, dtype=np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def calculate_fid(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians
    (`basicsr/metrics/fid.py:50-88`):
    d^2 = ||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))."""
    from scipy import linalg
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape
    cov_sqrt, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(cov_sqrt).all():
        offset = np.eye(sigma1.shape[0]) * eps
        cov_sqrt = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            m = np.max(np.abs(cov_sqrt.imag))
            raise ValueError(f"Imaginary component {m}")
        cov_sqrt = cov_sqrt.real
    mean_diff = mu1 - mu2
    mean_norm = mean_diff @ mean_diff
    trace = np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(cov_sqrt)
    return float(mean_norm + trace)


def extract_features(images: Sequence[np.ndarray], feature_fn) -> np.ndarray:
    """Run a feature extractor over a sequence of (H, W, 3) images and
    stack (N, D) features; `feature_fn` is e.g. a jitted InceptionV3-FID
    apply (pretrained weights required — zero-egress gate, see
    `fid.py:10-16`)."""
    out = [np.asarray(feature_fn(img)).reshape(-1) for img in images]
    return np.stack(out)
