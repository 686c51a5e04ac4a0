"""VGG feature extractor for perceptual losses/metrics.

Equivalent of the reference `basicsr/archs/vgg_arch.py:10-161`
(`VGGFeatureExtractor`): a truncated VGG trunk that returns a dict of
intermediate activations named `conv{b}_{i}` / `relu{b}_{i}` / `pool{b}`,
with optional ImageNet input normalization and [-1,1]->[0,1] range
normalization.

Pretrained torchvision weights are NOT bundled (zero-egress image); load a
`vgg19-*.pth` state_dict through `convert_vgg` when available. The
architecture, converter and loss math are fully tested against the
reference with randomly initialized oracle weights.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

NAMES = {
    "vgg11": [
        "conv1_1", "relu1_1", "pool1", "conv2_1", "relu2_1", "pool2",
        "conv3_1", "relu3_1", "conv3_2", "relu3_2", "pool3", "conv4_1",
        "relu4_1", "conv4_2", "relu4_2", "pool4", "conv5_1", "relu5_1",
        "conv5_2", "relu5_2", "pool5"
    ],
    "vgg13": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1", "conv2_1",
        "relu2_1", "conv2_2", "relu2_2", "pool2", "conv3_1", "relu3_1",
        "conv3_2", "relu3_2", "pool3", "conv4_1", "relu4_1", "conv4_2",
        "relu4_2", "pool4", "conv5_1", "relu5_1", "conv5_2", "relu5_2",
        "pool5"
    ],
    "vgg16": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1", "conv2_1",
        "relu2_1", "conv2_2", "relu2_2", "pool2", "conv3_1", "relu3_1",
        "conv3_2", "relu3_2", "conv3_3", "relu3_3", "pool3", "conv4_1",
        "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3", "pool4",
        "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
        "pool5"
    ],
    "vgg19": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1", "conv2_1",
        "relu2_1", "conv2_2", "relu2_2", "pool2", "conv3_1", "relu3_1",
        "conv3_2", "relu3_2", "conv3_3", "relu3_3", "conv3_4", "relu3_4",
        "pool3", "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3",
        "relu4_3", "conv4_4", "relu4_4", "pool4", "conv5_1", "relu5_1",
        "conv5_2", "relu5_2", "conv5_3", "relu5_3", "conv5_4", "relu5_4",
        "pool5"
    ],
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv_features(name: str) -> int:
    """conv{b}_{i} -> output channels (64 * 2^(b-1), capped at 512)."""
    block = int(name[4])
    return min(64 * 2 ** (block - 1), 512)


def max_pool_2x2(x, stride: int = 2):
    """torch nn.MaxPool2d(kernel_size=2, stride=s) on NHWC."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, stride, stride, 1), "VALID")


class VGGFeatureExtractor(nn.Module):
    """(B, H, W, 3) NHWC in [0,1] -> {layer_name: (B, h, w, c)} features."""
    layer_name_list: Sequence[str]
    vgg_type: str = "vgg19"
    use_input_norm: bool = True
    range_norm: bool = False
    remove_pooling: bool = False
    pooling_stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        names = NAMES[self.vgg_type]
        max_idx = max(names.index(v) for v in self.layer_name_list)

        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - jnp.asarray(IMAGENET_MEAN, x.dtype)) \
                / jnp.asarray(IMAGENET_STD, x.dtype)

        out = {}
        for name in names[:max_idx + 1]:
            if name.startswith("conv"):
                x = nn.Conv(_conv_features(name), (3, 3), padding=1,
                            dtype=self.dtype, name=name)(x)
            elif name.startswith("relu"):
                x = nn.relu(x)
            elif name.startswith("pool"):
                if self.remove_pooling:
                    continue
                x = max_pool_2x2(x, self.pooling_stride)
            if name in self.layer_name_list:
                out[name] = x
        return out


def convert_vgg(sd, vgg_type: str = "vgg19") -> Dict:
    """torch VGG state_dict -> flax params for VGGFeatureExtractor.

    Accepts torchvision layout (`features.{idx}.weight`), a bare
    `{idx}.weight` Sequential, or the reference's extracted layout
    (`vgg_net.{name}.weight`, vgg_arch.py:112-124).
    """
    import numpy as np

    def _np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t)

    names = NAMES[vgg_type]
    params = {}
    if any(k.startswith("vgg_net.") for k in sd):
        for name in names:
            key = f"vgg_net.{name}.weight"
            if key in sd:
                params[name] = {
                    "kernel": _np(sd[key]).transpose(2, 3, 1, 0),
                    "bias": _np(sd[f"vgg_net.{name}.bias"]),
                }
        return params
    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    for idx, name in enumerate(names):
        key = f"{prefix}{idx}.weight"
        if name.startswith("conv") and key in sd:
            params[name] = {
                "kernel": _np(sd[key]).transpose(2, 3, 1, 0),
                "bias": _np(sd[f"{prefix}{idx}.bias"]),
            }
    return params


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, C) Gram matrix, matching the reference's
    normalization by c*h*w (basic_loss.py:241-254)."""
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (c * h * w)


class PerceptualLoss:
    """Perceptual + style loss (`basic_loss.py:148-254`).

    Functional: construct once with layer weights, then call
    `loss(params, x, gt)` where params come from `init` or `convert_vgg`.
    """

    def __init__(self, layer_weights: Dict[str, float],
                 vgg_type: str = "vgg19", use_input_norm: bool = True,
                 range_norm: bool = False, perceptual_weight: float = 1.0,
                 style_weight: float = 0.0, criterion: str = "l1"):
        if criterion not in ("l1", "l2", "fro"):
            raise NotImplementedError(f"{criterion} criterion not supported")
        self.layer_weights = dict(layer_weights)
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion = criterion
        self.vgg = VGGFeatureExtractor(
            layer_name_list=tuple(layer_weights.keys()), vgg_type=vgg_type,
            use_input_norm=use_input_norm, range_norm=range_norm)

    def init(self, rng, shape: Tuple[int, ...] = (1, 32, 32, 3)):
        return self.vgg.init(rng, jnp.zeros(shape))["params"]

    def _dist(self, a, b):
        if self.criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if self.criterion == "l2":
            return jnp.mean((a - b) ** 2)
        return jnp.linalg.norm((a - b).reshape(-1))  # 'fro' on the full tensor

    def __call__(self, params, x, gt):
        """x, gt: (B, H, W, 3). Returns (percep_loss, style_loss); entries
        are None when the corresponding weight is 0 (reference behavior)."""
        fx = self.vgg.apply({"params": params}, x)
        fg = self.vgg.apply({"params": params}, lax.stop_gradient(gt))

        percep = None
        if self.perceptual_weight > 0:
            percep = sum(self._dist(fx[k], fg[k]) * w
                         for k, w in self.layer_weights.items())
            percep = percep * self.perceptual_weight

        style = None
        if self.style_weight > 0:
            style = sum(
                self._dist(gram_matrix(fx[k]), gram_matrix(fg[k])) * w
                for k, w in self.layer_weights.items())
            style = style * self.style_weight
        return percep, style
