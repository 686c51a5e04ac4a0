"""PyTorch -> JAX checkpoint conversion for the GSASR model family.

Maps reference state_dicts (`{'params': sd, 'params_ema': sd}` layout,
`/root/reference/TrainTestGSASR/basicsr/models/base_model.py:208-253`) onto
the flax parameter trees of gsasr_tpu.models.

Layout rules:
- torch Conv2d weight (O, I, kH, kW) -> flax Conv kernel (kH, kW, I, O)
- torch Linear weight (O, I)         -> flax Dense kernel (I, O)
- torch nn.MultiheadAttention in_proj_weight (3C, C): only the V slice
  [2C:3C] participates in the output for the scale-injection layers (see
  gsasr_tpu/models/fea2gs.py:ScaleInject); Q/K slices land in dead params.
- WindowCrossAttn bias tables are row-permuted via the checkpoint's saved
  `relative_position_index` buffer because the reference builds that index
  with Python-set iteration order (`fea2gs.py:139`), which need not match
  our deterministic ranking; the permutation is recovered by co-occurrence.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from gsasr_tpu.models.fea2gs import (cross_attn_rel_pos_index,
                                     self_attn_rel_pos_index)


def _np(t):
    """torch tensor / ndarray -> float32 ndarray."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_w(sd, key):
    return _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)


def dense_w(sd, key):
    return _np(sd[f"{key}.weight"]).T


def _conv(sd, key):
    return {"kernel": conv_w(sd, key), "bias": _np(sd[f"{key}.bias"])}


def _dense(sd, key):
    return {"kernel": dense_w(sd, key), "bias": _np(sd[f"{key}.bias"])}


def _ln(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _mlp(sd, key):
    return {"fc1": _dense(sd, f"{key}.fc1"), "fc2": _dense(sd, f"{key}.fc2")}


def _mha_scale_inject(sd, key):
    """nn.MultiheadAttention -> ScaleInject params."""
    w = _np(sd[f"{key}.in_proj_weight"])
    b = _np(sd[f"{key}.in_proj_bias"])
    c = w.shape[1]
    return {
        "q_proj_dead": w[0:c],
        "k_proj_dead": w[c:2 * c],
        "v_proj": {"kernel": w[2 * c:3 * c].T, "bias": b[2 * c:3 * c]},
        "out_proj": _dense(sd, f"{key}.out_proj"),
    }


def remap_bias_table(table: np.ndarray, idx_theirs: np.ndarray,
                     idx_ours: np.ndarray) -> np.ndarray:
    """Permute bias-table rows so `ours[idx_ours[p]] == theirs[idx_theirs[p]]`
    for every token pair p. Rows never referenced keep their original value.
    """
    out = table.copy()
    flat_t = idx_theirs.reshape(-1).astype(np.int64)
    flat_o = idx_ours.reshape(-1).astype(np.int64)
    out[flat_o] = table[flat_t]
    return out


# ---------------------------------------------------------------------------
# EDSR
# ---------------------------------------------------------------------------


def convert_edsr(sd) -> Dict:
    """`utils/edsrbaseline.py:86-107` EDSRNOUP state_dict -> flax params."""
    num_block = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("body."))
    params = {
        "conv_first": _conv(sd, "conv_first"),
        "conv_after_body": _conv(sd, "conv_after_body"),
    }
    for i in range(num_block):
        params[f"body_{i}"] = {
            "conv1": _conv(sd, f"body.{i}.conv1"),
            "conv2": _conv(sd, f"body.{i}.conv2"),
        }
    return params


def convert_rdn(sd) -> Dict:
    """`utils/rdn.py:45-114` RDNNOUP state_dict -> flax params."""
    n_rdb = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("RDBs."))
    params = {
        "sfenet1": _conv(sd, "SFENet1"),
        "sfenet2": _conv(sd, "SFENet2"),
        "gff_0": _conv(sd, "GFF.0"),
        "gff_1": _conv(sd, "GFF.1"),
    }
    for i in range(n_rdb):
        blk = {"lff": _conv(sd, f"RDBs.{i}.LFF")}
        n_conv = 1 + max(int(k.split(".")[3]) for k in sd
                         if k.startswith(f"RDBs.{i}.convs."))
        for c in range(n_conv):
            blk[f"conv_{c}"] = _conv(sd, f"RDBs.{i}.convs.{c}.conv.0")
        params[f"rdb_{i}"] = blk
    return params


# ---------------------------------------------------------------------------
# Fea2GS (paper)
# ---------------------------------------------------------------------------


def _head_mlp(sd, key):
    return {
        "fc0": _dense(sd, f"{key}.0"),
        "fc2": _dense(sd, f"{key}.2"),
        "fc4": _dense(sd, f"{key}.4"),
    }


def _window_cross_attn(sd, key, gs_sqrt, window_size, num_heads):
    table = _np(sd[f"{key}.relative_position_bias_table"])
    idx_ours = cross_attn_rel_pos_index(gs_sqrt, window_size)
    idx_key = f"{key}.relative_position_index"
    if idx_key in sd:
        table = remap_bias_table(table, _np(sd[idx_key]), idx_ours)
    return {
        "relative_position_bias_table": table,
        "qhead": _dense(sd, f"{key}.qhead"),
        "khead": _dense(sd, f"{key}.khead"),
        "vhead": _dense(sd, f"{key}.vhead"),
        "proj": _dense(sd, f"{key}.proj"),
    }


def _gs_self_attn(sd, key, nsq):
    table = _np(sd[f"{key}.relative_position_bias_table"])
    idx_key = f"{key}.relative_position_index"
    if idx_key in sd:
        theirs = _np(sd[idx_key])
        ours = self_attn_rel_pos_index(nsq)
        if not np.array_equal(theirs, ours):  # identical construction
            table = remap_bias_table(table, theirs, ours)
    return {
        "relative_position_bias_table": table,
        "qhead": _dense(sd, f"{key}.qhead"),
        "khead": _dense(sd, f"{key}.khead"),
        "vhead": _dense(sd, f"{key}.vhead"),
        "proj": _dense(sd, f"{key}.proj"),
    }


def convert_fea2gs(sd, *, num_gs_seed=144, window_size=12,
                   num_heads=6) -> Dict:
    """`utils/fea2gs.py:451-635` Fea2GS state_dict -> flax params."""
    import math
    nsq = int(math.sqrt(num_gs_seed))

    def n_items(prefix):
        idx = [int(k[len(prefix):].split(".")[0]) for k in sd
               if k.startswith(prefix)]
        return 1 + max(idx)

    params = {
        "gs_embedding": _np(sd["gs_embedding"]),
        "pos_embedding": _np(sd["pos_embedding"]),
        "img_feat_proj_0": _conv(sd, "img_feat_proj.0"),
        "img_feat_proj_2": _conv(sd, "img_feat_proj.2"),
        "scale_mlp_0": _dense(sd, "scale_mlp.0"),
        "scale_mlp_2": _dense(sd, "scale_mlp.2"),
        "upnet_0": _conv(sd, "UPNet.0"),
        "upnet_2": _conv(sd, "UPNet.2"),
        "mlp_block_sigma": _head_mlp(sd, "mlp_block_sigma"),
        "mlp_block_rho": _head_mlp(sd, "mlp_block_rho"),
        "mlp_block_alpha": _head_mlp(sd, "mlp_block_alpha"),
        "mlp_block_rgb": _head_mlp(sd, "mlp_block_rgb"),
        "mlp_block_mean": _head_mlp(sd, "mlp_block_mean"),
    }

    for i in range(n_items("window_crossattn_blocks.")):
        bk = f"window_crossattn_blocks.{i}"
        blk = {
            "norm": _ln(sd, f"{bk}.norm"),
            "mlp_0": _dense(sd, f"{bk}.mlp.0"),
            "mlp_2": _dense(sd, f"{bk}.mlp.2"),
        }
        for j in range(n_items(f"{bk}.blocks.")):
            lk = f"{bk}.blocks.{j}"
            blk[f"blocks_{j}"] = {
                "norm1": _ln(sd, f"{lk}.norm1"),
                "norm2": _ln(sd, f"{lk}.norm2"),
                "norm3": _ln(sd, f"{lk}.norm3"),
                "norm4": _ln(sd, f"{lk}.norm4"),
                "gs_cross_attn_scale": _mha_scale_inject(
                    sd, f"{lk}.gs_cross_attn_scale"),
                "window_cross_attn": _window_cross_attn(
                    sd, f"{lk}.window_cross_attn", nsq, window_size,
                    num_heads),
                "mlp_crossattn_scale": _mlp(sd, f"{lk}.mlp_crossattn_scale"),
                "mlp_crossattn_feature": _mlp(
                    sd, f"{lk}.mlp_crossattn_feature"),
            }
        params[f"window_crossattn_blocks_{i}"] = blk

    for i in range(n_items("gs_selfattn_blocks.")):
        bk = f"gs_selfattn_blocks.{i}"
        blk = {
            "norm": _ln(sd, f"{bk}.norm"),
            "mlp_0": _dense(sd, f"{bk}.mlp.0"),
            "mlp_2": _dense(sd, f"{bk}.mlp.2"),
        }
        for j in range(n_items(f"{bk}.blocks.")):
            lk = f"{bk}.blocks.{j}"
            blk[f"blocks_{j}"] = {
                "norm1": _ln(sd, f"{lk}.norm1"),
                "norm2": _ln(sd, f"{lk}.norm2"),
                "norm3": _ln(sd, f"{lk}.norm3"),
                "norm4": _ln(sd, f"{lk}.norm4"),
                "gs_cross_attn_scale": _mha_scale_inject(
                    sd, f"{lk}.gs_cross_attn_scale"),
                "gs_self_attn": _gs_self_attn(sd, f"{lk}.gs_self_attn", nsq),
                "mlp_selfattn": _mlp(sd, f"{lk}.mlp_selfattn"),
                "mlp_crossattn": _mlp(sd, f"{lk}.mlp_crossattn"),
            }
        params[f"gs_selfattn_blocks_{i}"] = blk

    return params


# ---------------------------------------------------------------------------
# SwinIR
# ---------------------------------------------------------------------------


def convert_swinir(sd) -> Dict:
    """`utils/swinir.py:1018-1243` SwinIRNOUP state_dict -> flax params."""
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))
    params = {
        "conv_first": _conv(sd, "conv_first"),
        "patch_embed_norm": _ln(sd, "patch_embed.norm"),
        "norm": _ln(sd, "norm"),
        "conv_after_body": _conv(sd, "conv_after_body"),
        "conv_before_upsample_0": _conv(sd, "conv_before_upsample.0"),
    }
    for i in range(n_layers):
        lk = f"layers.{i}.residual_group.blocks."
        n_blocks = 1 + max(int(k[len(lk):].split(".")[0]) for k in sd
                           if k.startswith(lk))
        layer = {"conv": _conv(sd, f"layers.{i}.conv")}
        for j in range(n_blocks):
            bk = f"{lk}{j}"
            layer[f"block_{j}"] = {
                "norm1": _ln(sd, f"{bk}.norm1"),
                "norm2": _ln(sd, f"{bk}.norm2"),
                "attn": {
                    "relative_position_bias_table": _np(
                        sd[f"{bk}.attn.relative_position_bias_table"]),
                    "qkv": _dense(sd, f"{bk}.attn.qkv"),
                    "proj": _dense(sd, f"{bk}.attn.proj"),
                },
                "mlp_fc1": _dense(sd, f"{bk}.mlp.fc1"),
                "mlp_fc2": _dense(sd, f"{bk}.mlp.fc2"),
            }
        params[f"layer_{i}"] = layer
    return params


# ---------------------------------------------------------------------------
# Fea2GS_ROPE_AMP (enhanced)
# ---------------------------------------------------------------------------


def _rope_attn(sd, key):
    return {
        "rope_freqs": _np(sd[f"{key}.rope_freqs"]),
        "qhead": _dense(sd, f"{key}.qhead"),
        "khead": _dense(sd, f"{key}.khead"),
        "vhead": _dense(sd, f"{key}.vhead"),
        "proj": _dense(sd, f"{key}.proj"),
    }


def convert_fea2gs_rope(sd) -> Dict:
    """`utils/fea2gsropeamp.py:518-719` Fea2GS_ROPE_AMP -> flax params."""

    def n_items(prefix):
        idx = [int(k[len(prefix):].split(".")[0]) for k in sd
               if k.startswith(prefix)]
        return 1 + max(idx)

    params = {
        "gs_embedding": _np(sd["gs_embedding"]),
        "pos_embedding": _np(sd["pos_embedding"]),
        "img_feat_proj_0": _conv(sd, "img_feat_proj.0"),
        "img_feat_proj_2": _conv(sd, "img_feat_proj.2"),
        "scale_mlp_0": _dense(sd, "scale_mlp.0"),
        "scale_mlp_2": _dense(sd, "scale_mlp.2"),
        "upnet_0": _conv(sd, "UPNet.0"),
        "upnet_2": _conv(sd, "UPNet.2"),
        "conv_final": _conv(sd, "conv_final"),
        "mlp_block_sigma": _head_mlp(sd, "mlp_block_sigma"),
        "mlp_block_rho": _head_mlp(sd, "mlp_block_rho"),
        "mlp_block_alpha": _head_mlp(sd, "mlp_block_alpha"),
        "mlp_block_rgb": _head_mlp(sd, "mlp_block_rgb"),
        "mlp_block_mean": _head_mlp(sd, "mlp_block_mean"),
    }

    for i in range(n_items("window_crossattn_blocks.")):
        bk = f"window_crossattn_blocks.{i}"
        blk = {
            "norm": _ln(sd, f"{bk}.norm"),
            "mlp_0": _dense(sd, f"{bk}.mlp.0"),
            "mlp_2": _dense(sd, f"{bk}.mlp.2"),
            "conv": _conv(sd, f"{bk}.conv"),
        }
        for j in range(n_items(f"{bk}.blocks.")):
            lk = f"{bk}.blocks.{j}"
            blk[f"blocks_{j}"] = {
                "norm1": _ln(sd, f"{lk}.norm1"),
                "norm2": _ln(sd, f"{lk}.norm2"),
                "norm3": _ln(sd, f"{lk}.norm3"),
                "norm4": _ln(sd, f"{lk}.norm4"),
                "gs_cross_attn_scale": _mha_scale_inject(
                    sd, f"{lk}.gs_cross_attn_scale"),
                "window_cross_attn": _rope_attn(
                    sd, f"{lk}.window_cross_attn"),
                "mlp_crossattn_scale": _mlp(sd, f"{lk}.mlp_crossattn_scale"),
                "mlp_crossattn_feature": _mlp(
                    sd, f"{lk}.mlp_crossattn_feature"),
            }
        params[f"window_crossattn_blocks_{i}"] = blk

    for i in range(n_items("gs_selfattn_blocks.")):
        bk = f"gs_selfattn_blocks.{i}"
        blk = {
            "norm": _ln(sd, f"{bk}.norm"),
            "mlp_0": _dense(sd, f"{bk}.mlp.0"),
            "mlp_2": _dense(sd, f"{bk}.mlp.2"),
            "conv": _conv(sd, f"{bk}.conv"),
        }
        for j in range(n_items(f"{bk}.blocks.")):
            lk = f"{bk}.blocks.{j}"
            blk[f"blocks_{j}"] = {
                "norm1": _ln(sd, f"{lk}.norm1"),
                "norm2": _ln(sd, f"{lk}.norm2"),
                "norm3": _ln(sd, f"{lk}.norm3"),
                "norm4": _ln(sd, f"{lk}.norm4"),
                "gs_cross_attn_scale": _mha_scale_inject(
                    sd, f"{lk}.gs_cross_attn_scale"),
                "gs_self_attn": _rope_attn(sd, f"{lk}.gs_self_attn"),
                "mlp_selfattn": _mlp(sd, f"{lk}.mlp_selfattn"),
                "mlp_crossattn": _mlp(sd, f"{lk}.mlp_crossattn"),
            }
        params[f"gs_selfattn_blocks_{i}"] = blk

    return params


# ---------------------------------------------------------------------------
# HAT (ROPE AMP)
# ---------------------------------------------------------------------------


def _hat_hab(sd, key):
    return {
        "norm1": _ln(sd, f"{key}.norm1"),
        "norm2": _ln(sd, f"{key}.norm2"),
        "attn": {
            "rope_freqs": _np(sd[f"{key}.attn.rope_freqs"]),
            "qkv": _dense(sd, f"{key}.attn.qkv"),
            "proj": _dense(sd, f"{key}.attn.proj"),
        },
        "conv_block": {
            "conv1": _conv(sd, f"{key}.conv_block.cab.0"),
            "conv2": _conv(sd, f"{key}.conv_block.cab.2"),
            "ca": {
                "fc1": _conv(sd, f"{key}.conv_block.cab.3.attention.1"),
                "fc2": _conv(sd, f"{key}.conv_block.cab.3.attention.3"),
            },
        },
        "mlp_fc1": _dense(sd, f"{key}.mlp.fc1"),
        "mlp_fc2": _dense(sd, f"{key}.mlp.fc2"),
    }


def convert_hat(sd) -> Dict:
    """`utils/hatropeamp.py:886-1155` HATNOUP_ROPE_AMP -> flax params."""
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))
    params = {
        "conv_first": _conv(sd, "conv_first"),
        "patch_embed_norm": _ln(sd, "patch_embed.norm"),
        "norm": _ln(sd, "norm"),
        "conv_after_body": _conv(sd, "conv_after_body"),
        "conv_before_upsample_0": _conv(sd, "conv_before_upsample.0"),
    }
    for i in range(n_layers):
        rg = f"layers.{i}.residual_group"
        bk = f"{rg}.blocks."
        n_blocks = 1 + max(int(k[len(bk):].split(".")[0]) for k in sd
                           if k.startswith(bk))
        layer = {"conv": _conv(sd, f"layers.{i}.conv")}
        for j in range(n_blocks):
            layer[f"block_{j}"] = _hat_hab(sd, f"{bk}{j}")
        oc = f"{rg}.overlap_attn"
        layer["overlap_attn"] = {
            "norm1": _ln(sd, f"{oc}.norm1"),
            "norm2": _ln(sd, f"{oc}.norm2"),
            "qkv": _dense(sd, f"{oc}.qkv"),
            "proj": _dense(sd, f"{oc}.proj"),
            "rope_freqs": _np(sd[f"{oc}.rope_freqs"]),
            "mlp_fc1": _dense(sd, f"{oc}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{oc}.mlp.fc2"),
        }
        params[f"layer_{i}"] = layer
    return params


def _hat_paper_hab(sd, key):
    return {
        "norm1": _ln(sd, f"{key}.norm1"),
        "norm2": _ln(sd, f"{key}.norm2"),
        "attn": {
            "relative_position_bias_table": _np(
                sd[f"{key}.attn.relative_position_bias_table"]),
            "qkv": _dense(sd, f"{key}.attn.qkv"),
            "proj": _dense(sd, f"{key}.attn.proj"),
        },
        "conv_block": {
            "conv1": _conv(sd, f"{key}.conv_block.cab.0"),
            "conv2": _conv(sd, f"{key}.conv_block.cab.2"),
            "ca": {
                "fc1": _conv(sd, f"{key}.conv_block.cab.3.attention.1"),
                "fc2": _conv(sd, f"{key}.conv_block.cab.3.attention.3"),
            },
        },
        "mlp_fc1": _dense(sd, f"{key}.mlp.fc1"),
        "mlp_fc2": _dense(sd, f"{key}.mlp.fc2"),
    }


def convert_hat_paper(sd) -> Dict:
    """`basicsr/archs/hat_arch.py` HATNOUP (paper, rel-pos-bias) -> flax."""
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))
    params = {
        "conv_first": _conv(sd, "conv_first"),
        "patch_embed_norm": _ln(sd, "patch_embed.norm"),
        "norm": _ln(sd, "norm"),
        "conv_after_body": _conv(sd, "conv_after_body"),
        "conv_before_upsample_0": _conv(sd, "conv_before_upsample.0"),
    }
    for i in range(n_layers):
        rg = f"layers.{i}.residual_group"
        bk = f"{rg}.blocks."
        n_blocks = 1 + max(int(k[len(bk):].split(".")[0]) for k in sd
                           if k.startswith(bk))
        layer = {"conv": _conv(sd, f"layers.{i}.conv")}
        for j in range(n_blocks):
            layer[f"block_{j}"] = _hat_paper_hab(sd, f"{bk}{j}")
        oc = f"{rg}.overlap_attn"
        layer["overlap_attn"] = {
            "norm1": _ln(sd, f"{oc}.norm1"),
            "norm2": _ln(sd, f"{oc}.norm2"),
            "qkv": _dense(sd, f"{oc}.qkv"),
            "proj": _dense(sd, f"{oc}.proj"),
            "relative_position_bias_table": _np(
                sd[f"{oc}.relative_position_bias_table"]),
            "mlp_fc1": _dense(sd, f"{oc}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{oc}.mlp.fc2"),
        }
        params[f"layer_{i}"] = layer
    return params


# ---------------------------------------------------------------------------
# Classic (non-NOUP) full SR networks — gsasr_tpu.models.classic
# ---------------------------------------------------------------------------


def _upsample(sd, key):
    """arch_util Upsample Sequential -> {conv_{i}: ...} (convs sit at the
    even Sequential indices; PixelShuffle modules carry no params)."""
    out = {}
    for k in sd:
        if k.startswith(f"{key}.") and k.endswith(".weight"):
            i = int(k[len(key) + 1:].split(".")[0])
            out[f"conv_{i}"] = _conv(sd, f"{key}.{i}")
    return out


def convert_edsr_classic(sd) -> Dict:
    """`edsr_arch.py:8-174` EDSR / EDSRx3 / EDSRx4 -> flax params.

    The three registry classes differ only in the torch attribute name of
    the upsample head; detect it from the state_dict.
    """
    num_block = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("body."))
    up_key = next(k.split(".")[0] for k in sd
                  if k.split(".")[0].startswith("upsample"))
    params = {
        "conv_first": _conv(sd, "conv_first"),
        "conv_after_body": _conv(sd, "conv_after_body"),
        "conv_last": _conv(sd, "conv_last"),
        "upsample": _upsample(sd, up_key),
    }
    for i in range(num_block):
        params[f"body_{i}"] = {
            "conv1": _conv(sd, f"body.{i}.conv1"),
            "conv2": _conv(sd, f"body.{i}.conv2"),
        }
    return params


def convert_rdn_classic(sd) -> Dict:
    """`rdn_arch.py:39-120` RDNNOUP(no_upsampling=False) -> flax params."""
    params = convert_rdn(sd)
    for k in sd:
        if k.startswith("UPNet.") and k.endswith(".weight"):
            i = int(k.split(".")[1])
            params[f"upnet_{i}"] = _conv(sd, f"UPNet.{i}")
    return params


def convert_swinir_classic(sd, upsampler: str) -> Dict:
    """`swinir_arch.py:699-938` full SwinIR -> flax params."""
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))
    params = {
        "conv_first": _conv(sd, "conv_first"),
        "patch_embed_norm": _ln(sd, "patch_embed.norm"),
        "norm": _ln(sd, "norm"),
        "conv_after_body": _conv(sd, "conv_after_body"),
    }
    for i in range(n_layers):
        lk = f"layers.{i}.residual_group.blocks."
        n_blocks = 1 + max(int(k[len(lk):].split(".")[0]) for k in sd
                           if k.startswith(lk))
        layer = {"conv": _conv(sd, f"layers.{i}.conv")}
        for j in range(n_blocks):
            bk = f"{lk}{j}"
            layer[f"block_{j}"] = {
                "norm1": _ln(sd, f"{bk}.norm1"),
                "norm2": _ln(sd, f"{bk}.norm2"),
                "attn": {
                    "relative_position_bias_table": _np(
                        sd[f"{bk}.attn.relative_position_bias_table"]),
                    "qkv": _dense(sd, f"{bk}.attn.qkv"),
                    "proj": _dense(sd, f"{bk}.attn.proj"),
                },
                "mlp_fc1": _dense(sd, f"{bk}.mlp.fc1"),
                "mlp_fc2": _dense(sd, f"{bk}.mlp.fc2"),
            }
        params[f"layer_{i}"] = layer

    if upsampler == "pixelshuffle":
        params["conv_before_upsample_0"] = _conv(sd, "conv_before_upsample.0")
        params["upsample"] = _upsample(sd, "upsample")
        params["conv_last"] = _conv(sd, "conv_last")
    elif upsampler == "pixelshuffledirect":
        params["upsample"] = _upsample(sd, "upsample")
    elif upsampler == "nearest+conv":
        params["conv_before_upsample_0"] = _conv(sd, "conv_before_upsample.0")
        for k in ("conv_up1", "conv_up2", "conv_hr", "conv_last"):
            params[k] = _conv(sd, k)
    else:
        params["conv_last"] = _conv(sd, "conv_last")
    return params


def convert_hat_classic(sd) -> Dict:
    """`hat_arch.py:709-984` full HAT (pixelshuffle head) -> flax params."""
    params = convert_hat_paper(sd)
    params["upsample"] = _upsample(sd, "upsample")
    params["conv_last"] = _conv(sd, "conv_last")
    return params
