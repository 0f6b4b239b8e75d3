"""Depth-Anything V1/V2 checkpoint conversion: original ``.pth`` state dicts
(unchanged, as downloaded) -> (config dict, parameter pytree).

Mirrors the behavior of the reference's state_dict_conversion layer:
* config inference from tensor shapes:
  v2_depthanything/state_dict_conversion/config_from_original_state_dict.py:17-259
* key routing / tensor surgery (pos-embed split, layer-scale renames):
  v2_depthanything/state_dict_conversion/convert_original_state_dict_keys.py:15-317

V1 and V2 share the original checkpoint format; they differ only in which
encoder blocks feed the DPT neck (V1: last 4 blocks; V2: 4 even stages) and in
V1 lacking SwiGLU/metric variants (SURVEY.md §2.3).
"""

from __future__ import annotations

import math

import numpy as np

from .convert_common import (
    qkv_head_major,
    qkv_vec_head_major,
    stack_blocks,
    t_conv,
    t_conv1x1_as_linear,
    t_conv_transpose,
    t_linear,
    t_vec,
    max_index,
)

REASSEMBLY_SCALES = (4, 2, 1, 0.5)


# ---------------------------------------------------------------------------
# Config inference from weight shapes
# ---------------------------------------------------------------------------


def get_config_from_state_dict(state_dict: dict, enable_cache=True, enable_optimizations=True) -> dict:
    """Infer model hyperparameters purely from tensor shapes/keys
    (config_from_original_state_dict.py:17-43)."""
    pe = state_dict["pretrained.patch_embed.proj.weight"]  # (F, 3, P, P)
    features = int(pe.shape[0])
    patch_px = int(pe.shape[-1])

    num_blocks = max_index(state_dict, "pretrained.blocks") + 1
    assert num_blocks > 1, "Could not find transformer blocks in state dict"

    reassembly = []
    for i in range(1, 5):
        w = state_dict[f"depth_head.scratch.layer{i}_rn.weight"]  # (Cf, R_i, 3, 3)
        reassembly.append(int(w.shape[1]))
    fusion_channels = int(state_dict["depth_head.scratch.layer1_rn.weight"].shape[0])

    num_pos_tokens = int(state_dict["pretrained.pos_embed"].shape[1])
    base_grid = int(math.isqrt(num_pos_tokens - 1))

    return {
        "features_per_token": features,
        "num_blocks": int(num_blocks),
        # heads aren't recoverable from weights; F/64 holds for all released
        # sizes (config_from_original_state_dict.py:78-90)
        "num_heads": features // 64,
        "reassembly_features_list": reassembly,
        "fusion_channels": fusion_channels,
        "patch_size_px": patch_px,
        "base_patch_grid_hw": (base_grid, base_grid),
        "is_giant": "pretrained.blocks.0.mlp.w12.weight" in state_dict,
        "is_metric": "is_metric" in state_dict,
        "enable_cache": enable_cache,
        "enable_optimizations": enable_optimizations,
    }


# ---------------------------------------------------------------------------
# Parameter conversion
# ---------------------------------------------------------------------------


def _convert_encoder(sd: dict, cfg: dict) -> dict:
    pos_embed = sd["pretrained.pos_embed"].astype(np.float32)  # (1, 1+N, F)
    blocks = []
    for i in range(cfg["num_blocks"]):
        pre = f"pretrained.blocks.{i}"
        bp = {
            "norm1_scale": t_vec(sd[f"{pre}.norm1.weight"]),
            "norm1_bias": t_vec(sd[f"{pre}.norm1.bias"]),
            "qkv_kernel": qkv_head_major(t_linear(sd[f"{pre}.attn.qkv.weight"]), cfg["num_heads"]),
            "qkv_bias": qkv_vec_head_major(t_vec(sd[f"{pre}.attn.qkv.bias"]), cfg["num_heads"]),
            "proj_kernel": t_linear(sd[f"{pre}.attn.proj.weight"]),
            "proj_bias": t_vec(sd[f"{pre}.attn.proj.bias"]),
            "ls1": t_vec(sd[f"{pre}.ls1.gamma"]),
            "norm2_scale": t_vec(sd[f"{pre}.norm2.weight"]),
            "norm2_bias": t_vec(sd[f"{pre}.norm2.bias"]),
            "ls2": t_vec(sd[f"{pre}.ls2.gamma"]),
        }
        if cfg["is_giant"]:
            bp.update(
                w12_kernel=t_linear(sd[f"{pre}.mlp.w12.weight"]),
                w12_bias=t_vec(sd[f"{pre}.mlp.w12.bias"]),
                w3_kernel=t_linear(sd[f"{pre}.mlp.w3.weight"]),
                w3_bias=t_vec(sd[f"{pre}.mlp.w3.bias"]),
            )
        else:
            bp.update(
                fc1_kernel=t_linear(sd[f"{pre}.mlp.fc1.weight"]),
                fc1_bias=t_vec(sd[f"{pre}.mlp.fc1.bias"]),
                fc2_kernel=t_linear(sd[f"{pre}.mlp.fc2.weight"]),
                fc2_bias=t_vec(sd[f"{pre}.mlp.fc2.bias"]),
            )
        blocks.append(bp)

    return {
        "cls_token": t_vec(sd["pretrained.cls_token"]),
        # split single pos_embed into cls + patch parts (convert_original_state_dict_keys.py:295-317)
        "cls_embed": pos_embed[:, :1, :],
        "pos_embed": pos_embed[:, 1:, :],
        "blocks": stack_blocks(blocks),
        "outnorm_scale": t_vec(sd["pretrained.norm.weight"]),
        "outnorm_bias": t_vec(sd["pretrained.norm.bias"]),
    }


def _convert_reassembly(sd: dict) -> list:
    out = []
    for i in range(4):
        p = {
            "proj_kernel": t_conv1x1_as_linear(sd[f"depth_head.projects.{i}.weight"]),
            "proj_bias": t_vec(sd[f"depth_head.projects.{i}.bias"]),
            "fuse_kernel": t_conv(sd[f"depth_head.scratch.layer{i + 1}_rn.weight"]),
        }
        rk = f"depth_head.resize_layers.{i}.weight"
        if rk in sd:  # stage 2 (noscale) has no resize layer (Identity)
            w = sd[rk]
            if i in (0, 1):  # ConvTranspose2d x4 / x2
                p["resample_kernel"] = t_conv_transpose(w)
            else:  # stage 3: stride-2 3x3 conv
                p["resample_kernel"] = t_conv(w)
            p["resample_bias"] = t_vec(sd[f"depth_head.resize_layers.{i}.bias"])
        out.append(p)
    return out


def _res_unit(sd: dict, prefix: str) -> dict:
    return {
        "conv1_kernel": t_conv(sd[f"{prefix}.conv1.weight"]),
        "conv1_bias": t_vec(sd[f"{prefix}.conv1.bias"]),
        "conv2_kernel": t_conv(sd[f"{prefix}.conv2.weight"]),
        "conv2_bias": t_vec(sd[f"{prefix}.conv2.bias"]),
    }


def convert_fusion(sd: dict) -> list:
    """refinenet{k} -> blocks[k-1]; refinenet4.resConfUnit1 is unused and
    discarded (convert_original_state_dict_keys.py:232-233)."""
    blocks = []
    for k in range(1, 5):
        pre = f"depth_head.scratch.refinenet{k}"
        p = {
            "res2": _res_unit(sd, f"{pre}.resConfUnit2"),
            "out_kernel": t_conv1x1_as_linear(sd[f"{pre}.out_conv.weight"]),
            "out_bias": t_vec(sd[f"{pre}.out_conv.bias"]),
        }
        if k != 4:  # top-most block has no reassembly conv (fusion_model.py:89-114)
            p["res1"] = _res_unit(sd, f"{pre}.resConfUnit1")
        blocks.append(p)
    return blocks


def convert_head(sd: dict, prefix: str = "depth_head.scratch") -> dict:
    return {
        "conv_in_kernel": t_conv(sd[f"{prefix}.output_conv1.weight"]),
        "conv_in_bias": t_vec(sd[f"{prefix}.output_conv1.bias"]),
        "conv_mid_kernel": t_conv(sd[f"{prefix}.output_conv2.0.weight"]),
        "conv_mid_bias": t_vec(sd[f"{prefix}.output_conv2.0.bias"]),
        "proj_kernel": t_conv1x1_as_linear(sd[f"{prefix}.output_conv2.2.weight"]),
        "proj_bias": t_vec(sd[f"{prefix}.output_conv2.2.bias"]),
    }


def convert_state_dict(state_dict: dict, cfg: dict) -> dict:
    """Original Depth-Anything state dict -> parameter pytree (numpy, f32)."""
    sd = state_dict
    return {
        "patch_embed": {
            "kernel": t_conv(sd["pretrained.patch_embed.proj.weight"]),
            "bias": t_vec(sd["pretrained.patch_embed.proj.bias"]),
        },
        "encoder": _convert_encoder(sd, cfg),
        "reassemble": _convert_reassembly(sd),
        "fusion": convert_fusion(sd),
        "head": convert_head(sd),
    }
