"""MiDaS v3.1 BEiT checkpoint conversion: original MiDaS ``.pt`` state dicts
-> (config dict, parameter pytree).

Reference logic mirrored:
* config from shapes (heads/base-grid from the relpos LUT):
  v31_beit/state_dict_conversion/config_from_midas_state_dict.py:17-246
* key conversion incl. q/v-bias handling and dropping the stored
  relative_position_index buffers:
  v31_beit/state_dict_conversion/convert_midas_state_dict_keys.py:18-136
"""

from __future__ import annotations

import math

import numpy as np

from .convert_common import (
    qkv_head_major,
    stack_blocks,
    t_conv,
    t_conv1x1_as_linear,
    t_conv_transpose,
    t_linear,
    t_vec,
    max_index,
)
from .depth_anything import _res_unit


def get_config_from_state_dict(state_dict: dict, enable_cache=True, enable_optimizations=True) -> dict:
    pe = state_dict["pretrained.model.patch_embed.proj.weight"]  # (F, 3, P, P)
    lut = state_dict["pretrained.model.blocks.0.attn.relative_position_bias_table"]  # (R, H)
    num_blocks = max_index(state_dict, "pretrained.model.blocks") + 1
    assert num_blocks > 1, "Could not find transformer blocks in state dict"

    # base grid from LUT length: R = (2g-1)^2 + 3 (config_from_midas_state_dict.py:205-246)
    num_rel = int(lut.shape[0]) - 3
    side = math.isqrt(num_rel)
    assert side * side == num_rel and side % 2 == 1, "relpos LUT length is not (2g-1)^2+3"
    base_grid = (side + 1) // 2

    reassembly = [int(state_dict[f"scratch.layer{i}_rn.weight"].shape[1]) for i in range(1, 5)]
    return {
        "features_per_token": int(pe.shape[0]),
        "num_blocks": int(num_blocks),
        "num_heads": int(lut.shape[1]),
        "reassembly_features_list": reassembly,
        "fusion_channels": int(state_dict["scratch.layer1_rn.weight"].shape[0]),
        "patch_size_px": int(pe.shape[-1]),
        "base_patch_grid_hw": (base_grid, base_grid),
        "enable_cache": enable_cache,
        "enable_optimizations": enable_optimizations,
    }


def _convert_encoder(sd: dict, cfg: dict) -> dict:
    blocks = []
    for i in range(cfg["num_blocks"]):
        pre = f"pretrained.model.blocks.{i}"
        blocks.append(
            {
                "norm1_scale": t_vec(sd[f"{pre}.norm1.weight"]),
                "norm1_bias": t_vec(sd[f"{pre}.norm1.bias"]),
                "qkv_kernel": qkv_head_major(t_linear(sd[f"{pre}.attn.qkv.weight"]), cfg["num_heads"]),
                "q_bias": t_vec(sd[f"{pre}.attn.q_bias"]).reshape(-1),
                "v_bias": t_vec(sd[f"{pre}.attn.v_bias"]).reshape(-1),
                "proj_kernel": t_linear(sd[f"{pre}.attn.proj.weight"]),
                "proj_bias": t_vec(sd[f"{pre}.attn.proj.bias"]),
                "ls1": t_vec(sd[f"{pre}.gamma_1"]),
                "norm2_scale": t_vec(sd[f"{pre}.norm2.weight"]),
                "norm2_bias": t_vec(sd[f"{pre}.norm2.bias"]),
                "ls2": t_vec(sd[f"{pre}.gamma_2"]),
                "fc1_kernel": t_linear(sd[f"{pre}.mlp.fc1.weight"]),
                "fc1_bias": t_vec(sd[f"{pre}.mlp.fc1.bias"]),
                "fc2_kernel": t_linear(sd[f"{pre}.mlp.fc2.weight"]),
                "fc2_bias": t_vec(sd[f"{pre}.mlp.fc2.bias"]),
                "relpos_lut": t_vec(sd[f"{pre}.attn.relative_position_bias_table"]),
                # stored relative_position_index buffers are deterministic and dropped
                # (convert_midas_state_dict_keys.py:158-161)
            }
        )
    return {
        "cls_token": t_vec(sd["pretrained.model.cls_token"]),
        "blocks": stack_blocks(blocks),
    }


def _convert_reassembly(sd: dict) -> list:
    out = []
    for s in range(1, 5):
        pre = f"pretrained.act_postprocess{s}"
        p = {
            "readout": {
                "kernel": t_linear(sd[f"{pre}.0.project.0.weight"]),
                "bias": t_vec(sd[f"{pre}.0.project.0.bias"]),
            },
            "proj_kernel": t_conv1x1_as_linear(sd[f"{pre}.3.weight"]),
            "proj_bias": t_vec(sd[f"{pre}.3.bias"]),
            "fuse_kernel": t_conv(sd[f"scratch.layer{s}_rn.weight"]),
        }
        rk = f"{pre}.4.weight"
        if rk in sd:
            w = sd[rk]
            p["resample_kernel"] = t_conv_transpose(w) if s in (1, 2) else t_conv(w)
            p["resample_bias"] = t_vec(sd[f"{pre}.4.bias"])
        out.append(p)
    return out


def _convert_fusion(sd: dict) -> list:
    blocks = []
    for k in range(1, 5):
        pre = f"scratch.refinenet{k}"
        p = {
            "res2": _res_unit(sd, f"{pre}.resConfUnit2"),
            "out_kernel": t_conv1x1_as_linear(sd[f"{pre}.out_conv.weight"]),
            "out_bias": t_vec(sd[f"{pre}.out_conv.bias"]),
        }
        if k != 4:
            p["res1"] = _res_unit(sd, f"{pre}.resConfUnit1")
        blocks.append(p)
    return blocks


def _convert_head(sd: dict) -> dict:
    return {
        "conv_in_kernel": t_conv(sd["scratch.output_conv.0.weight"]),
        "conv_in_bias": t_vec(sd["scratch.output_conv.0.bias"]),
        "conv_mid_kernel": t_conv(sd["scratch.output_conv.2.weight"]),
        "conv_mid_bias": t_vec(sd["scratch.output_conv.2.bias"]),
        "proj_kernel": t_conv1x1_as_linear(sd["scratch.output_conv.4.weight"]),
        "proj_bias": t_vec(sd["scratch.output_conv.4.bias"]),
    }


def convert_state_dict(sd: dict, cfg: dict) -> dict:
    return {
        "patch_embed": {
            "kernel": t_conv(sd["pretrained.model.patch_embed.proj.weight"]),
            "bias": t_vec(sd["pretrained.model.patch_embed.proj.bias"]),
        },
        "encoder": _convert_encoder(sd, cfg),
        "reassemble": _convert_reassembly(sd),
        "fusion": _convert_fusion(sd),
        "head": _convert_head(sd),
    }


def random_original_state_dict(config: dict, seed: int = 0) -> dict:
    """Synthetic MiDaS-BEiT-format state dict (original torch keys/shapes)."""
    rng = np.random.default_rng(seed)
    f = config["features_per_token"]
    p = config["patch_size_px"]
    g = config["base_patch_grid_hw"][0]
    heads = config["num_heads"]
    n_blocks = config["num_blocks"]
    reassembly = config["reassembly_features_list"]
    cf = config["fusion_channels"]
    lut_len = (2 * g - 1) ** 2 + 3

    def w(*shape, scale=0.05):
        # draw f32 directly: half the memory traffic and ~2x faster than
        # f64-then-cast, which dominates ViT-Giant synthetic builds
        return rng.standard_normal(shape, dtype=np.float32) * np.float32(scale)

    sd = {
        "pretrained.model.cls_token": w(1, 1, f),
        "pretrained.model.patch_embed.proj.weight": w(f, 3, p, p),
        "pretrained.model.patch_embed.proj.bias": w(f),
    }
    hidden = int(round(4.0 * f))
    for i in range(n_blocks):
        pre = f"pretrained.model.blocks.{i}"
        sd[f"{pre}.norm1.weight"] = 1.0 + w(f)
        sd[f"{pre}.norm1.bias"] = w(f)
        sd[f"{pre}.attn.qkv.weight"] = w(3 * f, f)
        sd[f"{pre}.attn.q_bias"] = w(f)
        sd[f"{pre}.attn.v_bias"] = w(f)
        sd[f"{pre}.attn.proj.weight"] = w(f, f)
        sd[f"{pre}.attn.proj.bias"] = w(f)
        sd[f"{pre}.attn.relative_position_bias_table"] = w(lut_len, heads, scale=0.2)
        sd[f"{pre}.attn.relative_position_index"] = np.zeros((g * g + 1, g * g + 1), dtype=np.int64)
        sd[f"{pre}.gamma_1"] = 1.0 + w(f)
        sd[f"{pre}.gamma_2"] = 1.0 + w(f)
        sd[f"{pre}.norm2.weight"] = 1.0 + w(f)
        sd[f"{pre}.norm2.bias"] = w(f)
        sd[f"{pre}.mlp.fc1.weight"] = w(hidden, f)
        sd[f"{pre}.mlp.fc1.bias"] = w(hidden)
        sd[f"{pre}.mlp.fc2.weight"] = w(f, hidden)
        sd[f"{pre}.mlp.fc2.bias"] = w(f)

    # Neck conv weights use fan-in (He-like) scaling so the synthetic fusion/
    # head chain has ~unit gain: with a flat 0.05 scale the 256-channel 3x3
    # convs amplify ~2.4x each, the fused map reaches std ~500 and the head's
    # final ReLU output is dominated by a single random scalar (sum(W)*mean(h)),
    # clipping 80-95% of depth outputs to zero and poisoning every
    # low-precision error measurement on these fixtures (round-3 diagnosis,
    # docs/performance.md).
    def cw(co, ci, k):
        return w(co, ci, k, k, scale=1.0 / math.sqrt(ci * k * k))

    for s, r in zip(range(1, 5), reassembly):
        pre = f"pretrained.act_postprocess{s}"
        sd[f"{pre}.0.project.0.weight"] = w(f, 2 * f, scale=1.0 / math.sqrt(2 * f))
        sd[f"{pre}.0.project.0.bias"] = w(f)
        sd[f"{pre}.3.weight"] = cw(r, f, 1)
        sd[f"{pre}.3.bias"] = w(r)
        sd[f"scratch.layer{s}_rn.weight"] = cw(cf, r, 3)
    sd["pretrained.act_postprocess1.4.weight"] = cw(reassembly[0], reassembly[0], 4)
    sd["pretrained.act_postprocess1.4.bias"] = w(reassembly[0])
    sd["pretrained.act_postprocess2.4.weight"] = cw(reassembly[1], reassembly[1], 2)
    sd["pretrained.act_postprocess2.4.bias"] = w(reassembly[1])
    sd["pretrained.act_postprocess4.4.weight"] = cw(reassembly[3], reassembly[3], 3)
    sd["pretrained.act_postprocess4.4.bias"] = w(reassembly[3])

    for k in range(1, 5):
        pre = f"scratch.refinenet{k}"
        for unit in (1, 2):
            for conv in (1, 2):
                sd[f"{pre}.resConfUnit{unit}.conv{conv}.weight"] = cw(cf, cf, 3)
                sd[f"{pre}.resConfUnit{unit}.conv{conv}.bias"] = w(cf)
        sd[f"{pre}.out_conv.weight"] = cw(cf, cf, 1)
        sd[f"{pre}.out_conv.bias"] = w(cf)

    ch = cf // 2
    sd["scratch.output_conv.0.weight"] = cw(ch, cf, 3)
    sd["scratch.output_conv.0.bias"] = w(ch)
    sd["scratch.output_conv.2.weight"] = cw(32, ch, 3)
    sd["scratch.output_conv.2.bias"] = w(32)
    sd["scratch.output_conv.4.weight"] = w(1, 32, 1, 1, scale=0.3 / math.sqrt(32))
    # positive final bias: keep synthetic depth mostly above the ReLU clip so
    # low-precision error metrics aren't dominated by boundary flips (see the
    # matching note in checkpoints/swinv2.py and docs/performance.md)
    sd["scratch.output_conv.4.bias"] = np.float32(2.0) + w(1)
    return sd
