"""MiDaS v3.1 SwinV2 checkpoint conversion: original MiDaS ``.pt`` state dicts
-> (config dict, parameter pytree).

Reference logic mirrored:
* config from shapes — heads per stage from logit_scale shapes, layers per
  stage from max block index, window size & base grid inferred from the stored
  attn_mask shape ([n,A,A] -> win=sqrt(A), grid=sqrt(nA)), pretrained window
  sizes from a window-size LUT:
  v31_swinv2/state_dict_conversion/config_from_midas_state_dict.py:19-215
* key conversion — logit_scale clamp(max=log(100)).exp() folded at load,
  attn_mask buffers dropped:
  v31_swinv2/state_dict_conversion/convert_midas_state_dict_keys.py:115-181
"""

from __future__ import annotations

import math

import numpy as np

from .convert_common import t_conv, t_linear, t_vec
from .beit import _convert_fusion, _convert_head  # same scratch.* layout as BEiT

PRETRAINED_WINDOW_LUT = {16: (16, 16, 16, 8), 24: (12, 12, 12, 6)}


def get_config_from_state_dict(state_dict: dict, enable_cache=True, enable_optimizations=True) -> dict:
    # heads & layer counts per stage
    heads = {}
    layers = {}
    for key in state_dict:
        if not key.startswith("pretrained.model.layers."):
            continue
        parts = key.split(".")
        s = int(parts[3])
        if key.endswith("logit_scale"):
            heads[s] = int(state_dict[key].shape[0])
        if parts[4] == "blocks":
            layers[s] = max(layers.get(s, 0), int(parts[5]) + 1)
    heads_per_stage = [heads[s] for s in sorted(heads)]
    layers_per_stage = [layers[s] for s in sorted(layers)]
    assert len(heads_per_stage) == 4, f"Expecting 4 swinv2 stages, got {len(heads_per_stage)}"

    # window size + base grid from the first stored attn_mask ([n, A, A])
    mask_key = next(k for k in sorted(state_dict) if k.endswith("attn_mask"))
    num_windows, window_area = state_dict[mask_key].shape[0:2]
    win = int(math.isqrt(int(window_area)))
    base_grid = int(math.isqrt(int(num_windows * window_area)))

    pe = state_dict["pretrained.model.patch_embed.proj.weight"]  # (F, 3, P, P)
    f0 = int(pe.shape[0])
    return {
        "features_per_stage": [f0, 2 * f0, 4 * f0, 8 * f0],
        "heads_per_stage": heads_per_stage,
        "layers_per_stage": layers_per_stage,
        "base_patch_grid_hw": (base_grid, base_grid),
        "window_size_hw": (win, win),
        "pretrained_window_sizes_per_stage": list(PRETRAINED_WINDOW_LUT.get(win, (None,) * 4)),
        "fusion_channels": int(state_dict["scratch.layer1_rn.weight"].shape[0]),
        "patch_size_px": int(pe.shape[-1]),
        "enable_cache": enable_cache,
        "enable_optimizations": enable_optimizations,
    }


def _convert_block(sd: dict, pre: str) -> dict:
    logit_scale = sd[f"{pre}.attn.logit_scale"].astype(np.float32).reshape(-1)  # (H,)
    # fold clamp+exp at load (convert_midas_state_dict_keys.py:115-131)
    logit_scale = np.exp(np.minimum(logit_scale, math.log(100.0)))
    return {
        "qkv_kernel": t_linear(sd[f"{pre}.attn.qkv.weight"]),
        "q_bias": t_vec(sd[f"{pre}.attn.q_bias"]).reshape(-1),
        "v_bias": t_vec(sd[f"{pre}.attn.v_bias"]).reshape(-1),
        "proj_kernel": t_linear(sd[f"{pre}.attn.proj.weight"]),
        "proj_bias": t_vec(sd[f"{pre}.attn.proj.bias"]),
        "logit_scale": logit_scale,
        "cpb0_kernel": t_linear(sd[f"{pre}.attn.cpb_mlp.0.weight"]),
        "cpb0_bias": t_vec(sd[f"{pre}.attn.cpb_mlp.0.bias"]),
        "cpb1_kernel": t_linear(sd[f"{pre}.attn.cpb_mlp.2.weight"]),
        "norm1_scale": t_vec(sd[f"{pre}.norm1.weight"]),
        "norm1_bias": t_vec(sd[f"{pre}.norm1.bias"]),
        "norm2_scale": t_vec(sd[f"{pre}.norm2.weight"]),
        "norm2_bias": t_vec(sd[f"{pre}.norm2.bias"]),
        "fc1_kernel": t_linear(sd[f"{pre}.mlp.fc1.weight"]),
        "fc1_bias": t_vec(sd[f"{pre}.mlp.fc1.bias"]),
        "fc2_kernel": t_linear(sd[f"{pre}.mlp.fc2.weight"]),
        "fc2_bias": t_vec(sd[f"{pre}.mlp.fc2.bias"]),
    }


def _stack_pairs(blocks: list[dict]) -> dict:
    """Stack per-stage blocks as (no-shift, shift) pairs along a leading axis
    for the pair-scan (image_encoder_model.py:146-160 builds blocks in pairs)."""
    pairs = []
    for i in range(0, len(blocks), 2):
        pairs.append({"b0": blocks[i], "b1": blocks[i + 1]})
    keys0 = pairs[0]["b0"].keys()
    return {
        side: {k: np.stack([p[side][k] for p in pairs], axis=0) for k in keys0}
        for side in ("b0", "b1")
    }


def convert_state_dict(sd: dict, cfg: dict) -> dict:
    stages = []
    for s, n_layers in enumerate(cfg["layers_per_stage"]):
        blocks = [_convert_block(sd, f"pretrained.model.layers.{s}.blocks.{b}") for b in range(n_layers)]
        stages.append(_stack_pairs(blocks))
    merges = []
    for s in range(3):
        pre = f"pretrained.model.layers.{s}.downsample"
        merges.append(
            {
                "reduction_kernel": t_linear(sd[f"{pre}.reduction.weight"]),
                "norm_scale": t_vec(sd[f"{pre}.norm.weight"]),
                "norm_bias": t_vec(sd[f"{pre}.norm.bias"]),
            }
        )
    reassemble = [{"fuse_kernel": t_conv(sd[f"scratch.layer{i}_rn.weight"])} for i in range(1, 5)]
    return {
        "patch_embed": {
            "kernel": t_conv(sd["pretrained.model.patch_embed.proj.weight"]),
            "bias": t_vec(sd["pretrained.model.patch_embed.proj.bias"]),
            "norm_scale": t_vec(sd["pretrained.model.patch_embed.norm.weight"]),
            "norm_bias": t_vec(sd["pretrained.model.patch_embed.norm.bias"]),
        },
        "encoder": {"stages": stages, "merges": merges},
        "reassemble": reassemble,
        "fusion": _convert_fusion(sd),
        "head": _convert_head(sd),
    }


def random_original_state_dict(config: dict, seed: int = 0) -> dict:
    """Synthetic MiDaS-SwinV2-format state dict (original torch keys/shapes)."""
    rng = np.random.default_rng(seed)
    feats = config["features_per_stage"]
    heads = config["heads_per_stage"]
    layers = config["layers_per_stage"]
    p = config["patch_size_px"]
    g = config["base_patch_grid_hw"][0]
    win = config["window_size_hw"][0]
    cf = config["fusion_channels"]

    def w(*shape, scale=0.05):
        # draw f32 directly: half the memory traffic and ~2x faster than
        # f64-then-cast, which dominates ViT-Giant synthetic builds
        return rng.standard_normal(shape, dtype=np.float32) * np.float32(scale)

    f0 = feats[0]
    sd = {
        "pretrained.model.patch_embed.proj.weight": w(f0, 3, p, p),
        "pretrained.model.patch_embed.proj.bias": w(f0),
        "pretrained.model.patch_embed.norm.weight": 1.0 + w(f0),
        "pretrained.model.patch_embed.norm.bias": w(f0),
    }
    for s in range(4):
        f, h = feats[s], heads[s]
        hidden = 4 * f
        for b in range(layers[s]):
            pre = f"pretrained.model.layers.{s}.blocks.{b}"
            sd[f"{pre}.attn.qkv.weight"] = w(3 * f, f)
            sd[f"{pre}.attn.q_bias"] = w(f)
            sd[f"{pre}.attn.v_bias"] = w(f)
            sd[f"{pre}.attn.proj.weight"] = w(f, f)
            sd[f"{pre}.attn.proj.bias"] = w(f)
            sd[f"{pre}.attn.logit_scale"] = np.log(10 * np.ones((h, 1, 1), dtype=np.float32)) + w(h, 1, 1)
            sd[f"{pre}.attn.cpb_mlp.0.weight"] = w(512, 2, scale=0.5)
            sd[f"{pre}.attn.cpb_mlp.0.bias"] = w(512)
            sd[f"{pre}.attn.cpb_mlp.2.weight"] = w(h, 512)
            sd[f"{pre}.norm1.weight"] = 1.0 + w(f)
            sd[f"{pre}.norm1.bias"] = w(f)
            sd[f"{pre}.norm2.weight"] = 1.0 + w(f)
            sd[f"{pre}.norm2.bias"] = w(f)
            sd[f"{pre}.mlp.fc1.weight"] = w(hidden, f)
            sd[f"{pre}.mlp.fc1.bias"] = w(hidden)
            sd[f"{pre}.mlp.fc2.weight"] = w(f, hidden)
            sd[f"{pre}.mlp.fc2.bias"] = w(f)
        if s < 3:
            pre = f"pretrained.model.layers.{s}.downsample"
            sd[f"{pre}.reduction.weight"] = w(feats[s + 1], 4 * f)
            sd[f"{pre}.norm.weight"] = 1.0 + w(feats[s + 1])
            sd[f"{pre}.norm.bias"] = w(feats[s + 1])

    # Neck conv weights use fan-in (He-like) scaling so the synthetic fusion/
    # head chain has ~unit gain: with a flat 0.05 scale the 256-channel 3x3
    # convs amplify ~2.4x each, the fused map reaches std ~500 and the head's
    # final ReLU output is dominated by a single random scalar (sum(W)*mean(h)),
    # clipping 80-95% of depth outputs to zero and poisoning every
    # low-precision error measurement on these fixtures (round-3 diagnosis,
    # docs/performance.md).
    def cw(co, ci, k):
        return w(co, ci, k, k, scale=1.0 / math.sqrt(ci * k * k))

    # stored attn_mask buffer (drives window/base-grid config inference; grid g, window win)
    area = win * win
    n_windows = (g // win) ** 2
    sd["pretrained.model.layers.0.blocks.1.attn_mask"] = np.zeros((n_windows, area, area), dtype=np.float32)

    for i, f in enumerate(feats, start=1):
        sd[f"scratch.layer{i}_rn.weight"] = cw(cf, f, 3)
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
    # positive final bias keeps most synthetic depth outputs above the head's
    # ReLU clip, like real inverse-depth heads — otherwise low-precision error
    # measurements on these fixtures are dominated by ReLU boundary flips
    # (diagnosed round 3: 86% zero-clipped outputs inflated SwinV2's bf16
    # abs-rel ~5x; see docs/performance.md)
    sd["scratch.output_conv.4.bias"] = np.float32(2.0) + w(1)
    return sd
