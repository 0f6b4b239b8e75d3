"""MiDaS v3.1 SwinV2 model factory (reference make_swinv2_dpt.py)."""

from __future__ import annotations

import jax.numpy as jnp

from .checkpoints.swinv2 import convert_state_dict, get_config_from_state_dict, random_original_state_dict
from .dpt import DPTModel
from .models.swinv2_family import make_family_spec


def make_swinv2_dpt_from_midas_v31_state_dict(
    state_dict: dict,
    enable_cache: bool = True,
    enable_optimizations: bool = True,
    strict_load: bool = True,
    dtype=jnp.float32,
) -> tuple[dict, DPTModel]:
    """Build a SwinV2 DPT model from an original MiDaS v3.1 state dict."""
    config_dict = get_config_from_state_dict(state_dict, enable_cache, enable_optimizations)
    params = convert_state_dict(state_dict, config_dict)
    spec = make_family_spec(config_dict)
    return config_dict, DPTModel(params, config_dict, spec, dtype=dtype)


def make_swinv2_dpt(
    features_per_stage=(96, 192, 384, 768),
    heads_per_stage=(3, 6, 12, 24),
    layers_per_stage=(2, 2, 6, 2),
    base_patch_grid_hw=(64, 64),
    window_size_hw=(16, 16),
    pretrained_window_sizes_per_stage=(16, 16, 16, 8),
    fusion_channels: int = 256,
    patch_size_px: int = 4,
    enable_cache: bool = True,
    enable_optimizations: bool = True,
    dtype=jnp.float32,
    seed: int = 0,
) -> DPTModel:
    """Randomly-initialized SwinV2 DPT. Standard configs (reference
    make_swinv2_dpt.py:67-115):
      swin2-tiny-256:  F=(96,192,384,768)    H=(3,6,12,24)  L=(2,2,6,2)  win=16 grid=64
      swin2-base-384:  F=(128,256,512,1024)  H=(4,8,16,32)  L=(2,2,18,2) win=24 grid=96
      swin2-large-384: F=(192,384,768,1536)  H=(6,12,24,48) L=(2,2,18,2) win=24 grid=96
    """
    config_dict = {
        "features_per_stage": list(features_per_stage),
        "heads_per_stage": list(heads_per_stage),
        "layers_per_stage": list(layers_per_stage),
        "base_patch_grid_hw": tuple(base_patch_grid_hw),
        "window_size_hw": tuple(window_size_hw),
        "pretrained_window_sizes_per_stage": list(pretrained_window_sizes_per_stage),
        "fusion_channels": fusion_channels,
        "patch_size_px": patch_size_px,
        "enable_cache": enable_cache,
        "enable_optimizations": enable_optimizations,
    }
    sd = random_original_state_dict(config_dict, seed=seed)
    params = convert_state_dict(sd, config_dict)
    spec = make_family_spec(config_dict)
    return DPTModel(params, config_dict, spec, dtype=dtype)
