"""Depth-Anything V1 model factory (reference make_depthanythingv1_dpt.py).

V1 shares the original checkpoint format with V2; the encoder taps the last 4
consecutive blocks instead of 4 even stages (v1 image_encoder_model.py:92-104)
and has no SwiGLU/metric variants."""

from __future__ import annotations

import jax.numpy as jnp

from .checkpoints.depth_anything import convert_state_dict, get_config_from_state_dict
from .dpt import DPTModel
from .models.depth_anything import make_family_spec


def make_depthanythingv1_dpt_from_original_state_dict(
    state_dict: dict,
    enable_cache: bool = True,
    enable_optimizations: bool = True,
    strict_load: bool = True,
    dtype=jnp.float32,
) -> tuple[dict, DPTModel]:
    config_dict = get_config_from_state_dict(state_dict, enable_cache, enable_optimizations)
    config_dict.pop("is_giant", None), config_dict.pop("is_metric", None)
    config_dict["is_giant"] = False
    config_dict["is_metric"] = False
    params = convert_state_dict(state_dict, config_dict)
    spec = make_family_spec(config_dict, version=1)
    return config_dict, DPTModel(params, config_dict, spec, dtype=dtype)


def make_depthanythingv1_dpt(
    features_per_token: int,
    num_heads: int,
    num_blocks: int,
    reassembly_features_list,
    base_patch_grid_hw,
    fusion_channels: int = 256,
    patch_size_px: int = 14,
    enable_cache: bool = True,
    enable_optimizations: bool = True,
    dtype=jnp.float32,
    seed: int = 0,
) -> DPTModel:
    """Standard configs (reference make_depthanythingv1_dpt.py:67-111):
    vit-small F=384 H=6 L=12 fusion=64; vit-base F=768 H=12 L=12 fusion=128;
    vit-large F=1024 H=16 L=24 fusion=256 — all patch 14, base grid 37."""
    from .checkpoints.random_init import random_depth_anything_params

    config_dict = {
        "features_per_token": features_per_token,
        "num_blocks": num_blocks,
        "num_heads": num_heads,
        "reassembly_features_list": list(reassembly_features_list),
        "fusion_channels": fusion_channels,
        "patch_size_px": patch_size_px,
        "base_patch_grid_hw": tuple(base_patch_grid_hw),
        "is_giant": False,
        "is_metric": False,
        "enable_cache": enable_cache,
        "enable_optimizations": enable_optimizations,
    }
    params = random_depth_anything_params(config_dict, seed=seed)
    spec = make_family_spec(config_dict, version=1)
    return DPTModel(params, config_dict, spec, dtype=dtype)
