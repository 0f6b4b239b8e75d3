"""Depth-Anything V2 model factory (reference make_depthanythingv2_dpt.py)."""

from __future__ import annotations

import jax.numpy as jnp

from .checkpoints.depth_anything import convert_state_dict, get_config_from_state_dict
from .dpt import DPTModel
from .models.depth_anything import make_family_spec


def make_depthanythingv2_dpt_from_original_state_dict(
    state_dict: dict,
    enable_cache: bool = True,
    enable_optimizations: bool = True,
    strict_load: bool = True,
    dtype=jnp.float32,
) -> tuple[dict, DPTModel]:
    """Build a DA-V2 DPT model from an original (unconverted) state dict.
    Returns (config_dict, model) — same contract as the reference
    (make_depthanythingv2_dpt.py:24-61). enable_cache is accepted for API
    parity; XLA's per-shape executable cache plays that role here."""
    config_dict = get_config_from_state_dict(state_dict, enable_cache, enable_optimizations)
    params = convert_state_dict(state_dict, config_dict)
    spec = make_family_spec(config_dict, version=2)
    return config_dict, DPTModel(params, config_dict, spec, dtype=dtype)


def make_depthanythingv2_dpt(
    features_per_token: int,
    num_heads: int,
    num_blocks: int,
    reassembly_features_list,
    base_patch_grid_hw,
    fusion_channels: int = 256,
    patch_size_px: int = 14,
    is_giant: bool = False,
    is_metric: bool = False,
    enable_cache: bool = True,
    enable_optimizations: bool = True,
    unroll_blocks: bool = False,
    dtype=jnp.float32,
    seed: int = 0,
) -> DPTModel:
    """Build a randomly-initialized DA-V2 model from explicit hyperparameters.

    Standard configs (reference make_depthanythingv2_dpt.py:85-123):
      vit-small: F=384,  H=6,  L=12, reassembly=[48,96,192,384],   fusion=64
      vit-base:  F=768,  H=12, L=12, reassembly=[96,192,384,768],  fusion=128
      vit-large: F=1024, H=16, L=24, reassembly=[256,512,1024,1024], fusion=256
      vit-giant: F=1536, H=24, L=40, reassembly=[1536]*4, fusion=384 (SwiGLU)
    """
    from .checkpoints.random_init import random_depth_anything_params

    config_dict = {
        "features_per_token": features_per_token,
        "num_blocks": num_blocks,
        "num_heads": num_heads,
        "reassembly_features_list": list(reassembly_features_list),
        "fusion_channels": fusion_channels,
        "patch_size_px": patch_size_px,
        "base_patch_grid_hw": tuple(base_patch_grid_hw),
        "is_giant": is_giant,
        "is_metric": is_metric,
        "enable_cache": enable_cache,
        "enable_optimizations": enable_optimizations,
        "unroll_blocks": unroll_blocks,
    }
    params = random_depth_anything_params(config_dict, seed=seed)
    spec = make_family_spec(config_dict, version=2)
    return DPTModel(params, config_dict, spec, dtype=dtype)
