"""Depth-Anything V1/V2 model family: full forward pipeline assembly.

Pipeline (reference dpt_model.py:61-83): patch embed -> DINOv2 encoder (4
outputs) -> reassembly -> fusion -> monocular head. V1 differs from V2 only in
encoder tap positions (v1 image_encoder_model.py:92-104) and lacking
SwiGLU/metric options."""

from __future__ import annotations

from ..ops.nn import patchify_embed
from .dinov2 import DinoV2Config, encoder_forward
from .dpt_neck import fusion_forward, head_forward, reassemble_forward
from ..checkpoints.depth_anything import REASSEMBLY_SCALES

# ImageNet normalization (v2 patch_embed.py:38-39)
MEAN_RGB = (0.485, 0.456, 0.406)
STD_RGB = (0.229, 0.224, 0.225)


def make_family_spec(config_dict: dict, version: int) -> dict:
    """Build the family_spec consumed by DPTModel from an inferred config."""
    num_blocks = config_dict["num_blocks"]
    taps = DinoV2Config.stage_taps(num_blocks) if version == 2 else DinoV2Config.last4_taps(num_blocks)
    enc_cfg = DinoV2Config(
        features=config_dict["features_per_token"],
        num_heads=config_dict["num_heads"],
        num_blocks=num_blocks,
        base_grid_hw=tuple(config_dict["base_patch_grid_hw"]),
        is_giant=config_dict.get("is_giant", False),
        taps=taps,
        attn_impl="pallas" if config_dict.get("enable_optimizations", True) else "xla",
        unroll=config_dict.get("unroll_blocks", False),
    )
    patch_px = config_dict["patch_size_px"]
    is_metric = config_dict.get("is_metric", False)
    head_upsample = patch_px / 8  # head_model.py:38-51

    def forward(params, image_nhwc, aux=None):
        tokens, grid = patchify_embed(image_nhwc, params["patch_embed"]["kernel"], params["patch_embed"]["bias"])
        stages = encoder_forward(params["encoder"], tokens, grid, enc_cfg)
        maps = reassemble_forward(stages, grid, params["reassemble"], REASSEMBLY_SCALES, readout="ignore")
        fused = fusion_forward(maps, params["fusion"])
        return head_forward(fused, params["head"], head_upsample, is_metric)

    def forward_capture(params, image_nhwc, aux=None):
        tokens, grid = patchify_embed(image_nhwc, params["patch_embed"]["kernel"], params["patch_embed"]["bias"])
        stages, internals = encoder_forward(params["encoder"], tokens, grid, enc_cfg, capture=True)
        maps = reassemble_forward(stages, grid, params["reassemble"], REASSEMBLY_SCALES, readout="ignore")
        internals["reassembly_maps"] = maps
        fused = fusion_forward(maps, params["fusion"])
        internals["fused_map"] = fused
        depth = head_forward(fused, params["head"], head_upsample, is_metric)
        return depth, internals

    base_grid = config_dict["base_patch_grid_hw"]
    return {
        "forward": forward,
        "forward_capture": forward_capture,
        "head_upsample": head_upsample,  # P/8 (head_model.py:38-51)
        "mean_rgb": MEAN_RGB,
        "std_rgb": STD_RGB,
        "patch_size_px": patch_px,
        "tiling_size": 2 * patch_px,  # patch_embed.py:68-69
        "default_size_px": base_grid[0] * patch_px,
        "encoder_config": enc_cfg,
    }
