"""MiDaS v3.1 BEiT family: full forward pipeline assembly.

Pipeline: patch embed (16px) -> BEiT encoder (relpos bias, 4 stages) ->
reassembly WITH readout projection (v31_beit/reassembly_model.py:109-128) ->
fusion -> head (fixed 2x upsample, v31_beit/head_model.py:43)."""

from __future__ import annotations

from ..ops.nn import patchify_embed
from .beit import BEiTConfig, compute_bias_stack, encoder_forward
from .dpt_neck import fusion_forward, head_forward, reassemble_forward

# MiDaS normalization (v31_beit/patch_embed.py:38-39)
MEAN_RGB = (0.5, 0.5, 0.5)
STD_RGB = (0.5, 0.5, 0.5)

REASSEMBLY_SCALES = (4, 2, 1, 0.5)


def make_family_spec(config_dict: dict) -> dict:
    enc_cfg = BEiTConfig(
        features=config_dict["features_per_token"],
        num_heads=config_dict["num_heads"],
        num_blocks=config_dict["num_blocks"],
        base_grid_hw=tuple(config_dict["base_patch_grid_hw"]),
        attn_impl="pallas" if config_dict.get("enable_optimizations", True) else "xla",
    )
    patch_px = config_dict["patch_size_px"]

    def _neck(params, stages, grid):
        maps = reassemble_forward(stages, grid, params["reassemble"], REASSEMBLY_SCALES, readout="project")
        fused = fusion_forward(maps, params["fusion"])
        return head_forward(fused, params["head"], 2.0, is_metric=False)

    def forward(params, image_nhwc, aux=None):
        tokens, grid = patchify_embed(image_nhwc, params["patch_embed"]["kernel"], params["patch_embed"]["bias"])
        stages = encoder_forward(params["encoder"], tokens, grid, enc_cfg, bias_stack=aux)
        return _neck(params, stages, grid)

    def forward_capture(params, image_nhwc, aux=None):
        tokens, grid = patchify_embed(image_nhwc, params["patch_embed"]["kernel"], params["patch_embed"]["bias"])
        stages, internals = encoder_forward(params["encoder"], tokens, grid, enc_cfg, bias_stack=aux, capture=True)
        maps = reassemble_forward(stages, grid, params["reassemble"], REASSEMBLY_SCALES, readout="project")
        internals["reassembly_maps"] = maps
        fused = fusion_forward(maps, params["fusion"])
        internals["fused_map"] = fused
        depth = head_forward(fused, params["head"], 2.0, is_metric=False)
        return depth, internals

    def make_aux(params, grid_hw):
        """Per-grid relpos bias stack — the enable_cache path (the reference's
        GridCache, cached by the DPTModel facade keyed on grid). Pre-padded to
        the flash kernel's 128-lane tiles so the serving path never re-pads."""
        n = grid_hw[0] * grid_hw[1] + 1
        pad_to = ((n + 127) // 128) * 128
        return compute_bias_stack(
            params["encoder"]["blocks"]["relpos_lut"], enc_cfg.base_grid_hw, grid_hw, pad_to=pad_to
        )

    def aux_bytes_estimate(config, grid_hw):
        from .beit import calculate_bias_bytes

        n = grid_hw[0] * grid_hw[1] + 1
        pad_to = ((n + 127) // 128) * 128
        padded_grid = (1, pad_to - 1)  # n' = pad_to for the bytes math
        return calculate_bias_bytes(config["num_blocks"], config["num_heads"], padded_grid)

    base_grid = config_dict["base_patch_grid_hw"]
    return {
        "forward": forward,
        "forward_capture": forward_capture,
        "head_upsample": 2.0,  # MiDaS-fixed (v31_beit/head_model.py:43)
        "make_aux": make_aux,
        "aux_bytes_estimate": aux_bytes_estimate,
        "mean_rgb": MEAN_RGB,
        "std_rgb": STD_RGB,
        "patch_size_px": patch_px,
        "tiling_size": 2 * patch_px,  # v31_beit/patch_embed.py:66
        "default_size_px": base_grid[0] * patch_px,
        "encoder_config": enc_cfg,
    }
