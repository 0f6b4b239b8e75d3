"""MiDaS v3.1 SwinV2 family: full forward pipeline assembly.

Pipeline: patch embed (4px + post-projection LayerNorm,
v31_swinv2/patch_embed.py:59,92) -> SwinV2 hierarchical encoder -> reassembly
(no readout token, no resampling — unflatten + 3x3 fuse projection only,
v31_swinv2/reassembly_model.py:49-52,102-122) -> fusion -> head (2x)."""

from __future__ import annotations

from ..ops.nn import conv2d, layer_norm, patchify_embed
from .dpt_neck import fusion_forward, head_forward
from .swinv2 import SWIN_LN_EPS, SwinV2Config, compute_cpb_stack, cpb_stack_bytes, encoder_forward

# MiDaS normalization (v31_swinv2/patch_embed.py:39-40)
MEAN_RGB = (0.5, 0.5, 0.5)
STD_RGB = (0.5, 0.5, 0.5)


def make_family_spec(config_dict: dict) -> dict:
    enc_cfg = SwinV2Config(
        features_per_stage=tuple(config_dict["features_per_stage"]),
        heads_per_stage=tuple(config_dict["heads_per_stage"]),
        layers_per_stage=tuple(config_dict["layers_per_stage"]),
        window_size_hw=tuple(config_dict["window_size_hw"]),
        pretrained_window_sizes=tuple(config_dict["pretrained_window_sizes_per_stage"]),
        attn_impl="pallas" if config_dict.get("enable_optimizations", True) else "xla",
    )
    patch_px = config_dict["patch_size_px"]

    def _embed(params, image_nhwc):
        tokens, grid = patchify_embed(image_nhwc, params["patch_embed"]["kernel"], params["patch_embed"]["bias"])
        tokens = layer_norm(tokens, params["patch_embed"]["norm_scale"], params["patch_embed"]["norm_bias"], eps=SWIN_LN_EPS)
        return tokens, grid

    def _neck(params, stages, grids):
        maps = []
        for tokens, (gh, gw), p in zip(stages, grids, params["reassemble"]):
            b, n, c = tokens.shape
            x = tokens.reshape(b, gh, gw, c)
            maps.append(conv2d(x, p["fuse_kernel"], None, stride=1, padding=1))
        fused = fusion_forward(tuple(maps), params["fusion"])
        return head_forward(fused, params["head"], 2.0, is_metric=False)

    def forward(params, image_nhwc, aux=None):
        tokens, grid = _embed(params, image_nhwc)
        stages, grids = encoder_forward(params["encoder"], tokens, grid, enc_cfg, aux=aux)
        return _neck(params, stages, grids)

    def forward_capture(params, image_nhwc, aux=None):
        tokens, grid = _embed(params, image_nhwc)
        stages, grids, internals = encoder_forward(params["encoder"], tokens, grid, enc_cfg, capture=True, aux=aux)
        maps = []
        for t, (gh, gw), p in zip(stages, grids, params["reassemble"]):
            b, n, c = t.shape
            maps.append(conv2d(t.reshape(b, gh, gw, c), p["fuse_kernel"], None, stride=1, padding=1))
        internals["reassembly_maps"] = tuple(maps)
        fused = fusion_forward(tuple(maps), params["fusion"])
        internals["fused_map"] = fused
        depth = head_forward(fused, params["head"], 2.0, is_metric=False)
        return depth, internals

    def make_aux(params, grid_hw):
        """Per-grid CPB bias stacks — the cross-frame cache equivalent of the
        reference's CPB GridCaches (cached by DPTModel keyed on grid;
        reference speedup claim: v31_swinv2/components/README.md:111)."""
        return compute_cpb_stack(params["encoder"], grid_hw, enc_cfg)

    def aux_bytes_estimate(config, grid_hw):
        return cpb_stack_bytes(enc_cfg, grid_hw)

    base_grid = config_dict["base_patch_grid_hw"]
    return {
        "forward": forward,
        "forward_capture": forward_capture,
        "head_upsample": 2.0,  # MiDaS-fixed (v31_swinv2/head_model.py:43)
        "make_aux": make_aux,
        "aux_bytes_estimate": aux_bytes_estimate,
        "mean_rgb": MEAN_RGB,
        "std_rgb": STD_RGB,
        "patch_size_px": patch_px,
        "tiling_size": 8 * patch_px,  # 3 internal 2x downscales (patch_embed.py:65-68)
        "default_size_px": base_grid[0] * patch_px,
        "encoder_config": enc_cfg,
    }
