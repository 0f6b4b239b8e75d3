#!/usr/bin/env python3
"""Run the five DPT components one-by-one and print every intermediate shape —
the executable shape spec (mirrors reference simple_examples/internal_features.py:38-61)."""

import argparse
import os.path as osp
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from muggled_dpt_tpu import make_dpt_from_state_dict  # noqa: E402
from muggled_dpt_tpu.ops.nn import patchify_embed  # noqa: E402
from muggled_dpt_tpu.models import depth_anything, dinov2, dpt_neck  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("-m", "--model_path", default=None)
args = parser.parse_args()

if args.model_path:
    config_dict, model = make_dpt_from_state_dict(args.model_path)
else:
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

    print("No model path given - using a tiny randomly-initialized DA-V2 model")
    model = make_depthanythingv2_dpt(64, 1, 8, (8, 16, 32, 64), (8, 8), 16)
    config_dict = model.config

# Preprocess a synthetic image through the model's own image prep
image_bgr = np.random.default_rng(0).integers(0, 256, (300, 400, 3), dtype=np.uint8)
image_bchw = model.prepare_image_bgr(image_bgr)
print(f"\nPre-processed image shape: {tuple(image_bchw.shape)}  (BCHW)")

params = model.params
image_nhwc = jnp.asarray(image_bchw).transpose(0, 2, 3, 1)

is_depth_anything = "pretrained.blocks.0.ls1.gamma" not in config_dict.get("_model_type", "") and "features_per_stage" not in config_dict and "num_blocks" in config_dict and "is_giant" in config_dict

if is_depth_anything:
    # Depth-Anything: drive the five components individually
    enc_cfg = model.spec["encoder_config"]

    # 1) patch embedding
    tokens, grid_hw = patchify_embed(image_nhwc, params["patch_embed"]["kernel"], params["patch_embed"]["bias"])
    print(f"Patch tokens: {tuple(tokens.shape)}  (BxNxF), patch grid: {grid_hw}")

    # 2) image encoder (4 stage outputs)
    stages = dinov2.encoder_forward(params["encoder"], tokens, grid_hw, enc_cfg)
    for i, s in enumerate(stages, 1):
        print(f"Encoder stage {i} tokens: {tuple(s.shape)}")

    # 3) reassembly (4 image-like maps at x4 / x2 / x1 / x0.5 of the patch grid)
    maps = dpt_neck.reassemble_forward(stages, grid_hw, params["reassemble"], depth_anything.REASSEMBLY_SCALES, readout="ignore")
    for i, m in enumerate(maps, 1):
        print(f"Reassembly stage {i} map: {tuple(m.shape)}  (NHWC)")

    # 4) fusion (single map at 8x patch grid)
    fused = dpt_neck.fusion_forward(maps, params["fusion"])
    print(f"Fused feature map: {tuple(fused.shape)}  (NHWC)")

    # 5) head (inverse depth at ~input resolution)
    depth = dpt_neck.head_forward(fused, params["head"], config_dict["patch_size_px"] / 8, config_dict.get("is_metric", False))
    print(f"Inverse depth: {tuple(depth.shape)}  (BxHxW)")
else:
    # BEiT / SwinV2: surface the same intermediates via introspection mode
    depth, internals = model.forward_with_internals(image_bchw)
    for i, t in enumerate(internals["block_tokens"], 1):
        print(f"Block {i} tokens: {tuple(t.shape)}")
    for i, m in enumerate(internals["reassembly_maps"], 1):
        print(f"Reassembly stage {i} map: {tuple(m.shape)}  (NHWC)")
    print(f"Fused feature map: {tuple(internals['fused_map'].shape)}  (NHWC)")
    print(f"Inverse depth: {tuple(depth.shape)}  (BxHxW)")
