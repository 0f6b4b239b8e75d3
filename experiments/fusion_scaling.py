#!/usr/bin/env python3
"""Fusion-scaling experiment (rebuild of reference experiments/fusion_scaling.py):
drive the 4 fusion blocks manually with per-block scaling factors to see how
much each reassembly stage contributes to the final depth map.

The reference calls dpt_model.fusion.blocks[i] by hand
(fusion_scaling.py:330-333); here the same hook is the `input_scales`
parameter of fusion_forward (component-level API access preserved)."""

import argparse
import itertools
import os.path as osp
import sys

import cv2
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict  # noqa: E402
from muggled_dpt_tpu.models import dpt_neck  # noqa: E402
from muggled_dpt_tpu.demo_helpers.postprocess import normalize_01, remove_infinities  # noqa: E402
from muggled_dpt_tpu.demo_helpers.saving import get_save_folder  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", default=None)
    parser.add_argument("-i", "--image_path", default=None)
    parser.add_argument("-b", "--base_size_px", default=None, type=int)
    parser.add_argument("-f", "--scales", default=None, help="Comma-separated f1,f2,f3,f4 (default sweep)")
    parser.add_argument("-o", "--output_folder", default=None)
    args = parser.parse_args()

    if args.model_path:
        config, model = make_dpt_from_state_dict(args.model_path)
    else:
        from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

        print("No model path - using tiny random DA-V2")
        model = make_depthanythingv2_dpt(64, 1, 8, (8, 16, 32, 64), (16, 16), 16)
        config = model.config

    if args.image_path:
        image_bgr = cv2.imread(args.image_path)
        assert image_bgr is not None
    else:
        image_bgr = np.random.default_rng(0).integers(0, 256, (480, 640, 3), dtype=np.uint8)

    # Run the pipeline up to reassembly once, then fuse repeatedly with scales
    image_bchw = model.prepare_image_bgr(image_bgr, args.base_size_px)
    depth, internals = model.forward_with_internals(image_bchw)
    maps = internals["reassembly_maps"]
    params = model.params
    # head upsample factor comes from the family spec: P/8 for Depth-Anything
    # but MiDaS-fixed 2.0 for BEiT/SwinV2 (v31_swinv2/head_model.py:43) —
    # recomputing patch_size_px/8 here would yield 0.5 for SwinV2 (patch 4)
    head_upsample = model.spec["head_upsample"]
    is_metric = bool(config.get("is_metric", False))

    def fused_depth(scales):
        fused = dpt_neck.fusion_forward(maps, params["fusion"], input_scales=scales)
        d = dpt_neck.head_forward(fused, params["head"], head_upsample, is_metric)
        return normalize_01(remove_infinities(np.asarray(d, np.float32).squeeze()))

    if args.scales:
        sweep = [tuple(float(v) for v in args.scales.split(","))]
    else:
        # baseline + each block knocked out + each block solo
        sweep = [(1, 1, 1, 1)]
        for i in range(4):
            s = [1, 1, 1, 1]
            s[i] = 0.0
            sweep.append(tuple(s))

    out_dir = get_save_folder(args.output_folder or osp.join("saved_results", "fusion_scaling"))
    for scales in sweep:
        d = fused_depth(tuple(jnp.float32(s) for s in scales))
        img = cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_MAGMA)
        name = "f" + "_".join(f"{s:g}" for s in scales)
        cv2.imwrite(osp.join(out_dir, f"{name}.png"), img)
        print(f"scales={scales}: depth mean {d.mean():.4f} -> {name}.png")
    print(f"Saved to {out_dir}")


if __name__ == "__main__":
    main()
