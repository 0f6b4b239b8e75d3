#!/usr/bin/env python3
"""Depth-based image masking (rebuild of reference experiments/depth_masking.py):
threshold the (optionally plane-flattened) depth prediction to build a
foreground mask and apply it to the original image."""

import argparse
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict  # noqa: E402
from muggled_dpt_tpu.demo_helpers.plane_fit import estimate_plane_of_best_fit  # noqa: E402
from muggled_dpt_tpu.demo_helpers.postprocess import normalize_01, remove_infinities, scale_prediction  # noqa: E402
from muggled_dpt_tpu.demo_helpers.saving import get_save_folder  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", default=None)
    parser.add_argument("-i", "--image_path", default=None)
    parser.add_argument("-b", "--base_size_px", default=None, type=int)
    parser.add_argument("--threshold", default=0.5, type=float, help="Depth threshold in [0,1]")
    parser.add_argument("--invert", action="store_true", help="Keep far instead of near")
    parser.add_argument("--remove_plane", action="store_true", help="Subtract plane of best fit first")
    parser.add_argument("-o", "--output_folder", default=None)
    args = parser.parse_args()

    if args.model_path:
        config, model = make_dpt_from_state_dict(args.model_path)
    else:
        from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

        print("No model path - using tiny random DA-V2")
        model = make_depthanythingv2_dpt(64, 1, 8, (8, 16, 32, 64), (16, 16), 16)

    if args.image_path:
        image_bgr = cv2.imread(args.image_path)
        assert image_bgr is not None
    else:
        image_bgr = np.random.default_rng(0).integers(0, 256, (480, 640, 3), dtype=np.uint8)

    h, w = image_bgr.shape[:2]
    prediction = model.inference(image_bgr, args.base_size_px)
    depth = normalize_01(remove_infinities(scale_prediction(np.asarray(prediction, np.float32), (w, h)).squeeze()))

    if args.remove_plane:
        depth = normalize_01(depth - estimate_plane_of_best_fit(depth, rng=np.random.default_rng(0)))

    mask = depth >= args.threshold
    if args.invert:
        mask = ~mask
    mask_u8 = (mask * 255).astype(np.uint8)
    masked = cv2.bitwise_and(image_bgr, image_bgr, mask=mask_u8)
    rgba = np.dstack([image_bgr, mask_u8])

    out_dir = get_save_folder(args.output_folder or osp.join("saved_results", "depth_masking"))
    cv2.imwrite(osp.join(out_dir, "mask.png"), mask_u8)
    cv2.imwrite(osp.join(out_dir, "masked.png"), masked)
    cv2.imwrite(osp.join(out_dir, "masked_rgba.png"), rgba)
    print(f"Mask keeps {mask.mean() * 100:.1f}% of pixels; saved to {out_dir}")


if __name__ == "__main__":
    main()
