#!/usr/bin/env python3
"""Minimal API example (mirrors reference simple_examples/depth_prediction.py):
load a checkpoint, run inference on one image, display the normalized result.

Expects a model path and image path; tiny random-weight fallback lets the
example run without downloads."""

import argparse
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from muggled_dpt_tpu import make_dpt_from_state_dict  # noqa: E402
from muggled_dpt_tpu.demo_helpers.postprocess import normalize_01, remove_infinities  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("-m", "--model_path", default=None)
parser.add_argument("-i", "--image_path", default=None)
parser.add_argument("--no_display", action="store_true")
args = parser.parse_args()

# ---------------------------------------------------------------------------
# Load model (or build a tiny random one so the example runs standalone)
if args.model_path:
    config_dict, dpt_model = make_dpt_from_state_dict(args.model_path)
else:
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

    print("No model path given - using a tiny randomly-initialized DA-V2 model")
    dpt_model = make_depthanythingv2_dpt(384, 6, 12, (48, 96, 192, 384), (37, 37), 64)
    config_dict = dpt_model.config

# Load image
if args.image_path:
    image_bgr = cv2.imread(args.image_path)
    assert image_bgr is not None, f"Could not read image: {args.image_path}"
else:
    image_bgr = np.random.default_rng(0).integers(0, 256, (480, 640, 3), dtype=np.uint8)

# ---------------------------------------------------------------------------
# Inference: BGR uint8 in -> (1, H, W) inverse-depth out
inverse_depth = dpt_model.inference(image_bgr)
depth_norm = normalize_01(remove_infinities(np.asarray(inverse_depth).squeeze()))
print("Inverse depth shape:", np.asarray(inverse_depth).shape)
print("Depth range (normalized): 0..1, mean", float(depth_norm.mean()))

if not args.no_display:
    depth_u8 = (depth_norm * 255).astype(np.uint8)
    cv2.imshow("Depth", cv2.applyColorMap(depth_u8, cv2.COLORMAP_MAGMA))
    cv2.waitKey(0)
    cv2.destroyAllWindows()
