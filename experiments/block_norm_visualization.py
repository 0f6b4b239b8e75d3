#!/usr/bin/env python3
"""Per-block token-norm visualization (rebuild of reference
experiments/block_norm_visualization.py): the 'ViTs need registers' artifact
viewer — renders the L2 norm of every patch token after each transformer
block, exposing the high-norm outlier tokens that appear in large ViTs.

The reference captures block outputs with forward hooks
(block_norm_visualization.py:137-141); here the introspection-mode forward
returns them functionally."""

import argparse
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict  # noqa: E402
from muggled_dpt_tpu.demo_helpers.saving import get_save_folder  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", default=None)
    parser.add_argument("-i", "--image_path", default=None)
    parser.add_argument("-b", "--base_size_px", default=None, type=int)
    parser.add_argument("-o", "--output_folder", default=None)
    args = parser.parse_args()

    if args.model_path:
        config, model = make_dpt_from_state_dict(args.model_path, enable_optimizations=False)
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

    image_bchw = model.prepare_image_bgr(image_bgr, args.base_size_px)
    h, w = image_bchw.shape[2:]
    p = model.patch_size_px
    gh, gw = h // p, w // p

    depth, internals = model.forward_with_internals(image_bchw)
    block_tokens = internals["block_tokens"]
    print(f"Captured {len(block_tokens)} block outputs")

    out_dir = get_save_folder(args.output_folder or osp.join("saved_results", "block_norms"))
    tiles = []
    for i, tokens in enumerate(block_tokens):
        t = np.asarray(tokens[0], dtype=np.float32)
        patch = t[-gh * gw :]  # strip any cls/readout token
        norms = np.linalg.norm(patch, axis=-1).reshape(gh, gw)
        lo, hi = norms.min(), norms.max()
        img = ((norms - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
        img = cv2.resize(img, (gw * 8, gh * 8), interpolation=cv2.INTER_NEAREST)
        img = cv2.applyColorMap(img, cv2.COLORMAP_VIRIDIS)
        cv2.putText(img, f"blk {i} [{lo:.1f},{hi:.1f}]", (4, 16), cv2.FONT_HERSHEY_SIMPLEX, 0.4, (255, 255, 255), 1)
        tiles.append(img)
        cv2.imwrite(osp.join(out_dir, f"block_{i:02d}.png"), img)

    # contact sheet
    cols = int(np.ceil(np.sqrt(len(tiles))))
    rows = int(np.ceil(len(tiles) / cols))
    blank = np.zeros_like(tiles[0])
    grid = [tiles[r * cols : (r + 1) * cols] for r in range(rows)]
    grid = [row + [blank] * (cols - len(row)) for row in grid]
    sheet = np.vstack([np.hstack(row) for row in grid])
    cv2.imwrite(osp.join(out_dir, "all_blocks.png"), sheet)
    print(f"Saved per-block norm maps to {out_dir}")


if __name__ == "__main__":
    main()
