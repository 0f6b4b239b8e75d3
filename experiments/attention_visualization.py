#!/usr/bin/env python3
"""Attention visualization (rebuild of reference experiments/attention_visualization.py):
capture the per-block softmax attention maps and render, for a chosen token,
how every layer/head attends to it (row attention) and how it is attended to
(column attention).

Where the reference hooks nn.Softmax modules via ModelOutputCapture
(attention_visualization.py:324-325, requires enable_optimizations=False),
this framework's functional 'introspection mode' returns the attention
weights directly from the jitted forward (DPTModel.forward_with_internals)."""

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
    parser.add_argument("-m", "--model_path", required=False, default=None)
    parser.add_argument("-i", "--image_path", default=None)
    parser.add_argument("-b", "--base_size_px", default=None, type=int)
    parser.add_argument("-t", "--token_xy", default=None, help="Patch coordinate 'x,y' to visualize (default: center)")
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
        assert image_bgr is not None, f"Could not read: {args.image_path}"
    else:
        image_bgr = np.random.default_rng(0).integers(0, 256, (480, 640, 3), dtype=np.uint8)

    image_bchw = model.prepare_image_bgr(image_bgr, args.base_size_px)
    h, w = image_bchw.shape[2:]
    p = model.patch_size_px
    gh, gw = h // p, w // p

    depth, internals = model.forward_with_internals(image_bchw)
    attn_maps = internals["attention"]  # list of (B, H, N, N) per block
    print(f"Captured attention for {len(attn_maps)} blocks; grid {gh}x{gw}")

    # pick a token (patch coordinates); +1 offsets past the cls/readout token
    if args.token_xy:
        tx, ty = (int(v) for v in args.token_xy.split(","))
    else:
        tx, ty = gw // 2, gh // 2
    token_idx = 1 + ty * gw + tx
    cls_offset = 1 if attn_maps[0].shape[-1] == gh * gw + 1 else 0

    out_dir = get_save_folder(args.output_folder or osp.join("saved_results", "attention_viz"))
    for layer_idx, attn in enumerate(attn_maps):
        a = np.asarray(attn[0], dtype=np.float32)  # (H, N, N)
        num_heads = a.shape[0]
        rows, cols = [], []
        for head in range(num_heads):
            row = a[head, token_idx if cls_offset else token_idx - 1, cls_offset:]
            col = a[head, cls_offset:, token_idx if cls_offset else token_idx - 1]
            rows.append(row.reshape(gh, gw))
            cols.append(col.reshape(gh, gw))

        def tile(maps):
            norm = [cv2.resize((m / max(m.max(), 1e-9) * 255).astype(np.uint8), (gw * 8, gh * 8), interpolation=cv2.INTER_NEAREST) for m in maps]
            return cv2.applyColorMap(np.hstack(norm), cv2.COLORMAP_INFERNO)

        combined = np.vstack([tile(rows), tile(cols)])
        cv2.imwrite(osp.join(out_dir, f"layer_{layer_idx:02d}.png"), combined)

    print(f"Saved row/column attention images for token ({tx},{ty}) to {out_dir}")


if __name__ == "__main__":
    main()
