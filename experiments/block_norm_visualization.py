#!/usr/bin/env python3
"""Per-block token-norm visualization (rebuild of reference
experiments/block_norm_visualization.py): the 'ViTs need registers' artifact
viewer — renders the L2 norm of every patch token after each transformer
block, exposing the high-norm outlier tokens that appear in large ViTs.

Interactive by default like the reference (589-LoC slider-driven explorer):
a layer slider scrubs through the blocks, a line plot shows each block's max
token norm (the outlier signature), and hovering the norm map reads out the
exact norm under the cursor. `--headless` keeps the batch save-everything
mode for CI.

The reference captures block outputs with forward hooks
(block_norm_visualization.py:137-141); here the introspection-mode forward
returns them functionally (DPTModel.forward_with_internals)."""

import argparse
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict  # noqa: E402
from muggled_dpt_tpu.demo_helpers import ui  # noqa: E402
from muggled_dpt_tpu.demo_helpers.saving import get_save_folder  # noqa: E402


def capture_block_norms(model, image_bgr, base_size_px):
    """One introspection forward -> (norms (L, gh, gw) f32, model-input-sized
    BGR image for display)."""
    image_bchw = model.prepare_image_bgr(image_bgr, base_size_px)
    h, w = image_bchw.shape[2:]
    p = model.patch_size_px
    gh, gw = h // p, w // p
    _, internals = model.forward_with_internals(image_bchw)
    norms = []
    for tokens in internals["block_tokens"]:
        t = np.asarray(tokens[0], dtype=np.float32)
        patch = t[-gh * gw :]  # strip any cls/readout token
        norms.append(np.linalg.norm(patch, axis=-1).reshape(gh, gw))
    disp = cv2.resize(image_bgr, (w, h))
    return np.stack(norms), disp


def colorize_norms(norms_hw, cmap_bar=None, upscale=8):
    lo, hi = float(norms_hw.min()), float(norms_hw.max())
    img = ((norms_hw - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
    img = cv2.resize(img, (norms_hw.shape[1] * upscale, norms_hw.shape[0] * upscale), interpolation=cv2.INTER_NEAREST)
    if cmap_bar is not None:
        return cmap_bar.apply(img), (lo, hi)
    return cv2.applyColorMap(img, cv2.COLORMAP_VIRIDIS), (lo, hi)


def save_all_blocks(norms, out_dir):
    """Batch dump: per-block norm maps + a contact sheet."""
    tiles = []
    for i in range(norms.shape[0]):
        img, (lo, hi) = colorize_norms(norms[i])
        cv2.putText(img, f"blk {i} [{lo:.1f},{hi:.1f}]", (4, 16), cv2.FONT_HERSHEY_SIMPLEX, 0.4, (255, 255, 255), 1)
        tiles.append(img)
        cv2.imwrite(osp.join(out_dir, f"block_{i:02d}.png"), img)
    cols = int(np.ceil(np.sqrt(len(tiles))))
    rows = int(np.ceil(len(tiles) / cols))
    blank = np.zeros_like(tiles[0])
    grid = [tiles[r * cols : (r + 1) * cols] for r in range(rows)]
    grid = [row + [blank] * (cols - len(row)) for row in grid]
    sheet = np.vstack([np.hstack(row) for row in grid])
    cv2.imwrite(osp.join(out_dir, "all_blocks.png"), sheet)
    return len(tiles)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", default=None)
    parser.add_argument("-i", "--image_path", default=None)
    parser.add_argument("-b", "--base_size_px", default=None, type=int)
    parser.add_argument("-o", "--output_folder", default=None)
    parser.add_argument("--headless", action="store_true", help="No UI: save all block maps and quit")
    parser.add_argument("--display_size", default=1000, type=int)
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

    norms, disp_img = capture_block_norms(model, image_bgr, args.base_size_px)
    num_layers, gh, gw = norms.shape
    print(f"Captured {num_layers} block outputs; grid {gh}x{gw}")

    out_dir_arg = args.output_folder or osp.join("saved_results", "block_norms")
    if args.headless:
        out_dir = get_save_folder(out_dir_arg)
        n = save_all_blocks(norms, out_dir)
        print(f"Saved {n} per-block norm maps to {out_dir}")
        return

    # ---- interactive explorer ----
    image_panel = ui.ImageDisplay(disp_img)
    norm_panel = ui.ImageDisplay()
    layer_slider = ui.Slider("Block", num_layers - 1, 0, num_layers - 1, step=1)
    plot = ui.LinePlot("max token norm per block").set_series(norms.max(axis=(1, 2)))
    cmap_bar = ui.ColormapsBar()
    layout = ui.VStack(ui.HStack(image_panel, norm_panel), layer_slider, plot, cmap_bar)
    window = ui.DisplayWindow("Block norm visualization").attach(layout)
    window.attach_keypress_callback("c", cmap_bar.next)

    def _hover_norm(xy_norm):
        layer = layer_slider.value
        x = min(int(xy_norm[0] * gw), gw - 1)
        y = min(int(xy_norm[1] * gh), gh - 1)
        return f"({x},{y}) |t| = {norms[layer, y, x]:.2f}"

    norm_panel.set_hover_text(_hover_norm)

    print("\nKeys: s=save view  a=save all blocks  c=colormap  q=quit")
    needs_render = True
    while True:
        l_changed, layer = layer_slider.read()
        c_changed, _ = cmap_bar.read()
        if needs_render or l_changed or c_changed:
            img, (lo, hi) = colorize_norms(norms[layer], cmap_bar)
            ui.TextDrawer(0.5, 1, (255, 255, 255)).draw(img, f"block {layer}  [{lo:.1f}, {hi:.1f}]", (6, 4))
            norm_panel.set_image(img)
            plot.set_series(norms.max(axis=(1, 2)), highlight_idx=layer)
            needs_render = False

        request_close, key = window.show(args.display_size, 16)
        if key == ord("s"):
            out_dir = get_save_folder(out_dir_arg)
            path = osp.join(out_dir, f"block_{layer:02d}.png")
            cv2.imwrite(path, norm_panel.image)
            print(f"Saved {path}")
        if key == ord("a"):
            out_dir = get_save_folder(out_dir_arg)
            n = save_all_blocks(norms, out_dir)
            print(f"Saved {n} per-block maps to {out_dir}")
        if request_close:
            break
    window.close()


if __name__ == "__main__":
    main()
