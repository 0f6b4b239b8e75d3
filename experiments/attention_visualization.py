#!/usr/bin/env python3
"""Attention visualization (rebuild of reference experiments/attention_visualization.py):
capture the per-block softmax attention maps and explore, for a chosen patch
token, how every layer/head attends to it (row attention) and how it is
attended to (column attention).

Interactive by default like the reference (547-LoC slider-driven explorer):
drag/click the marker on the input image to pick the target token, slide
layer/head (head -1 = mean over heads), pick a colormap, press "s" to save
the current view or "a" to dump every layer. `--headless` keeps the batch
save-everything mode for CI.

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
from muggled_dpt_tpu.demo_helpers import ui  # noqa: E402
from muggled_dpt_tpu.demo_helpers.saving import get_save_folder  # noqa: E402


def capture_attention(model, image_bgr, base_size_px):
    """One introspection forward -> (attn list of (H,N,N) f16 arrays, gh, gw,
    cls_offset, model-input-sized BGR image for display)."""
    image_bchw = model.prepare_image_bgr(image_bgr, base_size_px)
    h, w = image_bchw.shape[2:]
    p = model.patch_size_px
    gh, gw = h // p, w // p
    _, internals = model.forward_with_internals(image_bchw)
    # f16 halves host memory: ViT-L @518 captures 24 x (16,1370,1370) maps
    attn = [np.asarray(a[0], dtype=np.float16) for a in internals["attention"]]
    cls_offset = 1 if attn[0].shape[-1] == gh * gw + 1 else 0
    disp = cv2.resize(image_bgr, (w, h))
    return attn, gh, gw, cls_offset, disp


def token_attention_maps(attn_layer, token_xy, gh, gw, cls_offset, head=-1):
    """(row, col) attention over the patch grid for one token; head=-1 means
    mean over heads. Row = where the token looks, col = who looks at it."""
    tx, ty = token_xy
    idx = cls_offset + ty * gw + tx
    a = attn_layer.astype(np.float32)
    if head >= 0:
        a = a[head : head + 1]
    row = a[:, idx, cls_offset:].mean(0).reshape(gh, gw)
    col = a[:, cls_offset:, idx].mean(0).reshape(gh, gw)
    return row, col


def colorize_map(m, cmap_bar=None, upscale=8):
    img = (m / max(float(m.max()), 1e-9) * 255).astype(np.uint8)
    img = cv2.resize(img, (m.shape[1] * upscale, m.shape[0] * upscale), interpolation=cv2.INTER_NEAREST)
    if cmap_bar is not None:
        return cmap_bar.apply(img)
    return cv2.applyColorMap(img, cv2.COLORMAP_INFERNO)


def save_all_layers(attn, token_xy, gh, gw, cls_offset, out_dir):
    """Batch dump: per-layer contact sheet of every head's row/col maps."""
    for layer_idx, a in enumerate(attn):
        num_heads = a.shape[0]
        rows, cols = [], []
        for head in range(num_heads):
            r, c = token_attention_maps(a, token_xy, gh, gw, cls_offset, head)
            rows.append(colorize_map(r))
            cols.append(colorize_map(c))
        combined = np.vstack([np.hstack(rows), np.hstack(cols)])
        cv2.imwrite(osp.join(out_dir, f"layer_{layer_idx:02d}.png"), combined)
    return len(attn)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", required=False, default=None)
    parser.add_argument("-i", "--image_path", default=None)
    parser.add_argument("-b", "--base_size_px", default=None, type=int)
    parser.add_argument("-t", "--token_xy", default=None, help="Patch coordinate 'x,y' to visualize (default: center)")
    parser.add_argument("-o", "--output_folder", default=None)
    parser.add_argument("--headless", action="store_true", help="No UI: save all layers for the chosen token and quit")
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
        assert image_bgr is not None, f"Could not read: {args.image_path}"
    else:
        image_bgr = np.random.default_rng(0).integers(0, 256, (480, 640, 3), dtype=np.uint8)

    attn, gh, gw, cls_offset, disp_img = capture_attention(model, image_bgr, args.base_size_px)
    num_layers, num_heads = len(attn), attn[0].shape[0]
    print(f"Captured attention for {num_layers} blocks x {num_heads} heads; grid {gh}x{gw}")

    if args.token_xy:
        tx, ty = (int(v) for v in args.token_xy.split(","))
    else:
        tx, ty = gw // 2, gh // 2

    out_dir_arg = args.output_folder or osp.join("saved_results", "attention_viz")
    if args.headless:
        out_dir = get_save_folder(out_dir_arg)
        n = save_all_layers(attn, (tx, ty), gh, gw, cls_offset, out_dir)
        print(f"Saved {n} row/column attention images for token ({tx},{ty}) to {out_dir}")
        return

    # ---- interactive explorer ----
    image_panel = ui.ImageDisplay(disp_img)
    marker = image_panel.add_marker(((tx + 0.5) / gw, (ty + 0.5) / gh))
    attn_panel = ui.ImageDisplay()
    layer_slider = ui.Slider("Layer", num_layers - 1, 0, num_layers - 1, step=1)
    head_slider = ui.Slider("Head (-1 = mean)", -1, -1, num_heads - 1, step=1)
    cmap_bar = ui.ColormapsBar()
    layout = ui.VStack(ui.HStack(image_panel, attn_panel), layer_slider, head_slider, cmap_bar)
    window = ui.DisplayWindow("Attention visualization").attach(layout)
    window.attach_keypress_callback("c", cmap_bar.next)

    state = {"row": None, "col": None}

    def _hover_value(xy_norm):
        if state["row"] is None:
            return ""
        # left half shows the row map, right half the column map
        half = 0 if xy_norm[0] < 0.5 else 1
        m = state["row"] if half == 0 else state["col"]
        x = min(int((xy_norm[0] * 2 - half) * gw), gw - 1)
        y = min(int(xy_norm[1] * gh), gh - 1)
        kind = "row" if half == 0 else "col"
        return f"{kind} ({x},{y}) = {m[y, x]:.4f}"

    attn_panel.set_hover_text(_hover_value)

    print("\nKeys: s=save view  a=save all layers  c=colormap  q=quit")
    print("Click/drag the marker on the input image to pick the target token")
    needs_render = True
    while True:
        m_changed, m_xy = marker.read()
        l_changed, layer = layer_slider.read()
        h_changed, head = head_slider.read()
        c_changed, _ = cmap_bar.read()
        needs_render = needs_render or m_changed or l_changed or h_changed or c_changed
        if needs_render:
            tx, ty = min(int(m_xy[0] * gw), gw - 1), min(int(m_xy[1] * gh), gh - 1)
            row, col = token_attention_maps(attn[layer], (tx, ty), gh, gw, cls_offset, head)
            state["row"], state["col"] = row, col
            row_img, col_img = colorize_map(row, cmap_bar), colorize_map(col, cmap_bar)
            td = ui.TextDrawer(0.5, 1, (255, 255, 255))
            td.draw(row_img, f"row attn L{layer}" + (f" H{head}" if head >= 0 else " mean"), (6, 4))
            td.draw(col_img, "col attn", (6, 4))
            attn_panel.set_image(np.hstack([row_img, col_img]))
            needs_render = False

        request_close, key = window.show(args.display_size, 16)
        if key == ord("s"):
            out_dir = get_save_folder(out_dir_arg)
            path = osp.join(out_dir, f"token_{tx}_{ty}_layer_{layer:02d}_head_{head}.png")
            cv2.imwrite(path, attn_panel.image)
            print(f"Saved {path}")
        if key == ord("a"):
            out_dir = get_save_folder(out_dir_arg)
            n = save_all_layers(attn, (tx, ty), gh, gw, cls_offset, out_dir)
            print(f"Saved {n} layer sheets for token ({tx},{ty}) to {out_dir}")
        if request_close:
            break
    window.close()


if __name__ == "__main__":
    main()
