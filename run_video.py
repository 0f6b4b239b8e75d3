#!/usr/bin/env python3
"""Streaming video/webcam depth demo (TPU-native rebuild of the reference
run_video.py). The TPU analog of the reference's async CUDA gating
(run_video.py:336,349): JAX dispatches inference asynchronously, and we only
collect a result once `jax.Array.is_ready()` — the displayed depth lags by up
to one in-flight frame but playback never blocks on the accelerator.

Keys: space = pause, c = colormap, r = reverse, e = equalize, o = record
      frames, q/esc = quit."""

import argparse
import os.path as osp
import time

import cv2
import numpy as np

from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict
from muggled_dpt_tpu.demo_helpers import ui
from muggled_dpt_tpu.demo_helpers.history_keeper import HistoryKeeper
from muggled_dpt_tpu.demo_helpers.loading import ask_for_model_path, ask_for_video_path
from muggled_dpt_tpu.demo_helpers.misc import AsyncResult, make_device_config, print_config_feedback, reduce_overthreading, maybe_quantize_int8
from muggled_dpt_tpu.demo_helpers.postprocess import convert_to_uint8, histogram_equalization, normalize_01, remove_infinities
from muggled_dpt_tpu.demo_helpers.saving import get_save_folder, make_save_name
from muggled_dpt_tpu.demo_helpers.video import LoopingVideoReader


def parse_args():
    parser = argparse.ArgumentParser(description="Run depth estimation on video/webcam")
    parser.add_argument("-i", "--video_path", default=None, help="Path to video file or webcam number")
    parser.add_argument("-m", "--model_path", default=None, help="Path to DPT model weights")
    parser.add_argument("-cam", "--use_webcam", action="store_true", help="Use webcam 0")
    parser.add_argument("-s", "--display_size", default=800, type=int)
    parser.add_argument(
        "-t", "--display_ms", default=1, type=int,
        help="Time to display each frame; 0 = pace by the video's own FPS (reference run_video.py:56-62)",
    )
    parser.add_argument("-d", "--device", default=None, help="Device backend ('cpu' or default accelerator)")
    parser.add_argument("-b", "--base_size_px", default=None, type=int, help="Override model base size")
    parser.add_argument("-nc", "--no_cache", action="store_true", help="Disable per-grid aux caching to reduce HBM usage")
    parser.add_argument("-f32", "--use_float32", action="store_true")
    parser.add_argument("-u", "--prefer_unstable_f16", action="store_true")
    parser.add_argument("-z", "--no_optimization", action="store_true")
    parser.add_argument("--int8", action="store_true", help="int8 encoder serving tier (DA/BEiT; see docs/performance.md)")
    parser.add_argument("--int8-full", dest="int8_full", action="store_true",
                        help="int8 tier incl. the full neck: reassembly GEMMs + fusion/head convs (implies --int8; docs/performance.md)")
    parser.add_argument("-ar", "--use_aspect_ratio", action="store_true")
    parser.add_argument("-sync", "--use_sync", action="store_true", help="Block on every frame (accurate timing)")
    parser.add_argument(
        "-r", "--allow_recording", action="store_true",
        help="Enable the toggle-able per-frame depth recording UI (reference run_video.py:122-128)",
    )
    parser.add_argument("--crop", action="store_true", help="Interactively crop frames before inference (persisted)")
    parser.add_argument("--max_frames", default=None, type=int, help="Stop after N frames (headless testing)")
    parser.add_argument("--headless", action="store_true", help="No display window")
    return parser.parse_args()


def main():
    args = parse_args()
    from muggled_dpt_tpu.demo_helpers.misc import select_device

    select_device(args.device)
    reduce_overthreading()
    from muggled_dpt_tpu.demo_helpers.misc import enable_compilation_cache

    enable_compilation_cache()

    history = HistoryKeeper()
    _, hist_video = history.read("video_path")
    _, hist_model = history.read("model_path")
    video_source = "0" if args.use_webcam else (args.video_path or ask_for_video_path(hist_video))
    model_path = args.model_path or ask_for_model_path(default_path=hist_model)
    history.store(video_path=str(video_source), model_path=model_path)

    device_config = make_device_config(use_float32=args.use_float32, prefer_bfloat16=not args.prefer_unstable_f16)
    print("", "Loading model weights...", f"  @ {model_path}", sep="\n", flush=True)
    model_config, dpt_model = make_dpt_from_state_dict(
        model_path, enable_cache=not args.no_cache, enable_optimizations=not args.no_optimization,
        dtype=device_config["dtype"],
    )
    dpt_model = maybe_quantize_int8(dpt_model, args.int8, args.int8_full)
    print_config_feedback(model_path, device_config, use_cache=not args.no_cache)

    reader = LoopingVideoReader(video_source)
    base_size = args.base_size_px or dpt_model.default_size_px
    use_square = not args.use_aspect_ratio

    # Optional interactive crop of the video frames, persisted via history
    # (reference run_video.py:130-134,207-215)
    crop_slices = None
    if args.crop:
        ok_first, first_frame = reader.peek_frame()
        assert ok_first, "No frame available to crop"
        _, prev_crop = history.read("crop_xy1xy2_norm")
        if args.headless:
            # no display: reuse the persisted crop instead of the blocking UI
            if prev_crop:
                from muggled_dpt_tpu.demo_helpers.crop_ui import norm_crop_to_slices

                crop_slices = norm_crop_to_slices(first_frame.shape[:2], prev_crop)
                print(f"  --crop (headless): using persisted crop {prev_crop}")
            else:
                print("  --crop ignored: headless mode and no persisted crop in history")
        else:
            from muggled_dpt_tpu.demo_helpers.crop_ui import run_crop_ui

            crop_slices, crop_norm = run_crop_ui(first_frame, prev_crop)
            history.store(crop_xy1xy2_norm=crop_norm)

    cmap_bar = ui.ColormapsBar()
    reverse_toggle = ui.ToggleButton("Reverse colors", False)
    histeq_toggle = ui.ToggleButton("Equalize", False)
    record_toggle = ui.ToggleButton("Record", False) if args.allow_recording else None
    display = ui.ImageDisplay()
    playback = ui.PlaybackBar(reader.total_frames) if not reader.is_webcam else None
    layout = ui.VStack(display, cmap_bar, playback, reverse_toggle, histeq_toggle, record_toggle)

    window = None
    if not args.headless:
        window = ui.DisplayWindow(f"Depth video - {osp.basename(str(video_source))}")
        window.attach(layout)
        window.attach_keypress_callback("c", cmap_bar.next)
        window.attach_keypress_callback("r", reverse_toggle.toggle)
        window.attach_keypress_callback("e", histeq_toggle.toggle)
        if record_toggle is not None:
            window.attach_keypress_callback("o", record_toggle.toggle)
        window.attach_keypress_callback(" ", playback.toggle_pause if playback is not None else reader.toggle_pause)
        rec_help = "  o=record" if record_toggle is not None else ""
        print(f"\nKeys: space=pause  c=colormap  r=reverse  e=equalize{rec_help}  q=quit")

    gate = AsyncResult()
    depth_u8 = None
    infer_ms = 0.0
    record_folder = None
    frames_seen = 0

    # frame pacing (reference run_video.py:192): 0 = use the video's own fps
    frame_delay_ms = max(1, int(1000 / max(reader.fps, 1))) if args.display_ms == 0 else max(1, int(args.display_ms))

    for is_paused, frame_idx, frame in reader:
        frames_seen += 1
        if crop_slices is not None:
            frame = frame[crop_slices]
        if playback is not None and not is_paused:
            playback.set_frame(frame_idx)

        # Dispatch-ahead: submit new inference only when the previous result is
        # materialized (never blocks playback); -sync forces blocking timing.
        if gate.is_ready():
            prev = gate.collect()
            if prev is not None:
                depth = normalize_01(remove_infinities(prev.squeeze().astype(np.float32)))
                depth_u8 = convert_to_uint8(depth)
            t0 = time.perf_counter()
            result = dpt_model.inference(frame, base_size, use_square)
            if args.use_sync:
                np.asarray(result)
                infer_ms = (time.perf_counter() - t0) * 1000.0
            else:
                infer_ms = 0.9 * infer_ms + 0.1 * (time.perf_counter() - t0) * 1000.0
            gate.submit(result)

        if depth_u8 is not None:
            shown = histogram_equalization(depth_u8) if histeq_toggle.is_on else depth_u8
            if reverse_toggle.is_on:
                shown = 255 - shown
            colored = cmap_bar.apply(shown)
            h, w = frame.shape[:2]
            colored = cv2.resize(colored, (w, h))
            label = f"{infer_ms:.1f} ms" + ("" if args.use_sync else " (dispatch)")
            ui.TextDrawer(0.6, 2, (255, 255, 255)).draw(colored, label, (10, 8))
            combined = np.hstack([frame, colored])
            display.set_image(combined)

            if record_toggle is not None and record_toggle.is_on:
                if record_folder is None:
                    record_folder = get_save_folder(osp.join("saved_results", make_save_name(str(video_source), "rec")))
                cv2.imwrite(osp.join(record_folder, f"frame_{frame_idx:06d}.png"), colored)

        if playback is not None:
            seek_changed, seek_val = playback.read_seek()
            if seek_changed:
                reader.seek(seek_val)
            pause_changed, paused = playback.read_pause()
            if pause_changed:
                reader.pause(paused)

        if window is not None:
            request_close, _ = window.show(args.display_size, frame_delay_ms)
            if request_close:
                break
        if args.max_frames is not None and frames_seen >= args.max_frames:
            break

    reader.release()
    if window is not None:
        window.close()


if __name__ == "__main__":
    main()
