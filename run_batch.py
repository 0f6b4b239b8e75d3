#!/usr/bin/env python3
"""Offline batch depth extraction — the throughput-oriented counterpart to the
interactive apps, and the product surface for the multi-chip runner.

No direct reference analog: the reference processes frames one at a time
inside interactive loops (run_image.py's file carousel, run_video.py's
playback loop). This tool feeds a folder of images, a single image, or a
video file through `parallel.BatchParallelRunner` (batch sharded over the
mesh's `data` axis, weights optionally tensor-parallel over `model`), writing
per-frame uint16-PNG / .npy / colormapped-PNG results.

Single chip works too (`--data-parallel 1`, the default when one device is
visible); to validate multi-chip behavior without a slice:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python run_batch.py -i frames/ -m model.pt --data-parallel 4
"""

import argparse
import os
import os.path as osp
import time

import cv2
import numpy as np

from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict
from muggled_dpt_tpu.demo_helpers.loading import PathCarousel, ask_for_model_path, ask_for_path
from muggled_dpt_tpu.demo_helpers.history_keeper import HistoryKeeper
from muggled_dpt_tpu.demo_helpers.misc import make_device_config, reduce_overthreading, maybe_quantize_int8
from muggled_dpt_tpu.demo_helpers.postprocess import normalize_01, remove_infinities
from muggled_dpt_tpu.demo_helpers.saving import get_save_folder
from muggled_dpt_tpu.demo_helpers.ui import ColormapsBar
from muggled_dpt_tpu.demo_helpers.video import create_video_capture

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v")


def parse_args():
    parser = argparse.ArgumentParser(description="Batch depth extraction for folders of images or video files")
    parser.add_argument("-i", "--input_path", default=None, help="Image, folder of images, or video file")
    parser.add_argument("-m", "--model_path", default=None, help="Path to DPT model weights")
    parser.add_argument("-o", "--output_folder", default=None, help="Output folder (default: saved_results/batch_<input>)")
    parser.add_argument("-b", "--base_size_px", default=None, type=int, help="Override model base size")
    parser.add_argument("-ar", "--use_aspect_ratio", action="store_true", help="Process at the input's aspect ratio")
    parser.add_argument("-d", "--device", default=None, help="Device backend ('cpu' or default accelerator)")
    parser.add_argument("-f32", "--use_float32", action="store_true")
    parser.add_argument("--int8", action="store_true", help="int8 encoder serving tier")
    parser.add_argument("--int8-full", dest="int8_full", action="store_true",
                        help="int8 tier incl. the full neck: reassembly GEMMs + fusion/head convs (implies --int8; docs/performance.md)")
    parser.add_argument("-dp", "--data-parallel", dest="data_parallel", default=None, type=int,
                        help="Width of the mesh's data axis — frames per step per --per-chip-batch "
                             "(default: all visible devices)")
    parser.add_argument("--per-chip-batch", default=1, type=int, help="Frames per data-mesh slot per step")
    parser.add_argument("-tp", "--tensor-parallel", dest="tensor_parallel", default=1, type=int,
                        help="Also shard the weights Megatron-style over a model axis of this width "
                             "(needs data_parallel x tensor_parallel devices)")
    parser.add_argument("--unroll", default=None, const="6", nargs="?", metavar="K",
                        help="Fixed-shape serving mode: unroll the encoder blocks (bare flag = the "
                             "measured knee k=6, ~18%% faster than scan @504^2 ViT-L; 'full' = full "
                             "Python unroll; longer first compile per shape, cached persistently)")
    parser.add_argument("--save", default="u16", help="Comma list of outputs: u16, npy, color (default: u16)")
    parser.add_argument("--max_frames", default=None, type=int, help="Stop after N frames")
    parser.add_argument("--eval_gt", default=None, metavar="FOLDER",
                        help="Ground-truth inverse-depth folder (<name>.npy float or <name>.png u16): "
                             "aggregate AbsRel/RMSE/delta metrics over the run (utils/metrics.py; "
                             "pixels with gt<=0 are masked out, the standard validity convention)")
    parser.add_argument("--eval_no_align", action="store_true",
                        help="Skip the per-image SSI (scale, shift) alignment before measuring "
                             "(for metric models, whose absolute scale is under test)")
    return parser.parse_args()


def load_gt(folder: str, name: str, hw: tuple[int, int]) -> np.ndarray | None:
    """Ground truth for frame `name`: <name>.npy (float inverse depth) or
    <name>.png (u16/u8, normalized). Resized nearest to the prediction's HW
    so zero-invalid pixels never bleed into valid ones."""
    npy = osp.join(folder, f"{name}.npy")
    png = osp.join(folder, f"{name}.png")
    if osp.isfile(npy):
        gt = np.load(npy).astype(np.float32)
    elif osp.isfile(png):
        raw = cv2.imread(png, cv2.IMREAD_UNCHANGED)
        if raw is None:
            return None
        if raw.ndim == 3:
            raw = raw[..., 0]
        gt = raw.astype(np.float32) / float(np.iinfo(raw.dtype).max if raw.dtype.kind == "u" else 1)
    else:
        return None
    if gt.shape != hw:
        gt = cv2.resize(gt, (hw[1], hw[0]), interpolation=cv2.INTER_NEAREST)
    return gt


def iter_frames(input_path: str):
    """Yield (name, bgr_frame) for a video file, image folder, or image."""
    if str(input_path).lower().endswith(VIDEO_EXTS):
        cap = create_video_capture(input_path)
        idx = 0
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    return
                yield f"frame_{idx:06d}", frame
                idx += 1
        finally:
            cap.release()
    else:
        carousel = PathCarousel(input_path)
        assert len(carousel) > 0, f"No image files at: {input_path}"
        for path in carousel.paths:
            img = cv2.imread(path)
            if img is not None:
                yield osp.splitext(osp.basename(path))[0], img


def main():
    args = parse_args()
    from muggled_dpt_tpu.demo_helpers.misc import select_device

    select_device(args.device)
    reduce_overthreading()
    from muggled_dpt_tpu.demo_helpers.misc import enable_compilation_cache

    enable_compilation_cache()

    import jax  # after select_device
    import jax.numpy as jnp

    from muggled_dpt_tpu.parallel.inference import BatchParallelRunner
    from muggled_dpt_tpu.parallel.mesh import make_mesh
    from muggled_dpt_tpu.utils.metrics import depth_metrics

    history = HistoryKeeper()
    _, hist_input = history.read("batch_input_path")
    _, hist_model = history.read("model_path")
    input_path = args.input_path or ask_for_path("Enter path to image/folder/video", hist_input)
    model_path = args.model_path or ask_for_model_path(default_path=hist_model)
    history.store(batch_input_path=str(input_path), model_path=model_path)

    device_config = make_device_config(use_float32=args.use_float32)
    print("", "Loading model weights...", f"  @ {model_path}", sep="\n", flush=True)
    unroll = False if args.unroll is None else (True if args.unroll == "full" else int(args.unroll))
    _, model = make_dpt_from_state_dict(model_path, dtype=device_config["dtype"], unroll_blocks=unroll)
    model = maybe_quantize_int8(model, args.int8, args.int8_full)

    n_dev = len(jax.devices())
    tp = max(1, args.tensor_parallel)
    dp = args.data_parallel or max(1, n_dev // tp)
    assert dp * tp <= n_dev, (
        f"-dp {dp} x -tp {tp} needs {dp * tp} devices, have {n_dev} (for validation without a slice: "
        f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count={dp * tp})"
    )
    mesh = make_mesh(dp * tp, data_parallel=dp)
    runner = BatchParallelRunner(model, mesh=mesh, shard_model=tp > 1)
    batch = runner.data_parallelism * max(1, args.per_chip_batch)
    print(f"Mesh: {dict(mesh.shape)} | batch per step: {batch}")

    base_size = args.base_size_px or model.default_size_px
    use_square = not args.use_aspect_ratio
    save_kinds = {s.strip() for s in args.save.split(",") if s.strip()}
    unknown = save_kinds - {"u16", "npy", "color"}
    assert not unknown, f"Unknown --save kinds: {sorted(unknown)}"
    cmap = ColormapsBar() if "color" in save_kinds else None

    out_dir = args.output_folder or get_save_folder(
        osp.join("saved_results", f"batch_{osp.splitext(osp.basename(str(input_path)))[0]}")
    )
    os.makedirs(out_dir, exist_ok=True)

    target_hw = None
    pending: list[tuple[str, np.ndarray]] = []
    n_done = 0
    t_start = None
    eval_sums: dict[str, float] = {}
    eval_n = 0

    def save_one(name: str, depth: np.ndarray):
        d = normalize_01(remove_infinities(depth.astype(np.float32)))
        if "u16" in save_kinds:
            cv2.imwrite(osp.join(out_dir, f"{name}.png"), np.round(d * 65535).astype(np.uint16))
        if "npy" in save_kinds:
            np.save(osp.join(out_dir, f"{name}.npy"), depth.astype(np.float32))
        if cmap is not None:
            cv2.imwrite(osp.join(out_dir, f"{name}_color.png"), cmap.apply(np.round(d * 255).astype(np.uint8)))

    def flush(pending_batch):
        """Run one sharded step over the pending frames (padded to the batch
        size by repeating the last frame; padded outputs are dropped)."""
        nonlocal n_done, eval_n
        n_real = len(pending_batch)
        frames = [f for _, f in pending_batch]
        frames += [frames[-1]] * (batch - n_real)
        # device-resident NHWC prep: no BCHW round trip / per-frame host sync
        x = jnp.concatenate([model.prepare_image_bgr_nhwc(f, base_size, use_square) for f in frames])
        depths = np.asarray(runner(x), np.float32)
        for (name, _), depth in zip(pending_batch, depths[:n_real]):
            save_one(name, depth)
            if args.eval_gt:
                gt = load_gt(args.eval_gt, name, depth.shape)
                if gt is not None:
                    frame_metrics = depth_metrics(
                        jnp.asarray(depth[None]), jnp.asarray(gt[None]),
                        jnp.asarray((gt > 0).astype(np.float32)[None]),
                        align=not args.eval_no_align,
                    )
                    for k, v in frame_metrics.items():
                        eval_sums[k] = eval_sums.get(k, 0.0) + float(v)
                    eval_n += 1
        n_done += n_real

    for name, frame in iter_frames(str(input_path)):
        if target_hw is None:
            target_hw = model.compute_scaled_hw(frame.shape[:2], base_size, use_square)
            print(f"Processing at {target_hw[1]}x{target_hw[0]} -> {out_dir}")
        this_hw = model.compute_scaled_hw(frame.shape[:2], base_size, use_square)
        assert this_hw == target_hw, (
            f"Mixed input sizes in aspect-ratio mode ({this_hw} vs {target_hw}); "
            "batching needs one shape — drop -ar or split the inputs"
        )
        pending.append((name, frame))
        if len(pending) == batch:
            flush(pending)
            pending = []
            if t_start is None:
                t_start = time.perf_counter()  # exclude the compile step
                n_at_start = n_done
        if args.max_frames is not None and n_done + len(pending) >= args.max_frames:
            break

    if args.max_frames is not None:
        pending = pending[: max(0, args.max_frames - n_done)]
    if pending:
        flush(pending)
    assert n_done > 0, "No frames processed"

    if t_start is not None and n_done > n_at_start:
        dt = time.perf_counter() - t_start
        print(f"Done: {n_done} frames -> {out_dir} ({(n_done - n_at_start) / dt:.1f} frames/s steady-state)")
    else:
        print(f"Done: {n_done} frames -> {out_dir}")

    if args.eval_gt:
        if eval_n:
            summary = "  ".join(f"{k}={eval_sums[k] / eval_n:.4f}" for k in sorted(eval_sums))
            align_note = "no-align" if args.eval_no_align else "SSI-aligned"
            print(f"Eval vs {args.eval_gt} ({eval_n}/{n_done} frames, {align_note}): {summary}")
        else:
            print(f"Eval: no ground-truth files matched under {args.eval_gt}")


if __name__ == "__main__":
    main()
