#!/usr/bin/env python3
"""Batch-size vs fps/chip sweep on the real TPU (VERDICT round-4 item #1).

The headline metric is depth fps per chip; every pre-round-5 single-chip
number was batch 1. This sweeps the per-dispatch batch B over the full
on-device pipeline (uint8 frames -> resize/normalize -> model -> depth,
frames device-resident, bench.py's chip-throughput discipline) for
DA-V2 ViT-L and ViT-S, bf16 vs int8+qkv, scan vs k=6-unroll encoders.
Batch amortizes weight streaming and per-dispatch fixed cost; the knee of
the curve is where a throughput-oriented server (run_batch.py
--per-chip-batch) should sit.

All (mode, tier) variants of a model share one device-resident param set
(DPTModel re-wrapping is a no-op on device arrays), so the sweep pays one
tunnel upload per model + one int8 requantize, not 4.

Run: python tools/batch_sweep.py [--quick] [--batches 1 2 4 8 16]
Rows land in docs/performance.md ("Batched serving on one chip").
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


CONFIGS = {
    "vitl": dict(features_per_token=1024, num_heads=16, num_blocks=24,
                 reassembly_features_list=(256, 512, 1024, 1024), fusion_channels=256),
    "vits": dict(features_per_token=384, num_heads=6, num_blocks=12,
                 reassembly_features_list=(48, 96, 192, 384), fusion_channels=64),
    # SwiGLU giant: ~30 min synthetic build + a ~2.5 GB param upload over the
    # tunnel (measure_int8_tiers.py budgeting note) — only run it explicitly
    # via --models giant, with nothing else competing for host CPU.
    "giant": dict(features_per_token=1536, num_heads=24, num_blocks=40,
                  reassembly_features_list=(1536,) * 4, fusion_channels=384, is_giant=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="ViT-L only, bf16 only")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--models", nargs="+", default=None, choices=["vitl", "vits", "giant"])
    ap.add_argument("--iters", type=int, default=None,
                    help="dispatches per window (default max(200//B, 16); small values for CPU smoke)")
    ap.add_argument("--scan-only", action="store_true",
                    help="skip the k=6-unroll mode (e.g. the giant, whose 40-block unroll compile "
                         "is minutes per batch shape)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import chip_fps
    from muggled_dpt_tpu.dpt import DPTModel
    from muggled_dpt_tpu.demo_helpers.misc import enable_compilation_cache
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt
    from muggled_dpt_tpu.models.depth_anything import make_family_spec

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    image_bgr = rng.integers(0, 256, size=(720, 1280, 3), dtype=np.uint8)
    rgb = np.ascontiguousarray(image_bgr[..., ::-1])

    def with_unroll(model, k):
        # same device params, different static encoder mode — no re-upload
        cfg = {**model.config, "unroll_blocks": k}
        return DPTModel(model.params, cfg, make_family_spec(cfg, version=2), dtype=jnp.bfloat16)

    names = args.models or (["vitl"] if args.quick else ["vitl", "vits"])
    for name in names:
        t0 = time.time()
        base = make_depthanythingv2_dpt(
            base_patch_grid_hw=(37, 37), patch_size_px=14, dtype=jnp.bfloat16, **CONFIGS[name]
        )
        scaled_hw = base.compute_scaled_hw(image_bgr.shape[:2], 518, True)
        print(f"[{name}] built in {time.time() - t0:.0f}s; serving at {scaled_hw}", flush=True)

        tiers = [("bf16", base)]
        if not args.quick:
            tiers.append(("int8+qkv", base.quantize_encoder_int8(include_qkv=True)))
        for tier_name, tier_model in tiers:
            modes = [("scan", tier_model)]
            if not args.scan_only:
                modes.append(("unroll6", with_unroll(tier_model, 6)))
            for mode_name, model in modes:
                prev_fps = None
                for b in args.batches:
                    frames = rgb if b == 1 else np.broadcast_to(rgb, (b, *rgb.shape))
                    frame_dev = jax.device_put(jnp.asarray(frames))
                    run_one = lambda: model.inference_rgb_device(frame_dev, scaled_hw)
                    np.asarray(run_one())  # compile + full readback validation
                    iters = args.iters or max(200 // b, 16)
                    fps = chip_fps(run_one, probe=lambda d: d[0, 0, 0], iters=iters) * b
                    gain = "" if prev_fps is None else f"  ({fps / prev_fps - 1.0:+.1%} vs prev B)"
                    print(
                        f"{name:5s} {tier_name:9s} {mode_name:8s} B={b:<3d} "
                        f"{1000.0 * b / fps:7.2f} ms/dispatch  {1000.0 / fps:6.2f} ms/frame  "
                        f"{fps:7.1f} fps/chip{gain}",
                        flush=True,
                    )
                    prev_fps = fps
                    del frame_dev
        del base, tiers


if __name__ == "__main__":
    main()
