#!/usr/bin/env python3
"""Chart the lax.scan(unroll=k) compile-time / throughput trade for serving.

`unroll_blocks=True` (full Python unroll) buys ~12% encoder speed for a
112 s ViT-L compile per shape; the scan default compiles in 16 s but leaves
that speed on the table (models/dinov2.py:DinoV2Config.unroll). This tool
measures the middle ground — lax.scan(unroll=k) for k in {1, 2, 3, 6, full} —
on the real chip: cold compile seconds (persistent compilation cache NOT
enabled, so each k is a true compile) and steady-state fps at the headline
504² ViT-L config. If a knee exists (most of the fps for a fraction of the
compile), it becomes the recommended serving default in docs/performance.md.

Run: python tools/scan_unroll_curve.py [--ks 1 2 3 6 full] [--iters 150]
(real TPU; ~15 min worst case — the full-unroll compile alone is ~2 min).
"""

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", nargs="*", default=["1", "2", "3", "6", "full"])
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument(
        "--interleave", type=int, default=0, metavar="R",
        help="compile every k first, then measure fps in R alternating rounds "
        "and report the per-k median — rows measured minutes apart carry "
        "tunnel-bandwidth drift (the round-4a sequential pass read full-unroll "
        "at 81 fps minutes after bench.py read the same mode at 94)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import chip_fps, ensure_backend_reachable
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

    ensure_backend_reachable(timeout_s=600)
    print(f"devices: {jax.devices()}")

    rng = np.random.default_rng(0)
    image_bgr = rng.integers(0, 256, size=(720, 1280, 3), dtype=np.uint8)

    frame_dev = jax.device_put(jnp.asarray(np.ascontiguousarray(image_bgr[..., ::-1])))
    runners, compile_secs = {}, {}
    for kstr in args.ks:
        # NOTE: True == 1 in Python — the earlier `if unroll == 1` demotion
        # also caught "full" and silently measured scan mode for it (the
        # round-4a/4c "full" rows tracked k=1 to 0.03 fps and "compiled" in
        # 16 s). Keep the branches disjoint.
        if kstr == "full":
            unroll = True
        else:
            unroll = int(kstr)
            if unroll == 1:
                unroll = False
        model = make_depthanythingv2_dpt(
            features_per_token=1024, num_heads=16, num_blocks=24,
            reassembly_features_list=(256, 512, 1024, 1024),
            base_patch_grid_hw=(37, 37), fusion_channels=256, patch_size_px=14,
            unroll_blocks=unroll, dtype=jnp.bfloat16,
        )
        scaled_hw = model.compute_scaled_hw(image_bgr.shape[:2], args.size, True)
        run_one = (lambda m, hw: lambda: m.inference_rgb_device(frame_dev, hw))(model, scaled_hw)

        t0 = time.perf_counter()
        np.asarray(run_one())  # trace + compile + first run, full readback
        compile_secs[kstr] = time.perf_counter() - t0
        runners[kstr] = run_one

    rows = []
    if args.interleave:
        # alternating rounds: every k is measured within the same drift window
        samples = {k: [] for k in args.ks}
        for r in range(args.interleave):
            for kstr in args.ks:
                fps = chip_fps(runners[kstr], probe=lambda d: d[0, 0, 0], iters=args.iters)
                samples[kstr].append(round(fps, 2))
                print(f"round {r}: unroll={kstr:>4s}  {fps:6.2f} fps", flush=True)
        for kstr in args.ks:
            rows.append({
                "unroll": kstr, "compile_s": round(compile_secs[kstr], 1),
                "fps": float(np.median(samples[kstr])), "fps_rounds": samples[kstr],
            })
            print(f"unroll={kstr:>4s}: compile {compile_secs[kstr]:6.1f} s   "
                  f"median {rows[-1]['fps']:6.2f} fps  rounds {samples[kstr]}", flush=True)
    else:
        for kstr in args.ks:
            fps = chip_fps(runners[kstr], probe=lambda d: d[0, 0, 0], iters=args.iters)
            rows.append({"unroll": kstr, "compile_s": round(compile_secs[kstr], 1), "fps": round(fps, 2)})
            print(f"unroll={kstr:>4s}: compile {compile_secs[kstr]:6.1f} s   {fps:6.2f} fps", flush=True)

    print(json.dumps({"metric": "scan_unroll_curve @504^2 ViT-L bf16", "rows": rows}))


if __name__ == "__main__":
    main()
