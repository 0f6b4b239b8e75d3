#!/usr/bin/env python3
"""Measure the int8 serving tiers on the chip: encoder-only vs full
(include_neck) for DA ViT-L and ViT-Giant, at 518 max-side by default
(--sizes 1036 1428 ... measures the XL ladder, where the int8-accelerated
projection/MLP matmul tail is ~40 ms of the 1428-px step).

Writes one line per (model, tier) with chip-throughput latency
(dispatch-queue amortized, CLAUDE.md measurement rules). Numbers land in
docs/performance.md ("int8 full-neck extension").

Budgeting on this environment (see memory/CLAUDE.md): the giant's synthetic
build is ~25-30 min of single-core host RNG/convert and its params upload is
GBs over the relayed tunnel — run with no interfering CPU work and allow
>= 90 min wall. `--vitl-only` measures just ViT-L (~10 min)."""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def chip_ms(run_one, probe, iters=60):
    from bench import chip_fps  # repo-root bench.py owns the methodology

    return 1000.0 / chip_fps(run_one, probe, iters=iters)


CONFIGS = {
    "vitl": dict(features_per_token=1024, num_heads=16, num_blocks=24,
                 reassembly_features_list=(256, 512, 1024, 1024), fusion_channels=256),
    "giant": dict(features_per_token=1536, num_heads=24, num_blocks=40,
                  reassembly_features_list=(1536,) * 4, fusion_channels=384, is_giant=True),
}


def main():
    ap = argparse.ArgumentParser()
    which = ap.add_mutually_exclusive_group()
    which.add_argument("--vitl-only", action="store_true", help="skip the ~30-min giant build")
    which.add_argument("--giant-only", action="store_true", help="measure only the giant")
    which.add_argument("--swinv2-only", action="store_true",
                       help="SwinV2-L-384: the MLP-only int8 subset vs bf16 (the tier's qkv/proj "
                            "exclusion for this family is by design, dpt.py:quantize_encoder_int8 — "
                            "this row is the measurement behind that call)")
    which.add_argument("--beit-only", action="store_true",
                       help="BEiT-L-512: bf16 vs int8 vs int8+qkv. The tier fully supports the "
                            "stacked-blocks BEiT encoder (CPU-tested, tests/test_quant_int8.py) but "
                            "had no chip timing row; BEiT's cached relpos-bias attention stays bf16, "
                            "so the expected win is the MLP/proj share only")
    ap.add_argument("--iters", type=int, default=200)  # CLAUDE.md: >=200 dispatches per window
    ap.add_argument("--sizes", type=int, nargs="+", default=[518], help="max-side px per measurement")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt
    from muggled_dpt_tpu.demo_helpers.misc import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (720, 1280, 3), np.uint8)

    if args.swinv2_only:
        from muggled_dpt_tpu.make_swinv2_dpt import make_swinv2_dpt

        m = make_swinv2_dpt(
            features_per_stage=(192, 384, 768, 1536), heads_per_stage=(6, 12, 24, 48),
            layers_per_stage=(2, 2, 18, 2), base_patch_grid_hw=(96, 96),
            window_size_hw=(24, 24), pretrained_window_sizes_per_stage=(12, 12, 12, 6),
            fusion_channels=256, dtype=jnp.bfloat16,
        )
        scaled_hw = m.compute_scaled_hw(img.shape[:2], 384, True)
        frame = jax.device_put(jnp.asarray(np.ascontiguousarray(img[..., ::-1])))
        for tier, model in (("bf16 dense", m), ("int8 MLP-only", m.quantize_encoder_int8())):
            run_one = lambda: model.inference_rgb_device(frame, scaled_hw)
            np.asarray(run_one())
            ms = chip_ms(run_one, probe=lambda d: d[0, 0, 0], iters=args.iters)
            print(f"swinv2 {tier:22s} @384   {ms:7.2f} ms", flush=True)
        return

    if args.beit_only:
        from muggled_dpt_tpu.make_beit_dpt import make_beit_dpt

        m = make_beit_dpt(
            features_per_token=1024, num_heads=16, num_blocks=24,
            reassembly_features_list=(256, 512, 1024, 1024), base_patch_grid_hw=(32, 32),
            fusion_channels=256, dtype=jnp.bfloat16,
        )
        scaled_hw = m.compute_scaled_hw(img.shape[:2], 512, True)
        frame = jax.device_put(jnp.asarray(np.ascontiguousarray(img[..., ::-1])))
        for tier, build in (
            ("bf16 dense", lambda: m),
            ("int8", lambda: m.quantize_encoder_int8()),
            ("int8+qkv", lambda: m.quantize_encoder_int8(include_qkv=True)),
        ):
            model = build()
            run_one = lambda: model.inference_rgb_device(frame, scaled_hw)
            np.asarray(run_one())
            ms = chip_ms(run_one, probe=lambda d: d[0, 0, 0], iters=args.iters)
            print(f"beit   {tier:22s} @512   {ms:7.2f} ms", flush=True)
            del model
        return

    names = ["vitl"] if args.vitl_only else ["giant"] if args.giant_only else ["vitl", "giant"]
    for name in names:
        t0 = time.time()
        m = make_depthanythingv2_dpt(base_patch_grid_hw=(37, 37), patch_size_px=14,
                                     dtype=jnp.bfloat16, **CONFIGS[name])
        print(f"[{name}] built in {time.time() - t0:.0f}s", flush=True)
        # jit once per tier: the tools measure the compiled serving program,
        # not op-by-op eager dispatch (which times the tunnel, not the chip).
        # Tiers are built lazily inside the loop so only one extra param set
        # is resident at a time (the giant is ~2.5 GB/copy over this tunnel).
        jfwd = jax.jit(m.spec["forward"])
        for tier, build in (
            ("bf16 dense", lambda: m),
            ("int8+qkv", lambda: m.quantize_encoder_int8(include_qkv=True)),
            ("int8+qkv+neck", lambda: m.quantize_encoder_int8(include_qkv=True, include_neck=True)),
        ):
            params = build().params
            for size in args.sizes:
                xd = jax.device_put(m.prepare_image_bgr_nhwc(img, size))
                ms = chip_ms(lambda: jfwd(params, xd, None), probe=lambda d: d[0, 0, 0], iters=args.iters)
                print(f"{name:6s} {tier:22s} @{size:<5d} {ms:7.2f} ms", flush=True)
            del params
        del m, jfwd


if __name__ == "__main__":
    main()
