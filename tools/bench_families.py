"""BEiT-L-512 / SwinV2-L-384 end-to-end chip throughput (real TPU).

Refreshes the non-DA family rows in docs/performance.md with the same
device-resident-frame chip-throughput method as bench.py (ordered dispatch
windows + one final probe readback). Synthetic L-scale weights — latency is
weight-value independent.

Run: python tools/bench_families.py [beit|swinv2 ...]   (~6 min both)
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def chip_ms(run_one, probe, iters=200):
    # single source of truth for the dispatch/probe discipline: bench.chip_fps
    from bench import chip_fps

    return 1e3 / chip_fps(run_one, probe, iters=iters)


def main():
    from muggled_dpt_tpu.demo_helpers.misc import enable_compilation_cache

    enable_compilation_cache()
    which = [a for a in sys.argv[1:]] or ["beit", "swinv2"]
    rng = np.random.default_rng(0)
    image_bgr = rng.integers(0, 256, size=(720, 1280, 3), dtype=np.uint8)

    if "beit" in which:
        from muggled_dpt_tpu.make_beit_dpt import make_beit_dpt

        model = make_beit_dpt(
            features_per_token=1024,
            num_heads=16,
            num_blocks=24,
            reassembly_features_list=(256, 512, 1024, 1024),
            base_patch_grid_hw=(32, 32),
            fusion_channels=256,
            dtype=jnp.bfloat16,
        )
        scaled_hw = model.compute_scaled_hw(image_bgr.shape[:2], 512, True)
        frame = jax.device_put(jnp.asarray(np.ascontiguousarray(image_bgr[..., ::-1])))
        run_one = lambda: model.inference_rgb_device(frame, scaled_hw)
        np.asarray(run_one())
        ms = chip_ms(run_one, probe=lambda d: d[0, 0, 0])
        print(f"BEiT-L-512 @ {scaled_hw[0]}x{scaled_hw[1]}: {ms:.2f} ms ({1e3/ms:.1f} fps)", flush=True)

    if "swinv2" in which:
        from muggled_dpt_tpu.make_swinv2_dpt import make_swinv2_dpt

        model = make_swinv2_dpt(
            features_per_stage=(192, 384, 768, 1536),
            heads_per_stage=(6, 12, 24, 48),
            layers_per_stage=(2, 2, 18, 2),
            base_patch_grid_hw=(96, 96),
            window_size_hw=(24, 24),
            pretrained_window_sizes_per_stage=(12, 12, 12, 6),
            fusion_channels=256,
            dtype=jnp.bfloat16,
        )
        scaled_hw = model.compute_scaled_hw(image_bgr.shape[:2], 384, True)
        frame = jax.device_put(jnp.asarray(np.ascontiguousarray(image_bgr[..., ::-1])))
        run_one = lambda: model.inference_rgb_device(frame, scaled_hw)
        np.asarray(run_one())
        ms = chip_ms(run_one, probe=lambda d: d[0, 0, 0])
        print(f"SwinV2-L-384 @ {scaled_hw[0]}x{scaled_hw[1]}: {ms:.2f} ms ({1e3/ms:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
