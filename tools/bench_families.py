"""BEiT-L-512 / SwinV2-L-384 end-to-end chip throughput (real TPU).

Refreshes the non-DA family rows in docs/performance.md with the same
device-resident-frame chip-throughput method as bench.py (ordered dispatch
windows + one final probe readback). Synthetic L-scale weights — latency is
weight-value independent.

Run: python tools/bench_families.py [beit|swinv2 ...] [--batch=B[,B...]]
(~6 min both at B=1). --batch feeds a (B, H, W, 3) frame stack per dispatch
and reports amortized ms/frame — the round-5 batched-serving axis for the
non-DA families (semantics pinned by tests/test_batched_inference.py).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def chip_ms(run_one, probe, iters=200):
    # single source of truth for the dispatch/probe discipline: bench.chip_fps
    from bench import chip_fps

    return 1e3 / chip_fps(run_one, probe, iters=iters)


def measure(name, model, max_side, rgb, batches, retries=2):
    scaled_hw = model.compute_scaled_hw(rgb.shape[:2], max_side, True)
    for b in batches:
        # RESOURCE_EXHAUSTED off this relayed backend is usually a transient
        # (allocation racing the previous exclusive-access holder's teardown,
        # round-5e families_batch log) — cool down and retry before skipping,
        # and never let one batch size abort the remaining rows.
        for attempt in range(retries + 1):
            frames = rgb if b == 1 else np.broadcast_to(rgb, (b, *rgb.shape))
            frame = jax.device_put(jnp.asarray(frames))
            run_one = lambda: model.inference_rgb_device(frame, scaled_hw)
            try:
                np.asarray(run_one())
            except jax.errors.JaxRuntimeError as err:
                del frame
                if "RESOURCE_EXHAUSTED" not in str(err) or attempt == retries:
                    print(f"{name} [B={b}]: SKIP ({str(err).splitlines()[0]})", flush=True)
                    break
                print(f"{name} [B={b}]: RESOURCE_EXHAUSTED; cooling down 120s", flush=True)
                time.sleep(120)
                continue
            ms = chip_ms(run_one, probe=lambda d: d[0, 0, 0], iters=max(200 // b, 25)) / b
            btag = f" [B={b}]" if len(batches) > 1 or b > 1 else ""
            print(
                f"{name} @ {scaled_hw[0]}x{scaled_hw[1]}:{btag} {ms:.2f} ms/frame ({1e3/ms:.1f} fps/chip)",
                flush=True,
            )
            del frame
            break


def main():
    from muggled_dpt_tpu.demo_helpers.misc import enable_compilation_cache

    enable_compilation_cache()
    batches = [1]
    which = []
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batches = [int(v) for v in a.split("=", 1)[1].split(",")]
        else:
            which.append(a)
    which = which or ["beit", "swinv2"]
    rng = np.random.default_rng(0)
    image_bgr = rng.integers(0, 256, size=(720, 1280, 3), dtype=np.uint8)
    rgb = np.ascontiguousarray(image_bgr[..., ::-1])

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
        measure("BEiT-L-512", model, 512, rgb, batches)
        del model

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
        measure("SwinV2-L-384", model, 384, rgb, batches)
        del model


if __name__ == "__main__":
    main()
