"""Benchmark: Depth-Anything V2 ViT-L end-to-end inference fps per chip at a
518 max-side request (snaps to 504x504, the same sizing the torch reference
produces — BASELINE.json headline metric "depth fps/chip at 518x518 ViT-S/L").

Baseline: the reference's published DA ViT-L fp16 time at 504x504 on an
(unnamed) NVIDIA GPU is 34 ms -> 29.4 fps (BASELINE.md). vs_baseline is our
fps divided by that.

Prints ONE JSON line to stdout."""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

    model = make_depthanythingv2_dpt(
        features_per_token=1024,
        num_heads=16,
        num_blocks=24,
        reassembly_features_list=(256, 512, 1024, 1024),
        base_patch_grid_hw=(37, 37),
        fusion_channels=256,
        patch_size_px=14,
        dtype=jnp.bfloat16,
    )

    rng = np.random.default_rng(0)
    image_bgr = rng.integers(0, 256, size=(720, 1280, 3), dtype=np.uint8)

    # warmup / compile
    out = model.inference(image_bgr, 518, True)
    jax.block_until_ready(out)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = model.inference(image_bgr, 518, True)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    fps = 1.0 / dt
    baseline_fps = 1000.0 / 34.0  # reference DA ViT-L fp16 @ 504^2
    print(
        json.dumps(
            {
                "metric": "DA-V2 ViT-L end-to-end depth fps/chip @ 518 max-side (504x504)",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
