"""Large-resolution e2e latency sweep (DA-V2 ViT-L, scan mode, bf16).

Reproduces the reference's published size ladder
(/root/reference/muggled_dpt/v1_depthanything/components/README.md:20-29:
252/392/504/756/1036/1428/1904 at 10/19/34/72/147/330/830 ms fp16-GPU) on
the chip, using the same device-resident-frame chip-throughput method as
bench.py (ordered dispatch + one final probe readback; the tunnel's ~25 ms
RTT amortizes over the window).

Run: python tools/bench_sizes.py [--unroll[=K]] [--batch=B] [size ...]
(default sizes: 756 1036 1428 1904)
--unroll measures the fixed-shape serving mode; bare --unroll picks the
measured knee k=6 (round-4e: k=6 96.0 fps beats full unroll's 94.0 @504^2
and compiles 3.4x faster); --unroll=full forces the full Python unroll,
--unroll=K any scan(unroll=K). --batch=B feeds a (B, H, W, 3) frame stack
per dispatch and reports amortized ms/frame + fps/chip (the round-5
batched-serving axis, extended here from 518 to the XL ladder).
Compiles are cached persistently.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

REF_GPU_MS = {252: 10, 392: 19, 504: 34, 518: 34, 756: 72, 1036: 147, 1428: 330, 1904: 830}


def main():
    from muggled_dpt_tpu.demo_helpers.misc import enable_compilation_cache
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

    enable_compilation_cache()
    args = sys.argv[1:]
    unroll: bool | int = False
    batches = [1]
    sizes = []
    for a in args:
        if a == "--unroll":
            unroll = 6  # the measured serving knee (see module docstring)
        elif a.startswith("--unroll="):
            v = a.split("=", 1)[1]
            unroll = True if v == "full" else int(v)
        elif a.startswith("--batch="):
            batches = [int(v) for v in a.split("=", 1)[1].split(",")]
        else:
            sizes.append(int(a))
    sizes = sizes or [756, 1036, 1428, 1904]

    model = make_depthanythingv2_dpt(
        features_per_token=1024,
        num_heads=16,
        num_blocks=24,
        reassembly_features_list=(256, 512, 1024, 1024),
        base_patch_grid_hw=(37, 37),
        fusion_channels=256,
        patch_size_px=14,
        unroll_blocks=unroll,
        dtype=jnp.bfloat16,
    )
    if unroll:
        mode = "full" if unroll is True else f"k={unroll}"
        print(f"mode: unroll_blocks={mode} (fixed-shape serving)", flush=True)

    rng = np.random.default_rng(0)
    image_bgr = rng.integers(0, 256, size=(2160, 2160, 3), dtype=np.uint8)
    rgb = np.ascontiguousarray(image_bgr[..., ::-1])
    if batches != [1]:
        print(f"batch: B in {batches} frames per dispatch (amortized ms/frame below)", flush=True)

    for batch in batches:
        frames = rgb if batch == 1 else np.broadcast_to(rgb, (batch, *rgb.shape))
        frame = jax.device_put(jnp.asarray(frames))
        for size in sizes:
            scaled_hw = model.compute_scaled_hw(image_bgr.shape[:2], size, True)
            run_one = lambda: model.inference_rgb_device(frame, scaled_hw)
            np.asarray(run_one())  # compile + full readback
            # window sized so each measurement stays ~10-20 s on the chip
            iters = max(8, min(100, int(12.0 / max(0.02, batch * REF_GPU_MS.get(size, 400) / 1000.0 / 2.5))))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [run_one() for _ in range(iters)]
                np.asarray(outs[-1][0, 0, 0])
                best = min(best, (time.perf_counter() - t0) / iters / batch)
            ref = REF_GPU_MS.get(size)
            ratio = f"  ref {ref} ms -> {ref / (best * 1e3):.2f}x" if ref else ""
            btag = f" [B={batch}]" if batch > 1 else ""
            print(
                f"{size:>5}^2 -> {scaled_hw}:{btag} {best * 1e3:8.2f} ms/frame ({1.0 / best:6.1f} fps/chip){ratio}",
                flush=True,
            )
        del frame


if __name__ == "__main__":
    main()
