"""Component-split profiler for the DA-V2 models (ViT-L default, --giant).

Times cumulative pipeline prefixes (prep | +embed+encoder | +reassembly |
+fusion | +head) on the real TPU, using the slope between two dispatch-queue
depths so the tunnel's ~25 ms readback RTT cancels. Differences between
consecutive rows give the per-stage split that docs/performance.md reports.

Run: python tools/profile_split.py [size] [--giant]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit_queue(fn, k1=10, k2=40, reps=5):
    # keep ONLY the newest output alive: holding all k queued results pins
    # k copies of the stage output in HBM (at 1428^2 the 40-deep encoder-
    # prefix rows alone exceed the chip's memory — RESOURCE_EXHAUSTED),
    # while dropping the reference frees each buffer as the queue drains
    last = None
    for _ in range(3):
        last = fn()
    np.asarray(jax.tree_util.tree_leaves(last)[0].ravel()[0])

    def run(k):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            last = None
            for _ in range(k):
                last = fn()
            np.asarray(jax.tree_util.tree_leaves(last)[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(k2) - run(k1)) / (k2 - k1)


def main():
    sys.path.insert(0, "/root/repo")
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt
    from muggled_dpt_tpu.ops.nn import patchify_embed
    from muggled_dpt_tpu.models.dinov2 import encoder_forward
    from muggled_dpt_tpu.models.dpt_neck import fusion_forward, head_forward, reassemble_forward
    from muggled_dpt_tpu.checkpoints.depth_anything import REASSEMBLY_SCALES

    args = [a for a in sys.argv[1:] if a != "--giant"]
    giant = "--giant" in sys.argv[1:]
    size = int(args[0]) if args else 518

    if giant:
        # DA-V2 ViT-Giant (SwiGLU): reference make_depthanythingv2_dpt.py:88-95
        model = make_depthanythingv2_dpt(
            features_per_token=1536,
            num_heads=24,
            num_blocks=40,
            reassembly_features_list=(1536, 1536, 1536, 1536),
            base_patch_grid_hw=(37, 37),
            fusion_channels=384,
            patch_size_px=14,
            is_giant=True,
            dtype=jnp.bfloat16,
        )
    else:
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
    enc_cfg = model.spec["encoder_config"]

    rng = np.random.default_rng(0)
    image_bgr = rng.integers(0, 256, size=(720, 1280, 3), dtype=np.uint8)
    scaled_hw = model.compute_scaled_hw(image_bgr.shape[:2], size, True)
    print(f"scaled: {scaled_hw}")
    frame = jax.device_put(jnp.asarray(np.ascontiguousarray(image_bgr[..., ::-1])))
    params = model.params

    def prep(frame):
        return model._prep_jit(frame.astype(jnp.float32), scaled_hw)

    def upto_encoder(p, x):
        tokens, grid = patchify_embed(x, p["patch_embed"]["kernel"], p["patch_embed"]["bias"])
        return encoder_forward(p["encoder"], tokens, grid, enc_cfg)

    def upto_reassembly(p, x):
        stages = upto_encoder(p, x)
        gh, gw = x.shape[1] // 14, x.shape[2] // 14
        return reassemble_forward(stages, (gh, gw), p["reassemble"], REASSEMBLY_SCALES, readout="ignore")

    def upto_fusion(p, x):
        return fusion_forward(upto_reassembly(p, x), p["fusion"])

    def upto_head(p, x):
        return head_forward(upto_fusion(p, x), p["head"], 14 / 8, False)

    f_prep = jax.jit(prep)
    f_enc = jax.jit(lambda p, fr: upto_encoder(p, prep(fr)))
    f_rea = jax.jit(lambda p, fr: upto_reassembly(p, prep(fr)))
    f_fus = jax.jit(lambda p, fr: upto_fusion(p, prep(fr)))
    f_head = jax.jit(lambda p, fr: upto_head(p, prep(fr)))
    rows = [
        ("e2e inference (prep+model)", lambda: model._infer_jit(params, frame, scaled_hw, None)),
        ("prep only", lambda: f_prep(frame)),
        ("prep+embed+encoder", lambda: f_enc(params, frame)),
        ("+reassembly", lambda: f_rea(params, frame)),
        ("+fusion", lambda: f_fus(params, frame)),
        ("+head", lambda: f_head(params, frame)),
    ]
    times = {}
    for label, fn in rows:
        t = timeit_queue(fn)
        times[label] = t
        print(f"{label:32s} {t*1e3:8.2f} ms")

    enc = times["prep+embed+encoder"] - times["prep only"]
    rea = times["+reassembly"] - times["prep+embed+encoder"]
    fus = times["+fusion"] - times["+reassembly"]
    head = times["+head"] - times["+fusion"]
    print(f"\nsplit: encoder {enc*1e3:.2f} | reassembly {rea*1e3:.2f} | fusion {fus*1e3:.2f} | head {head*1e3:.2f} ms")
    print(f"e2e fps: {1.0/times['e2e inference (prep+model)']:.1f}")


if __name__ == "__main__":
    main()
