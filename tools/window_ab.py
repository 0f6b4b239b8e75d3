#!/usr/bin/env python3
"""SwinV2 window-attention kernel vs XLA einsum path — isolated A/B on the
chip (VERDICT round-4 item #6: the kernel's individual value was credited
jointly with the CPB cache, never measured alone).

Two measurements:

1. Per-op chain-slope A/B at every Swin-L-384 stage shape: the fused Pallas
   kernel (ops/pallas/window_attention.py) vs the XLA einsum composite it
   replaces (models/swinv2.py:window_attention's impl="xla" branch), over
   identical pre-normalized inputs + CPB bias (+ shift mask for the shifted
   variant). Both sides exclude qkv/proj GEMMs — this isolates exactly the
   code the impl switch selects.

2. End-to-end toggle: SwinV2-L-384 full pipeline latency with
   enable_optimizations True (pallas) vs False (xla), sharing one
   device-resident param set. The only spec difference is attn_impl
   (models/swinv2_family.py:26).

Run: python tools/window_ab.py [--e2e-only|--op-only] [--batch B]
--batch feeds B frames per dispatch (per-op shapes become (B, nW, A, H, D);
the e2e toggle runs a B-frame stack) — the round-5 b*nW dispatch gate
(models/swinv2.py:window_attention) generalizes the B=1 A/B by the kernel's
grid product, and this measures that product directly at batch.
Rows land in docs/performance.md (SwinV2 attribution note).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e2e-only", action="store_true")
    ap.add_argument("--op-only", action="store_true")
    ap.add_argument("--batch", type=int, default=1, help="frames per dispatch (B axis of every shape)")
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp

    from bench import chip_fps
    from muggled_dpt_tpu.demo_helpers.misc import enable_compilation_cache
    from tools.chain_timer import timeit_chain

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    if not args.e2e_only:
        from muggled_dpt_tpu.ops.pallas.window_attention import window_flash_attention
        from muggled_dpt_tpu.models.swinv2 import shift_mask_np

        # Swin-L @384: grid 96 -> stages (nW, A, H, D); window 24 everywhere
        # except stage 4's 12 (window_plan picks the grid itself at grid 12)
        stages = [
            ("s1", 16, 24, 6, 32, (96, 96)),
            ("s2", 4, 24, 12, 32, (48, 48)),
            ("s3", 1, 24, 24, 32, (24, 24)),
            ("s4", 1, 12, 48, 32, (12, 12)),
        ]
        for name, nw, win, h, d, grid in stages:
            a = win * win
            q = jnp.asarray(rng.standard_normal((B, nw, a, h, d)), jnp.bfloat16)
            cpb = jnp.asarray(rng.standard_normal((h, a, a)), jnp.float32)
            shift = win // 2
            mask_np = (
                shift_mask_np(grid, (win, win), (shift, shift)) if nw > 1 else None
            )
            mask = None if mask_np is None else jnp.asarray(mask_np)

            def xla_op(x, mask=None):
                # models/swinv2.py:234-240 minus the (already-applied) q scale
                logits = jnp.einsum(
                    "bwnhd,bwmhd->bwhnm", x, x, preferred_element_type=jnp.float32
                )
                logits = logits + cpb[None, None]
                if mask is not None:
                    logits = logits + mask[None, :, None, :, :]
                w = jax.nn.softmax(logits, axis=-1)
                return jnp.einsum("bwhnm,bwmhd->bwnhd", w.astype(x.dtype), x)

            for label, call in (
                (f"{name} xla  (B*nW={B*nw:<3d} A={a:<4d} H={h})", lambda x: xla_op(x)),
                (f"{name} kern (B*nW={B*nw:<3d} A={a:<4d} H={h})",
                 lambda x: window_flash_attention(x, x, x, cpb)),
            ) + (
                ()
                if mask is None
                else (
                    (f"{name} xla  +shift mask", lambda x: xla_op(x, mask)),
                    (f"{name} kern +shift mask",
                     lambda x: window_flash_attention(x, x, x, cpb, mask)),
                )
            ):
                fn = lambda x, call=call: (x + call(x) * jnp.bfloat16(1e-6)).astype(x.dtype)
                try:
                    t = timeit_chain(fn, q, probe=lambda y: y[0, 0, 0, 0, 0])
                    print(f"  {label:36s} {t*1e6:9.1f} us", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"  {label:36s} failed: {type(e).__name__}: {str(e)[:90]}")

    if not args.op_only:
        from muggled_dpt_tpu.dpt import DPTModel
        from muggled_dpt_tpu.make_swinv2_dpt import make_swinv2_dpt
        from muggled_dpt_tpu.models.swinv2_family import make_family_spec

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
        cfg_xla = {**model.config, "enable_optimizations": False}
        model_xla = DPTModel(model.params, cfg_xla, make_family_spec(cfg_xla), dtype=jnp.bfloat16)

        image_bgr = rng.integers(0, 256, size=(720, 1280, 3), dtype=np.uint8)
        scaled_hw = model.compute_scaled_hw(image_bgr.shape[:2], 384, True)
        rgb = np.ascontiguousarray(image_bgr[..., ::-1])
        frames = rgb if B == 1 else np.broadcast_to(rgb, (B, *rgb.shape))
        frame = jax.device_put(jnp.asarray(frames))
        btag = f" [B={B}]" if B > 1 else ""
        for label, m in (("pallas window kernel", model), ("xla einsum path", model_xla)):
            run_one = lambda: m.inference_rgb_device(frame, scaled_hw)
            np.asarray(run_one())
            ms = 1e3 / chip_fps(run_one, probe=lambda d: d[0, 0, 0], iters=max(200 // B, 25)) / B
            print(f"SwinV2-L-384 e2e{btag} {label:22s} {ms:7.2f} ms/frame ({1e3/ms:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
