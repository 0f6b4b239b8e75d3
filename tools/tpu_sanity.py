#!/usr/bin/env python3
"""On-hardware sanity sweep (run manually on a TPU; the pytest suite runs on
CPU). Checks kernel-vs-XLA numerics on the real chip and smokes every family.

Usage: python tools/tpu_sanity.py
"""

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def check(name, ok, detail=""):
    print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}")
    return ok


def main():
    dev = jax.devices()[0]
    print("device:", dev, "| platform:", dev.platform)
    ok = True
    rng = np.random.default_rng(0)

    # flash attention vs XLA on hardware (moderate + large N, with bias)
    from muggled_dpt_tpu.ops.pallas.flash_attention import flash_attention

    for n, with_bias in [(1297, False), (1025, True), (5185, False)]:
        h, d = 8, 64
        q = jnp.asarray(rng.standard_normal((1, n, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((1, n, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((1, n, h, d)), jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((1, h, n, n)), jnp.float32) if with_bias else None
        got = np.asarray(flash_attention(q, k, v, bias=bias), np.float32)
        ref = np.asarray(jax.nn.dot_product_attention(q, k, v, bias=bias), np.float32)
        err = np.abs(got - ref).max()
        ok &= check(f"flash_attention N={n} bias={with_bias}", err < 0.02, f"maxdiff {err:.4f}")

    # window attention kernel vs einsum path on hardware
    from muggled_dpt_tpu.ops.pallas.window_attention import window_flash_attention

    b, nw, a, h, d = 1, 4, 150, 3, 32
    q = jnp.asarray(rng.standard_normal((b, nw, a, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, nw, a, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, nw, a, h, d)), jnp.bfloat16)
    cpb = jnp.asarray(rng.standard_normal((h, a, a)), jnp.float32)
    mask = jnp.asarray(rng.choice([0.0, -100.0], size=(nw, a, a)).astype(np.float32))
    got = np.asarray(window_flash_attention(q, k, v, cpb, mask), np.float32)
    logits = jnp.einsum("bwnhd,bwmhd->bwhnm", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits + cpb[None, None] + mask[None, :, None]
    w = jax.nn.softmax(logits, axis=-1)
    ref = np.asarray(jnp.einsum("bwhnm,bwmhd->bwnhd", w, v.astype(jnp.float32)), np.float32)
    err = np.abs(got - ref).max()
    ok &= check("window_flash_attention", err < 0.02, f"maxdiff {err:.4f}")

    # family smokes (tiny random models, bf16)
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt
    from muggled_dpt_tpu.make_beit_dpt import make_beit_dpt
    from muggled_dpt_tpu.make_swinv2_dpt import make_swinv2_dpt

    img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    models = [
        ("DA-V2", make_depthanythingv2_dpt(64, 1, 8, (8, 16, 32, 64), (8, 8), 16, dtype=jnp.bfloat16)),
        ("BEiT", make_beit_dpt(64, 4, 8, (8, 16, 32, 64), (6, 6), 16, dtype=jnp.bfloat16)),
        ("SwinV2", make_swinv2_dpt((16, 32, 64, 128), (2, 4, 4, 8), (2, 2, 4, 2), (16, 16), (4, 4), (None,) * 4, 16, dtype=jnp.bfloat16)),
    ]
    for name, m in models:
        t0 = time.perf_counter()
        depth = np.asarray(m.inference(img))
        ok &= check(f"{name} smoke", np.isfinite(depth).all(), f"{depth.shape} in {time.perf_counter()-t0:.1f}s")

    # batched serving entry on hardware (bench --batch / batch_sweep): a
    # B=3 stack through one dispatch must match per-frame results on the
    # CHIP's program (CPU tests cover the semantics; this catches any
    # TPU-specific batched-layout compilation bug)
    m_b = models[0][1]
    rgb = np.ascontiguousarray(img[..., ::-1])
    hw = m_b.compute_scaled_hw(img.shape[:2], None, True)
    frames = np.stack([rgb, rgb[::-1].copy(), rgb])
    db = np.asarray(m_b.inference_rgb_device(jnp.asarray(frames), hw), np.float32)
    d0 = np.asarray(m_b.inference_rgb_device(jnp.asarray(rgb), hw), np.float32)[0]
    absrel_b = float(np.abs(db[0] - d0).mean() / (np.abs(d0).mean() + 1e-12))
    ok &= check(
        "batched inference (B=3) vs single frame",
        db.shape[0] == 3 and np.isfinite(db).all() and absrel_b < 2e-2 and (db[0] == db[2]).all(),
        f"abs-rel {absrel_b:.2e}, dup rows equal {(db[0] == db[2]).all()}",
    )
    # same gate for SwinV2: the batch-aware b*nW window-kernel dispatch
    # (models/swinv2.py:window_attention) routes mid-pyramid stages through
    # the fused kernel ONLY when batched (nW=4 alone stays XLA; 3*4 >= 8
    # dispatches) — this exercises that kernel regime on the chip's program
    m_sw = models[2][1]
    hw_sw = m_sw.compute_scaled_hw(img.shape[:2], None, True)
    db = np.asarray(m_sw.inference_rgb_device(jnp.asarray(frames), hw_sw), np.float32)
    d0 = np.asarray(m_sw.inference_rgb_device(jnp.asarray(rgb), hw_sw), np.float32)[0]
    absrel_b = float(np.abs(db[0] - d0).mean() / (np.abs(d0).mean() + 1e-12))
    ok &= check(
        "SwinV2 batched (B=3, b*nW kernel dispatch) vs single",
        db.shape[0] == 3 and np.isfinite(db).all() and absrel_b < 2e-2 and (db[0] == db[2]).all(),
        f"abs-rel {absrel_b:.2e}, dup rows equal {(db[0] == db[2]).all()}",
    )

    # bf16-vs-f32 parity gate on hardware: the shipped default dtype is bf16;
    # quantify its end-to-end abs-rel against the f32 parity path per family
    # at a realistic input size. Round-3 diagnosis: the old 1.5e-2..4.8e-2
    # family "spread" here was a FIXTURE artifact, not family kernels — flat
    # 0.05-scale random neck convs amplified activations ~2.4x per 3x3 conv,
    # the head's final ReLU clipped 85-96% of outputs to zero, and abs-rel
    # then measured ReLU boundary flips (f32 aux vs bf16 aux measured
    # identically, ruling out the aux cache). With fan-in-scaled neck
    # generators all four families sit at ~3-9e-3, matching the ~1e-2
    # encoder-level bf16 error seen in block-by-block traces.
    from muggled_dpt_tpu.make_depthanythingv1_dpt import make_depthanythingv1_dpt

    img_big = rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8)
    family_builders = [
        ("DA-V2 F256L12", lambda dt: make_depthanythingv2_dpt(256, 4, 12, (32, 64, 128, 256), (37, 37), 64, dtype=dt), 2e-2),
        ("DA-V1 F256L12", lambda dt: make_depthanythingv1_dpt(256, 4, 12, (32, 64, 128, 256), (37, 37), 64, dtype=dt), 2e-2),
        ("BEiT F256L12", lambda dt: make_beit_dpt(256, 4, 12, (32, 64, 128, 256), (24, 24), 64, dtype=dt), 2e-2),
        ("SwinV2 T-ish", lambda dt: make_swinv2_dpt((96, 192, 384, 768), (3, 6, 12, 24), (2, 2, 6, 2), (64, 64), (8, 8), (None,) * 4, 64, dtype=dt), 2e-2),
    ]
    for name, build, budget in family_builders:
        d32 = np.asarray(build(jnp.float32).inference(img_big), np.float32)
        d16 = np.asarray(build(jnp.bfloat16).inference(img_big), np.float32)
        absrel = float(np.abs(d16 - d32).mean() / (np.abs(d32).mean() + 1e-12))
        ok &= check(f"{name} bf16 abs-rel vs f32", absrel < budget, f"{absrel:.2e} @ {d32.shape}")

    # int8 serving-tier recipe check on hardware: the dynamic-per-token /
    # static-per-channel w8a8 path must stay close to the dense model at the
    # mid scale (recipe-level gate; full ViT-L random-weight numbers are
    # dominated by chaotic neck amplification — see docs/performance.md).
    m16 = make_depthanythingv2_dpt(256, 4, 12, (32, 64, 128, 256), (37, 37), 64, dtype=jnp.bfloat16)
    d_dense = np.asarray(m16.inference(img_big), np.float32)
    d_q8 = np.asarray(m16.quantize_encoder_int8().inference(img_big), np.float32)
    absrel_default = float(np.abs(d_q8 - d_dense).mean() / (np.abs(d_dense).mean() + 1e-12))
    ok &= check("DA-V2 F256L12 int8 tier abs-rel vs bf16", absrel_default < 5e-2, f"{absrel_default:.2e}")

    # calibrated include_qkv gate: SmoothQuant smoothing from 2 frames must
    # bring the full-subset (qkv included) error within ~2x the default
    # subset's error (round-3 VERDICT item 6 acceptance)
    cal_frames = [rng.integers(0, 256, (360, 640, 3), dtype=np.uint8) for _ in range(2)]
    m_cal = m16.quantize_encoder_int8(include_qkv=True, calibration_images=cal_frames)
    d_cal = np.asarray(m_cal.inference(img_big), np.float32)
    absrel_cal = float(np.abs(d_cal - d_dense).mean() / (np.abs(d_dense).mean() + 1e-12))
    m_qkv = m16.quantize_encoder_int8(include_qkv=True)
    d_qkv = np.asarray(m_qkv.inference(img_big), np.float32)
    absrel_qkv = float(np.abs(d_qkv - d_dense).mean() / (np.abs(d_dense).mean() + 1e-12))
    ok &= check(
        "int8 calibrated include_qkv within 2x default-subset error",
        absrel_cal < 2.0 * absrel_default + 1e-3,
        f"calibrated {absrel_cal:.2e} | uncalibrated qkv {absrel_qkv:.2e} | default {absrel_default:.2e}",
    )

    # full-tier gate (round 3b): encoder + neck GEMMs quantized — the
    # added neck error must stay small relative to the encoder-only tier
    m_full = m16.quantize_encoder_int8(include_neck=True)
    d_full = np.asarray(m_full.inference(img_big), np.float32)
    absrel_full = float(np.abs(d_full - d_dense).mean() / (np.abs(d_dense).mean() + 1e-12))
    ok &= check(
        "int8 include_neck within 1.5x encoder-only error",
        absrel_full < 1.5 * absrel_default + 1e-3,
        f"full {absrel_full:.2e} | encoder-only {absrel_default:.2e}",
    )

    print("\nALL PASS" if ok else "\nFAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
