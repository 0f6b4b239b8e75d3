#!/usr/bin/env python3
"""Export a Depth-Anything DPT model to a runnable .onnx artifact.

The ONNX counterpart of the reference's experiments/export_onnx.py
(export_onnx.py:117-211). The reference traces its torch model; this repo
emits the graph directly from the functional params pytree
(muggled_dpt_tpu/onnx_export/) — no onnx package required: the ModelProto is
written at the protobuf wire level, and parity is checked by executing the
emitted graph with the in-repo numpy evaluator against the live JAX model
(the reference displays ONNX-vs-torch parity the same way,
export_onnx.py:181-197).

By default the artifact is shape-specialized: export one file per input size
you serve. Input is the normalized (1, 3, H, W) float32 tensor; output is
depth (1, H', W'). With --dynamic (Depth-Anything + BEiT), the export
declares dynamic batch/height/width axes like the reference's dynamic_axes
export (reference experiments/export_onnx.py:117-130) — one artifact serves
any tiling-aligned size; for BEiT the relpos LUT resize + relative-index
gather move in-graph (emit_dpt.py:_beit_dynamic_bias_setup). SwinV2 stays
fixed-shape because its window plan / shift masks / CPB tables are
grid-baked — the same restriction the reference hits
(reference experiments/README.md:87).

Scope: all four families — Depth-Anything (V1/V2/metric/giant), MiDaS-v3.1
BEiT, and MiDaS-v3.1 SwinV2. The StableHLO path (experiments/export_model.py)
remains available for XLA-native deployment.
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict  # noqa: E402
from muggled_dpt_tpu.demo_helpers.saving import get_save_folder  # noqa: E402
from muggled_dpt_tpu.onnx_export import (  # noqa: E402
    emit_beit_onnx,
    emit_depth_anything_onnx,
    emit_swinv2_onnx,
    evaluate_model,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", default=None)
    parser.add_argument("-b", "--base_size_px", default=None, type=int)
    parser.add_argument("-o", "--output_folder", default=None)
    parser.add_argument("--skip_check", action="store_true", help="skip the numpy-evaluator parity check")
    parser.add_argument(
        "--dynamic", action="store_true",
        help="export with dynamic batch/height/width axes (Depth-Anything families only)",
    )
    parser.add_argument("--timing_iters", default=0, type=int, help="time the numpy evaluator (oracle, not a runtime)")
    args = parser.parse_args()

    if args.model_path:
        config, model = make_dpt_from_state_dict(args.model_path)
        name = osp.splitext(osp.basename(args.model_path))[0]
    else:
        from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

        print("No model path - using tiny random DA-V2")
        model = make_depthanythingv2_dpt(64, 1, 8, (8, 16, 32, 64), (16, 16), 16)
        name = "tiny_dav2"

    enc_cfg = model.spec.get("encoder_config")
    family = type(enc_cfg).__name__ if enc_cfg is not None else None
    emitters = {
        "DinoV2Config": emit_depth_anything_onnx,
        "BEiTConfig": emit_beit_onnx,
        "SwinV2Config": emit_swinv2_onnx,
    }
    emit = emitters.get(family)
    if emit is None:
        raise SystemExit(f"no ONNX emitter for encoder family {family!r}")

    side = args.base_size_px or model.default_size_px
    h, w = model.compute_scaled_hw((side, side), side, True)
    if args.dynamic:
        if family == "SwinV2Config":
            raise SystemExit(
                "--dynamic is not supported for SwinV2 (grid-baked window plan / shift "
                "masks / CPB tables — the reference's own limitation, experiments/README.md:87)"
            )
        print(f"Emitting ONNX with dynamic batch/height/width axes (opset 17); parity-checked at {h}x{w}")
        onnx_bytes = emit(model, dynamic=True)
    else:
        print(f"Emitting ONNX at fixed input size {h}x{w} (opset 17)")
        onnx_bytes = emit(model, (h, w))

    out_dir = get_save_folder(args.output_folder or osp.join("saved_results", "exports"))
    out_path = osp.join(out_dir, f"{name}_dynamic.onnx" if args.dynamic else f"{name}_{h}x{w}.onnx")
    with open(out_path, "wb") as f:
        f.write(onnx_bytes)
    print(f"Wrote {out_path} ({len(onnx_bytes) / 1e6:.1f} MB)")

    if not args.skip_check:
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 3, h, w)).astype(np.float32) * 0.5
        want = np.asarray(model.to(jnp.float32).forward(jnp.asarray(x)), np.float32)
        (got,) = evaluate_model(onnx_bytes, {"image": x}).values()
        abs_rel = float(np.abs(got - want).mean() / (np.abs(want).mean() + 1e-12))
        print(f"ONNX parity (numpy evaluator) abs-rel vs live f32 model: {abs_rel:.2e}")
        assert abs_rel < 1e-3, "exported graph does not match live model!"

    for i in range(args.timing_iters):
        x = np.random.default_rng(i).standard_normal((1, 3, h, w)).astype(np.float32)
        t0 = time.perf_counter()
        evaluate_model(onnx_bytes, {"image": x})
        print(f"evaluator iter {i}: {1e3 * (time.perf_counter() - t0):.1f} ms")


if __name__ == "__main__":
    main()
