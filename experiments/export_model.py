#!/usr/bin/env python3
"""Model export (the jax.export/StableHLO analog of reference
experiments/export_onnx.py): serialize the jitted forward to a portable
StableHLO artifact, reload it, verify numerical parity against the live
model (the reference displays ONNX-vs-torch parity, export_onnx.py:181-197),
and run a timing loop (export_onnx.py:199-211).

Like the reference's ONNX path, the exported program is shape-specialized;
export one artifact per input size you need (SwinV2's reference export is
likewise fixed-size-only, experiments/README.md:87)."""

import argparse
import os.path as osp
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict  # noqa: E402
from muggled_dpt_tpu.demo_helpers.saving import get_save_folder  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", default=None)
    parser.add_argument("-b", "--base_size_px", default=None, type=int)
    parser.add_argument("-o", "--output_folder", default=None)
    parser.add_argument("--timing_iters", default=20, type=int)
    args = parser.parse_args()

    if args.model_path:
        config, model = make_dpt_from_state_dict(args.model_path)
        name = osp.splitext(osp.basename(args.model_path))[0]
    else:
        from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

        print("No model path - using tiny random DA-V2")
        model = make_depthanythingv2_dpt(64, 1, 8, (8, 16, 32, 64), (16, 16), 16)
        config = model.config
        name = "tiny_dav2"

    side = args.base_size_px or model.default_size_px
    scaled_hw = model.compute_scaled_hw((side, side), side, True)
    h, w = scaled_hw
    print(f"Exporting at fixed input size {h}x{w}")

    fwd = model.spec["forward"]
    params = model.params

    def forward_only_image(image_nhwc):
        return fwd(params, image_nhwc)

    example = jnp.zeros((1, h, w, 3), model.params["patch_embed"]["kernel"].dtype)
    exported = jax_export.export(jax.jit(forward_only_image))(
        jax.ShapeDtypeStruct(example.shape, example.dtype)
    )
    blob = exported.serialize()

    out_dir = get_save_folder(args.output_folder or osp.join("saved_results", "exports"))
    out_path = osp.join(out_dir, f"{name}_{h}x{w}.stablehlo")
    with open(out_path, "wb") as f:
        f.write(blob)
    print(f"Serialized StableHLO: {out_path} ({len(blob) / 1e6:.1f} MB)")

    # reload + parity check (reference export_onnx.py:181-197)
    reloaded = jax_export.deserialize(bytearray(open(out_path, "rb").read()))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, 3)), example.dtype)
    ref_out = np.asarray(forward_only_image(x), np.float32)
    exp_out = np.asarray(reloaded.call(x), np.float32)
    abs_rel = float(np.abs(ref_out - exp_out).mean() / (np.abs(ref_out).mean() + 1e-12))
    print(f"Export parity abs-rel vs live model: {abs_rel:.2e}")
    assert abs_rel < 1e-3, "export does not match live model!"

    # timing loop (reference export_onnx.py:199-211)
    call = jax.jit(reloaded.call)
    jax.block_until_ready(call(x))
    t0 = time.perf_counter()
    for _ in range(args.timing_iters):
        out = call(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.timing_iters
    print(f"Exported-model timing: {dt * 1000:.2f} ms/frame ({1 / dt:.1f} fps)")


if __name__ == "__main__":
    main()
