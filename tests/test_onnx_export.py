"""ONNX export subsystem: wire codec, emitted Depth-Anything graphs, and the
numpy evaluator that proves artifact correctness without onnxruntime.

Validation strategy (no onnx/onnxruntime exists in this image):
1. the wire codec parses a file from an INDEPENDENT producer (torch's C++
   torchscript ONNX exporter) and round-trips it byte-stably;
2. the numpy evaluator runs that torch-produced graph and matches the torch
   module's own output (validates Conv/graph semantics against a third party);
3. emitted Depth-Anything graphs are executed by the evaluator and compared
   against the JAX f32 forward end-to-end.
"""

import io

import numpy as np
import pytest
import jax.numpy as jnp

from muggled_dpt_tpu.onnx_export import (
    decode_message,
    emit_beit_onnx,
    emit_depth_anything_onnx,
    encode_message,
    evaluate_model,
)
from muggled_dpt_tpu.make_depthanythingv1_dpt import make_depthanythingv1_dpt
from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt


def _torch_tiny_onnx():
    """Export a small conv net with torch's torchscript exporter, bypassing
    its onnxscript post-processing step (a no-op for graphs without custom
    onnx-script functions; the actual protobuf serialization is C++-side)."""
    import torch
    import torch.nn as nn
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    original = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        torch.manual_seed(0)
        m = nn.Sequential(nn.Conv2d(3, 4, 3, padding=1), nn.ReLU(), nn.Conv2d(4, 2, 1))
        buf = io.BytesIO()
        x = torch.randn(1, 3, 8, 8)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            torch.onnx.export(m, (x,), buf, dynamo=False)
        return m, x, buf.getvalue()
    finally:
        onnx_proto_utils._add_onnxscript_fn = original


def test_codec_parses_independent_producer_and_roundtrips():
    _, _, data = _torch_tiny_onnx()
    model = decode_message("ModelProto", data)
    assert model["producer_name"] == "pytorch"
    graph = model["graph"]
    assert [n["op_type"] for n in graph["node"]] == ["Conv", "Relu", "Conv"]
    assert {t["name"] for t in graph["initializer"]} == {"0.weight", "0.bias", "2.weight", "2.bias"}
    # structural round trip: decode(encode(decode(x))) is stable
    again = decode_message("ModelProto", encode_message("ModelProto", model))
    assert again == model


def test_evaluator_matches_torch_on_torch_produced_graph():
    import torch

    module, x, data = _torch_tiny_onnx()
    with torch.no_grad():
        want = module(x).numpy()
    graph = decode_message("ModelProto", data)["graph"]
    (input_name,) = [v["name"] for v in graph["input"]]
    out = evaluate_model(decode_message("ModelProto", data), {input_name: x.numpy()})
    (got,) = out.values()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _export_and_compare(model, image_hw, tol=2e-5, emit=emit_depth_anything_onnx):
    onnx_bytes = emit(model, image_hw)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, *image_hw)).astype(np.float32) * 0.5
    want = np.asarray(model.forward(jnp.asarray(x)), np.float32)
    (got,) = evaluate_model(onnx_bytes, {"image": x}).values()
    assert got.shape == want.shape, (got.shape, want.shape)
    denom = max(np.abs(want).mean(), 1e-9)
    absrel = np.abs(got.astype(np.float32) - want).mean() / denom
    assert absrel < tol, absrel
    return onnx_bytes


def test_emitted_dav2_matches_jax_forward():
    m = make_depthanythingv2_dpt(64, 2, 4, (8, 16, 32, 64), (8, 8), 16)
    data = _export_and_compare(m, (112, 112))
    # serialized model parses back and declares the documented opset
    parsed = decode_message("ModelProto", data)
    assert parsed["opset_import"][0]["version"] == 17
    assert parsed["graph"]["input"][0]["name"] == "image"


def test_emitted_dav2_nonsquare_and_posenc_resize():
    # non-square grid (8x12 patches) exercises the baked pos-embed resize
    m = make_depthanythingv2_dpt(64, 2, 4, (8, 16, 32, 64), (8, 8), 16)
    _export_and_compare(m, (112, 168))


def test_emitted_metric_variant_uses_sigmoid():
    m = make_depthanythingv2_dpt(64, 2, 4, (8, 16, 32, 64), (8, 8), 16, is_metric=True)
    data = _export_and_compare(m, (112, 112))
    ops = [n["op_type"] for n in decode_message("ModelProto", data)["graph"]["node"]]
    assert ops[-2] == "Sigmoid"  # metric head (dpt_neck.py:head_forward)


def test_emitted_giant_swiglu():
    m = make_depthanythingv2_dpt(64, 2, 4, (8, 16, 32, 64), (8, 8), 16, is_giant=True)
    _export_and_compare(m, (112, 112))


def test_emitted_dav1_last4_taps():
    m = make_depthanythingv1_dpt(64, 2, 6, (8, 16, 32, 64), (8, 8), 16)
    _export_and_compare(m, (112, 112))


def test_emitted_beit_matches_jax_forward():
    """BEiT: relpos bias baked per layer, q/v-only qkv bias, readout-project
    reassembly, no encoder output norm."""
    from muggled_dpt_tpu.make_beit_dpt import make_beit_dpt

    m = make_beit_dpt(64, 4, 8, (8, 16, 32, 64), (6, 6), 16)
    data = _export_and_compare(m, (96, 96), emit=emit_beit_onnx)
    graph = decode_message("ModelProto", data)["graph"]
    ops = [n["op_type"] for n in graph["node"]]
    assert "Expand" in ops  # readout-project cls broadcast
    # one baked (1, H, N, N) bias initializer per block
    biases = [t for t in graph["initializer"] if t["name"].startswith("attn_bias")]
    assert len(biases) == 8 and biases[0]["dims"] == [1, 4, 37, 37]


def test_emitted_beit_nonbase_grid_rescales_lut():
    # 96x128 -> grid (6, 8): exercises the export-time LUT bilinear rescale
    # (models/beit.py:compute_bias_stack) on the non-square axis
    from muggled_dpt_tpu.make_beit_dpt import make_beit_dpt

    m = make_beit_dpt(64, 4, 8, (8, 16, 32, 64), (6, 6), 16)
    _export_and_compare(m, (96, 128), emit=emit_beit_onnx)


def test_bf16_model_exports_f32_weights():
    m = make_depthanythingv2_dpt(64, 2, 4, (8, 16, 32, 64), (8, 8), 16, dtype=jnp.bfloat16)
    onnx_bytes = emit_depth_anything_onnx(m, (112, 112))
    graph = decode_message("ModelProto", onnx_bytes)["graph"]
    from muggled_dpt_tpu.onnx_export.proto import DT_FLOAT, DT_INT64

    for t in graph["initializer"]:
        assert t["data_type"] in (DT_FLOAT, DT_INT64), t["name"]
    # and the f32 graph matches the f32-mode JAX forward
    f32 = m.to(jnp.float32)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 112, 112)).astype(np.float32) * 0.5
    want = np.asarray(f32.forward(jnp.asarray(x)), np.float32)
    (got,) = evaluate_model(onnx_bytes, {"image": x}).values()
    absrel = np.abs(got - want).mean() / max(np.abs(want).mean(), 1e-9)
    assert absrel < 2e-5, absrel
