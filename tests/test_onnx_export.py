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
    emit_swinv2_onnx,
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


def _tiny_swinv2():
    from muggled_dpt_tpu.make_swinv2_dpt import make_swinv2_dpt

    return make_swinv2_dpt((16, 32, 64, 128), (2, 4, 4, 8), (2, 2, 2, 2), (16, 16), (4, 4), (None,) * 4, 16)


def test_emitted_swinv2_matches_jax_forward():
    """SwinV2: cyclic-shift rolls as Slice+Concat, baked 0/-100 shift masks,
    cosine attention (l2 normalize + logit_scale), per-block baked CPB bias,
    patch-merge strided slices, eps=1e-5 LayerNorms."""
    m = _tiny_swinv2()
    data = _export_and_compare(m, (64, 64), emit=emit_swinv2_onnx)
    graph = decode_message("ModelProto", data)["graph"]
    inits = graph["initializer"]
    # one baked CPB bias per block (4 stages x 2 blocks)
    cpbs = [t for t in inits if "_cpb" in t["name"]]
    assert len(cpbs) == 8
    # stage0 grid 16 / win 4 -> shift 2: b1 blocks carry baked shift masks
    masks = [t for t in inits if "_mask" in t["name"]]
    assert masks and all(t["dims"][1] == 1 for t in masks)  # (nW, 1, A, A)
    # post-norm Swin LNs declare torch's default eps, not the ViT 1e-6
    ln_eps = {
        a["f"]
        for n in graph["node"]
        if n["op_type"] == "LayerNormalization"
        for a in n.get("attribute", [])
        if a["name"] == "epsilon"
    }
    assert len(ln_eps) == 1 and next(iter(ln_eps)) == pytest.approx(1e-5)


def test_emitted_swinv2_nonsquare_window_replan():
    # 96x64 -> grid (24, 16): stage2 grid (6, 4) forces the nearest-divisor
    # window replan to a non-square (6, 4) window (models/swinv2.py:window_plan)
    _export_and_compare(_tiny_swinv2(), (96, 64), emit=emit_swinv2_onnx)


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


def test_codec_preserves_unknown_fields_through_roundtrip():
    """Fields outside the transcribed schema subset must survive a
    parse -> serialize round trip verbatim (the docstring's promise for
    foreign ONNX files, e.g. ModelProto.functions or training_info)."""
    from muggled_dpt_tpu.onnx_export.proto import decode_message, encode_message

    # ModelProto with a known field (ir_version=8, field 1 varint) plus two
    # foreign fields: a length-delimited field 20 and a varint field 99
    foreign = bytes([0x08, 0x08]) + bytes([0xA2, 0x01, 0x03]) + b"xyz" + bytes([0x98, 0x06, 0x2A])
    msg = decode_message("ModelProto", foreign)
    assert msg["ir_version"] == 8
    assert ("_unknown" in msg) and len(msg["_unknown"]) == 2

    reencoded = encode_message("ModelProto", msg)
    # same field set re-parses identically (order may differ; content may not)
    msg2 = decode_message("ModelProto", reencoded)
    assert msg2 == msg


def test_emitted_dav2_dynamic_axes():
    """Dynamic batch/height/width export (the analog of the reference's
    dynamic_axes, reference experiments/export_onnx.py:117-130): ONE artifact
    runs at multiple sizes and batch>1. The pos-embed bicubic resize, the
    token->grid reshapes, and the fusion/head upsamples all move in-graph."""
    m = make_depthanythingv2_dpt(64, 2, 4, (8, 16, 32, 64), (8, 8), 16)
    data = emit_depth_anything_onnx(m, dynamic=True)

    parsed = decode_message("ModelProto", data)
    dims = parsed["graph"]["input"][0]["type"]["tensor_type"]["shape"]["dim"]
    assert [d.get("dim_param", d.get("dim_value")) for d in dims] == ["batch", 3, "height", "width"]
    odims = parsed["graph"]["output"][0]["type"]["tensor_type"]["shape"]["dim"]
    assert all("dim_param" in d for d in odims)
    # no baked pos_embed initializer at the target grid; the base-grid one is in
    names = {t["name"] for t in parsed["graph"]["initializer"]}
    assert any(n.startswith("pos_embed_grid") for n in names)

    rng = np.random.default_rng(1)
    # (112,112): base grid (identity resize); (84,140): non-square in-graph
    # bicubic pos resize; (56,56) batch 2: dynamic batch
    for b, hw in ((1, (112, 112)), (1, (84, 140)), (2, (56, 56))):
        x = rng.standard_normal((b, 3, *hw)).astype(np.float32) * 0.5
        want = np.asarray(m.forward(jnp.asarray(x)), np.float32)
        (got,) = evaluate_model(data, {"image": x}).values()
        assert got.shape == want.shape, (b, hw, got.shape, want.shape)
        absrel = np.abs(got - want).mean() / max(np.abs(want).mean(), 1e-9)
        assert absrel < 2e-5, (b, hw, absrel)


def test_emitted_dav1_dynamic_axes():
    """DA-V1 (last-4-blocks taps) through the same dynamic emitter."""
    m = make_depthanythingv1_dpt(64, 2, 6, (8, 16, 32, 64), (8, 8), 16)
    data = emit_depth_anything_onnx(m, dynamic=True)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, 84, 112)).astype(np.float32) * 0.5
    want = np.asarray(m.forward(jnp.asarray(x)), np.float32)
    (got,) = evaluate_model(data, {"image": x}).values()
    absrel = np.abs(got - want).mean() / max(np.abs(want).mean(), 1e-9)
    assert absrel < 2e-5, absrel


def test_emitted_beit_dynamic_axes():
    """Dynamic batch/height/width BEiT export (the reference exports BEiT with
    dynamic_axes, reference experiments/export_onnx.py:117-130): ONE artifact
    runs at multiple grids and batch>1. The relpos LUT bilinear rescale, the
    (N-1, N-1) relative-index build and the per-block bias gather all move
    in-graph (emit_dpt.py:_beit_dynamic_bias_setup)."""
    from muggled_dpt_tpu.make_beit_dpt import make_beit_dpt

    m = make_beit_dpt(64, 4, 8, (8, 16, 32, 64), (6, 6), 16)
    data = emit_beit_onnx(m, dynamic=True)

    parsed = decode_message("ModelProto", data)
    dims = parsed["graph"]["input"][0]["type"]["tensor_type"]["shape"]["dim"]
    assert [d.get("dim_param", d.get("dim_value")) for d in dims] == ["batch", 3, "height", "width"]
    odims = parsed["graph"]["output"][0]["type"]["tensor_type"]["shape"]["dim"]
    assert all("dim_param" in d for d in odims)
    names = {t["name"] for t in parsed["graph"]["initializer"]}
    # the LUT rides along unbaked; no per-block baked (1, H, N, N) biases
    assert any(n.startswith("relpos_lut_grid") for n in names)
    assert not any(n.startswith("attn_bias") for n in names)

    rng = np.random.default_rng(3)
    # (96,96): base grid 6x6 (identity LUT resize); (96,128): non-square
    # in-graph LUT rescale + relative-index rebuild; (64,64) batch 2:
    # dynamic batch at a smaller grid
    for b, hw in ((1, (96, 96)), (1, (96, 128)), (2, (64, 64))):
        x = rng.standard_normal((b, 3, *hw)).astype(np.float32) * 0.5
        want = np.asarray(m.forward(jnp.asarray(x)), np.float32)
        (got,) = evaluate_model(data, {"image": x}).values()
        assert got.shape == want.shape, (b, hw, got.shape, want.shape)
        absrel = np.abs(got - want).mean() / max(np.abs(want).mean(), 1e-9)
        assert absrel < 2e-5, (b, hw, absrel)
