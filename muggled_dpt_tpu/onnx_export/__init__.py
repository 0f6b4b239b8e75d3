"""ONNX export of DPT models without an `onnx` dependency.

* proto.py    — protobuf wire codec for the ONNX schema subset
* builder.py  — GraphProto builder + numpy<->TensorProto helpers
* emit_dpt.py — Depth-Anything forward -> fixed-shape ONNX graph
* evaluate.py — numpy reference evaluator (CI correctness oracle)

User surface: experiments/export_onnx.py (CLI) or:

    from muggled_dpt_tpu.onnx_export import emit_depth_anything_onnx
    onnx_bytes = emit_depth_anything_onnx(model, model.compute_scaled_hw(img.shape[:2]))
"""

from .emit_dpt import emit_beit_onnx, emit_depth_anything_onnx, emit_swinv2_onnx
from .evaluate import evaluate_model
from .proto import decode_message, encode_message

__all__ = [
    "emit_beit_onnx",
    "emit_depth_anything_onnx",
    "emit_swinv2_onnx",
    "evaluate_model",
    "decode_message",
    "encode_message",
]
