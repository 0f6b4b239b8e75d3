"""Opt-in int8 (w8a8) encoder matmuls — a TPU-native serving tier.

The v5e MXU runs s8 x s8 -> s32 at ~2x the bf16 rate (394 vs 197 TOPS), and
the encoder's big matmuls (qkv / proj / fc1 / fc2, or w12 / w3 for SwiGLU)
carry ~90% of the model FLOPs. This module implements the standard dynamic
per-token activation / static per-channel weight recipe:

* weights: symmetric int8 per OUTPUT channel, quantized once at load time
  (`quantize_weight`), stored in the params pytree as `<name>_kernel_q8` +
  `<name>_kernel_scale` — the stacked-layer `lax.scan` streams the int8
  weights at half the HBM traffic of bf16 as a bonus;
* activations: symmetric int8 per token (row), scales computed on the fly on
  the VPU (`linear_w8a8`), accumulation in int32 on the MXU, dequantized by
  the rank-1 outer product of the two scale vectors.

This is an accuracy/speed trade the user opts into per model
(`DPTModel.quantize_encoder_int8()`); the parity path (f32) and the default
serving path (bf16) are untouched. The reference has no quantized path —
this is TPU-native headroom, quantifed in docs/performance.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Encoder kernels worth quantizing: every (in, out) matmul in a transformer
# block. LayerScale/LN params are vectors; proj inside attention included.
QUANTIZABLE = ("qkv", "proj", "fc1", "fc2", "w12", "w3")


def quantize_weight(kernel) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8: kernel (..., in, out) -> (q8, scale)
    with scale shaped (..., 1, out) so dequant broadcasts over rows."""
    k = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def linear_w8a8(x, kernel_q8, kernel_scale, bias=None):
    """x (..., in) bf16/f32 -> (..., out) in x.dtype. Dynamic per-token
    activation quantization + s8 x s8 -> s32 MXU matmul + rank-1 dequant."""
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel_q8, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * x_scale * kernel_scale.reshape(kernel_scale.shape[-1])
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def linear_p(x, p, name: str):
    """Dispatching linear: uses the int8 path when `p` carries quantized
    weights for `name`, the dense kernel otherwise. The single integration
    point for the encoder blocks (ops/nn.py consumers)."""
    q8 = p.get(name + "_kernel_q8")
    if q8 is not None:
        return linear_w8a8(x, q8, p[name + "_kernel_scale"], p.get(name + "_bias"))
    from .nn import linear

    return linear(x, p[name + "_kernel"], p.get(name + "_bias"))


def quantize_block_params(stacked_blocks: dict, subset=QUANTIZABLE) -> dict:
    """Rewrite a stacked-layer block-params dict: each `subset` name's
    `<name>_kernel` (L, in, out) becomes `<name>_kernel_q8` (L, in, out) int8
    + `<name>_kernel_scale` (L, 1, out) f32. Other leaves pass through."""
    out = dict(stacked_blocks)
    for name in subset:
        key = name + "_kernel"
        if key in out:
            q, s = quantize_weight(out.pop(key))
            out[name + "_kernel_q8"] = q
            out[name + "_kernel_scale"] = s
    return out
