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

import contextlib

import numpy as np
import jax
import jax.numpy as jnp

# Encoder kernels worth quantizing: every (in, out) matmul in a transformer
# block. LayerScale/LN params are vectors; proj inside attention included.
QUANTIZABLE = ("qkv", "proj", "fc1", "fc2", "w12", "w3")


def is_scale_key(key: str) -> bool:
    """True for pytree leaf names that must NOT follow the model's compute
    dtype: int8 dequant scales and SmoothQuant activation factors stay f32
    (bf16-rounding them adds ~0.3%/channel error on top of the int8 error,
    and the act_smooth inverse must exactly cancel the factor folded into
    the weights). Lives here — beside every call that creates these keys
    (quantize_weight / quantize_conv3x3_weight siblings, compute_smoothing
    act_smooth) — so a new quantized op updates predicate and keys together;
    DPTModel._cast_dtype consumes it. NOT a bare '_scale' suffix match:
    norm*_scale / logit_scale are ordinary params that follow the compute
    dtype. The t??_scale form is the fused reassembly tap scales
    (quantize_reassembly_params: t00_scale .. t22_scale)."""
    return (
        key.endswith(("_kernel_scale", "_kernel9_scale", "_act_smooth"))
        or key == "kernel_scale"
        or (len(key) == 9 and key[0] == "t" and key[1:3].isdigit() and key.endswith("_scale"))
    )

# Active activation-stats collector (calibration runs only; None in serving).
_COLLECTOR: dict | None = None


@contextlib.contextmanager
def collect_activation_stats():
    """Record per-channel |activation| maxima at every quantizable matmul
    input during EAGER forwards (the capture/introspection path runs blocks in
    Python loops, so `linear_p` sees concrete arrays). Yields a dict
    {name: [amax_per_channel_layer0, amax_layer1, ...]} accumulated across
    all forwards run inside the context — the calibration side of the
    SmoothQuant-style int8 tier (`compute_smoothing`)."""
    global _COLLECTOR
    stats: dict[str, list] = {}
    _COLLECTOR = {"stats": stats, "cursor": {}}
    try:
        yield stats
    finally:
        _COLLECTOR = None


def _record_activation(name: str, x) -> None:
    if _COLLECTOR is None or isinstance(x, jax.core.Tracer):
        return
    amax = np.asarray(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=tuple(range(x.ndim - 1))))
    per_name = _COLLECTOR["stats"].setdefault(name, [])
    cursor = _COLLECTOR["cursor"]
    i = cursor.get(name, 0)
    if i < len(per_name):
        per_name[i] = np.maximum(per_name[i], amax)  # max over calibration frames
    else:
        per_name.append(amax)
    cursor[name] = i + 1


def reset_collection_pass() -> None:
    """Mark the start of a new calibration frame (layer cursor rewinds so
    occurrence i keeps meaning 'layer i')."""
    if _COLLECTOR is not None:
        _COLLECTOR["cursor"] = {}


def quantize_weight(kernel) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8: kernel (..., in, out) -> (q8, scale)
    with scale shaped (..., 1, out) so dequant broadcasts over rows."""
    k = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def linear_w8a8(x, kernel_q8, kernel_scale, bias=None, act_smooth=None):
    """x (..., in) bf16/f32 -> (..., out) in x.dtype. Dynamic per-token
    activation quantization + s8 x s8 -> s32 MXU matmul + rank-1 dequant.

    act_smooth: optional per-input-channel inverse smoothing vector (in,)
    from `compute_smoothing` — x is divided channel-wise before the
    per-token quantization (the matching multiply is folded into the stored
    int8 weights), flattening outlier channels so the shared per-token scale
    stops crushing the resolution of the other channels (SmoothQuant,
    arXiv:2211.10438)."""
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if act_smooth is not None:
        xf = xf * act_smooth.astype(jnp.float32)
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
    point for the encoder blocks (ops/nn.py consumers). Also the calibration
    tap: under `collect_activation_stats` (eager capture forwards) the
    per-channel input magnitudes are recorded here."""
    _record_activation(name, x)
    q8 = p.get(name + "_kernel_q8")
    if q8 is not None:
        return linear_w8a8(
            x, q8, p[name + "_kernel_scale"], p.get(name + "_bias"), act_smooth=p.get(name + "_act_smooth")
        )
    from .nn import linear

    return linear(x, p[name + "_kernel"], p.get(name + "_bias"))


def quantize_block_params(stacked_blocks: dict, subset=QUANTIZABLE, smoothing: dict | None = None) -> dict:
    """Rewrite a stacked-layer block-params dict: each `subset` name's
    `<name>_kernel` (L, in, out) becomes `<name>_kernel_q8` (L, in, out) int8
    + `<name>_kernel_scale` (L, 1, out) f32. Other leaves pass through.

    smoothing: optional {name: s (L, in)} SmoothQuant factors from
    `compute_smoothing`: the kernel rows are scaled by s before weight
    quantization and the inverse is stored as `<name>_act_smooth` for the
    runtime channel-wise activation divide (mathematically x@w == (x/s)@(w*s))."""
    out = dict(stacked_blocks)
    for name in subset:
        key = name + "_kernel"
        if key in out:
            kernel = out.pop(key)
            if smoothing is not None and name in smoothing:
                s = jnp.asarray(smoothing[name], jnp.float32)  # (L, in)
                kernel = jnp.asarray(kernel, jnp.float32) * s[:, :, None]
                out[name + "_act_smooth"] = 1.0 / s
            q, sc = quantize_weight(kernel)
            out[name + "_kernel_q8"] = q
            out[name + "_kernel_scale"] = sc
    return out


def quantize_conv3x3_weight(kernel):
    """3x3 conv kernel (3, 3, ci, co) -> int8 shiftsum-matmul form:
    (ci, 9co) q8 + (1, 9co) scale. The shiftsum decomposition
    (ops/nn.py:conv3x3_shiftsum) turns the conv into a per-pixel matmul, so
    the exact per-token activation recipe applies — each output pixel's 9 tap
    contributions are dequantized with their own pixels' scales BEFORE the
    shifted adds (a direct int8 conv would need one shared scale across all
    9 taps). FLOP-neutral vs the conv; the s8 MXU rate is the win."""
    k = jnp.asarray(kernel, jnp.float32)
    ci, co = k.shape[2], k.shape[3]
    w9 = k.transpose(2, 0, 1, 3).reshape(ci, 9 * co)
    return quantize_weight(w9)


def conv3x3_shiftsum_w8a8(x, w9_q8, w9_scale, bias=None):
    """int8 3x3 SAME conv in shiftsum form (see quantize_conv3x3_weight):
    per-token-quantized x @ (ci, 9co) s8 matmul -> f32 dequant -> the same
    9 shifted adds as ops/nn.py:conv3x3_shiftsum."""
    from .nn import shiftsum_taps_add

    b, h, w, ci = x.shape
    co = w9_q8.shape[-1] // 9
    y9 = linear_w8a8(x.reshape(b, h * w, ci), w9_q8, w9_scale).reshape(b, h, w, 9, co)
    return shiftsum_taps_add(y9, bias)


def quantize_reassembly_params(stages):
    """int8 tier for the reassembly neck (`DPTModel.quantize_encoder_int8`
    with include_neck=True): the per-stage 1x1 projection and — when
    the bf16 fused resample+fuse precompute is present — its phase-decomposed
    tap matrices are plain GEMMs, quantized with the same per-output-channel
    recipe as the encoder (the ViT-Giant's all-1536 reassembly is the main
    beneficiary; docs/performance.md). Conv-shaped fusion/head ops stay dense
    (XLA convs — no GEMM layout to quantize into)."""
    new_stages = []
    for p in stages:
        p = dict(p)
        if "proj_kernel" in p:
            q, sc = quantize_weight(p.pop("proj_kernel"))
            p["proj_kernel_q8"], p["proj_kernel_scale"] = q, sc
        if "readout" in p and "kernel" in p["readout"]:  # BEiT 2F->F project
            ro = dict(p["readout"])
            q, sc = quantize_weight(ro.pop("kernel"))
            ro["kernel_q8"], ro["kernel_scale"] = q, sc
            p["readout"] = ro
        fused = p.get("fused")
        if fused is not None:
            fused = dict(fused)
            for key in [k for k in fused if len(k) == 3 and k.startswith("t")]:
                q, sc = quantize_weight(fused.pop(key))
                fused[key + "_q8"], fused[key + "_scale"] = q, sc
            p["fused"] = fused
        new_stages.append(p)
    return new_stages


def _quantize_conv3x3_entry(p: dict, name: str) -> None:
    """Replace p[f'{name}_kernel'] with shiftsum q8 + scale (in place)."""
    key = name + "_kernel"
    if key in p:
        q, sc = quantize_conv3x3_weight(p.pop(key))
        p[name + "_kernel9_q8"], p[name + "_kernel9_scale"] = q, sc


def quantize_fusion_params(blocks):
    """int8 tier for the fusion blocks: the residual-conv-unit 3x3 convs go
    to shiftsum-GEMM form, the 1x1 out projections to linear q8. Structure
    per models/dpt_neck.py:fusion_forward (res1/res2 units + out_kernel)."""
    new_blocks = []
    for blk in blocks:
        blk = {k: (dict(v) if isinstance(v, dict) else v) for k, v in blk.items()}
        for unit in ("res1", "res2"):
            if unit in blk:
                _quantize_conv3x3_entry(blk[unit], "conv1")
                _quantize_conv3x3_entry(blk[unit], "conv2")
        if "out_kernel" in blk:
            q, sc = quantize_weight(blk.pop("out_kernel"))
            blk["out_kernel_q8"], blk["out_kernel_scale"] = q, sc
        new_blocks.append(blk)
    return new_blocks


def quantize_head_params(head: dict) -> dict:
    """int8 tier for the depth head: conv_in and conv_mid 3x3s go to
    shiftsum-GEMM form. The final 1x1 projection stays dense — it feeds the
    output activation directly and costs ~nothing (32 -> 1 channels)."""
    head = dict(head)
    _quantize_conv3x3_entry(head, "conv_in")
    _quantize_conv3x3_entry(head, "conv_mid")
    return head


def quantize_neck_params(params: dict) -> dict:
    """Full-neck int8 (DPTModel.quantize_encoder_int8 include_neck=True):
    reassembly GEMMs + fusion convs + head convs. Returns a new params dict;
    sections a family lacks (e.g. SwinV2's conv-only reassembly) pass
    through untouched."""
    params = dict(params)
    if params.get("reassemble"):
        params["reassemble"] = quantize_reassembly_params(params["reassemble"])
    if params.get("fusion"):
        params["fusion"] = quantize_fusion_params(params["fusion"])
    if params.get("head"):
        params["head"] = quantize_head_params(params["head"])
    return params


def compute_smoothing(stacked_blocks: dict, act_stats: dict, subset=QUANTIZABLE, alpha: float = 0.5) -> dict:
    """SmoothQuant migration factors s_c = act_amax^alpha / weight_amax^(1-alpha)
    per layer and input channel (arXiv:2211.10438 eq. 4), from per-channel
    activation maxima collected by `collect_activation_stats` over a few
    calibration frames. Returns {name: (L, in) float array}."""
    smoothing = {}
    for name in subset:
        key = name + "_kernel"
        if key not in stacked_blocks or name not in act_stats:
            continue
        w = np.asarray(stacked_blocks[key], np.float32)  # (L, in, out)
        w_amax = np.maximum(np.abs(w).max(axis=-1), 1e-8)  # (L, in)
        a_amax = np.maximum(np.stack(act_stats[name], axis=0), 1e-8)  # (L, in)
        assert a_amax.shape == w_amax.shape, (name, a_amax.shape, w_amax.shape)
        s = (a_amax ** alpha) / (w_amax ** (1.0 - alpha))
        # normalize so the median channel is untouched, then bound the
        # migration so neither side's range explodes
        s = s / np.median(s, axis=-1, keepdims=True)
        smoothing[name] = np.clip(s, 1e-2, 1e2).astype(np.float32)
    return smoothing
