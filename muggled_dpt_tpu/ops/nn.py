"""Core functional NN ops, TPU-first (NHWC layouts, MXU-friendly shapes).

Parameter conventions (differ deliberately from the torch reference — these
are layouts XLA likes, the checkpoint converter handles the transposition):

* linear kernels:   (in_features, out_features)       -> y = x @ W + b
* conv kernels:     (kh, kw, in_ch, out_ch)  (HWIO)   -> NHWC conv
* conv-transpose:   (kh, kw, in_ch, out_ch)
* layernorm / scale params: (features,)

Reference behaviors reimplemented here (cited for parity checking):
* LayerNorm eps=1e-6: muggled_dpt/v2_depthanything/components/misc_helpers.py:190
* MLP (Linear-GELU-Linear): misc_helpers.py:88-120
* SwiGLU fused double inner linear: misc_helpers.py:157-185
* Attention & SDPA path: v2_depthanything/components/transformer_block.py:74-171
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

F32 = jnp.float32


# ---------------------------------------------------------------------------
# Elementwise / token ops
# ---------------------------------------------------------------------------


def layer_norm(x, scale, bias, eps=1e-6):
    """LayerNorm over the last axis; statistics in f32 regardless of input dtype."""
    xf = x.astype(F32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * scale.astype(F32) + bias.astype(F32)).astype(x.dtype)


def linear(x, kernel, bias=None):
    y = x @ kernel.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def gelu(x):
    """GELU matching torch nn.GELU (exact/erf) at the working precision.

    In float32 this is the exact erf form. In bfloat16 the tanh form is used:
    its max deviation from exact GELU (~3e-3, near |x|≈2) is several times
    SMALLER than bf16 rounding at those magnitudes (ulp ≈ 1.6e-2 at x=2), so
    the results are indistinguishable at storage precision — while XLA's erf
    costs ~14x more VPU time than tanh on v5e (92.6 vs 6.4 us at the ViT-L MLP
    hidden shape; tools/attn_variants.py round-2 profiling). Parity tests run
    f32 and see the exact form; reference: v2_depthanything misc_helpers.py:88-120.
    """
    exact = x.dtype != jnp.bfloat16
    return jax.nn.gelu(x, approximate=not exact)


def mlp_gelu(x, p):
    """Linear -> GELU -> Linear. Routed through the quant dispatcher so the
    opt-in int8 serving tier (ops/quant.py) applies when `p` carries
    quantized kernels; dense params take the plain matmul path."""
    from .quant import linear_p

    h = gelu(linear_p(x, p, "fc1"))
    return linear_p(h, p, "fc2")


def mlp_swiglu(x, p):
    """SwiGLU-FFN: Linear(silu(W_a x) * (W_b x)); W_a/W_b fused in w12."""
    from .quant import linear_p

    h = linear_p(x, p, "w12")
    a, b = jnp.split(h, 2, axis=-1)
    return linear_p(jax.nn.silu(a) * b, p, "w3")


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def sdpa(q, k, v, bias=None, scale=None, impl="xla"):
    """Scaled dot-product attention over (B, N, H, D) tensors.

    impl: 'xla'    -> jax.nn.dot_product_attention (XLA fuses on TPU)
          'pallas' -> custom flash kernel (ops/pallas), falls back to xla off-TPU
          'naive'  -> explicit softmax (used by introspection mode, mirrors the
                      reference's hookable nn.Softmax path, transformer_block.py:100)
    bias may arrive pre-padded to the flash kernel's 128-lane tiles (BEiT's
    cached stack); the non-kernel paths slice it back to (.., N, N).
    Returns (B, N, H, D); with impl='naive' also returns the (B, H, N, N) weights.
    """
    n = q.shape[1]
    if impl == "pallas":
        from .pallas.flash_attention import flash_attention_available, flash_attention

        # Hybrid dispatch: the flash kernel avoids the N x N logit HBM
        # round-trip (measured on v5e: 1.10 vs 1.41 ms at N=1297, 9.7 vs ~28 ms
        # at N=10404, per 16-head call); XLA keeps very short sequences where
        # kernel launch padding would dominate.
        if flash_attention_available() and q.shape[1] >= 512:
            return flash_attention(q, k, v, bias=bias, scale=scale)
        impl = "xla"
    if bias is not None and bias.shape[-1] > n:
        bias = bias[..., :n, :n]
    if impl == "xla":
        return jax.nn.dot_product_attention(q, k, v, bias=bias, scale=scale)

    # naive: explicit weights for analysis hooks
    d = q.shape[-1]
    s = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * s, k, preferred_element_type=F32)
    if bias is not None:
        logits = logits + bias.astype(F32)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", weights.astype(q.dtype), v)
    return out, weights


def self_attention(tokens, p, num_heads, bias=None, impl="xla", capture=False):
    """Fused-QKV multi-head self-attention (reference transformer_block.py:74-171).

    tokens: (B, N, C). p: qkv_kernel (C, 3C) with columns in HEAD-MAJOR
    [head][q|k|v][dim] order (checkpoints/convert_common.py:qkv_head_major),
    qkv_bias (3C,), proj_kernel (C, C), proj_bias (C,). The head-major order
    lets the pallas kernel consume the qkv matmul output directly — one dense
    per-head slab, no transposes.

    bias may also be a ``(stack, layer)`` tuple — a full (L, H, Np, Np)
    per-layer bias stack plus an i32 layer index (BEiT's scanned cached
    relpos stack). The flash kernel then reads its bias blocks directly from
    the stack via a scalar-prefetch index (no per-layer slice copy); fallback
    paths materialize the layer's slice.
    """
    from .quant import linear_p

    b, n, c = tokens.shape
    d = c // num_heads
    qkv = linear_p(tokens, p, "qkv")  # (B, N, [h][3][d])

    bias_stack = layer = None
    if isinstance(bias, tuple):
        bias_stack, layer = bias
        bias = None

    if impl == "pallas" and not capture:
        from .pallas.flash_attention import (
            flash_attention_available,
            flash_attention_fused_qkv,
            fused_qkv_supported,
        )

        biased = bias is not None or bias_stack is not None
        if flash_attention_available() and n >= 512 and fused_qkv_supported(n, num_heads, d, biased=biased):
            out = flash_attention_fused_qkv(qkv, num_heads, bias=bias, bias_stack=bias_stack, layer=layer)
            return linear_p(out, p, "proj")

    if bias_stack is not None:  # non-kernel fallback: materialize the layer slice
        bias = lax.dynamic_index_in_dim(bias_stack, layer, axis=0, keepdims=False)[None]

    qkv = qkv.reshape(b, n, num_heads, 3, d)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]  # (B, N, H, D)
    if capture:
        out, weights = sdpa(q, k, v, bias=bias, impl="naive")
    else:
        out = sdpa(q, k, v, bias=bias, impl=impl)
        weights = None
    out = out.reshape(b, n, c)
    out = linear_p(out, p, "proj")
    return (out, weights) if capture else out


# ---------------------------------------------------------------------------
# Convolutions (NHWC)
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x, kernel, bias=None, stride=1, padding="SAME"):
    strides = (stride, stride) if isinstance(stride, int) else stride
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=strides, padding=padding, dimension_numbers=_DN
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


# Spatial size above which conv3x3_shiftsum falls back to the direct conv:
# the shiftsum form materializes a 9x-wider tap tensor, whose HBM traffic
# grows with h*w while the MXU-lane argument for it is size-independent —
# at some resolution the 9x write/read swamps the lane win. None = always
# shiftsum (the measured 504² win) pending the honest XL profile
# (tools/profile_head.py with the whole-output fold; the round-4g "DIRECT
# ~0 ms" rows were an XLA conv-slicing artifact of the single-pixel fold).
SHIFTSUM_MAX_HW: int | None = None


def conv3x3_shiftsum(x, kernel, bias=None):
    """3x3 stride-1 SAME conv for LOW output-channel counts, reformulated as
    one wide matmul + 9 shifted adds.

    A direct conv with co < 128 wastes MXU lanes (co=32 measured 25 TFLOPs on
    v5e). Folding the 9 taps into the matmul's output dimension (ci -> 9*co)
    restores lane utilization; the tap outputs are then realigned with static
    shifted slices that XLA fuses into a single accumulation loop
    (36 TFLOPs measured, ~1.45x faster at the DPT head's 128->32 @504^2 conv).
    Exact same math as conv_general_dilated modulo f32 summation order.
    Above SHIFTSUM_MAX_HW spatial rows/cols the 9x tap-tensor HBM traffic
    dominates and the direct conv takes over. kernel: (3, 3, ci, co)."""
    b, h, w, ci = x.shape
    if SHIFTSUM_MAX_HW is not None and max(h, w) > SHIFTSUM_MAX_HW:
        return conv2d(x, kernel, bias, padding=1)
    co = kernel.shape[-1]
    w9 = kernel.astype(x.dtype).transpose(2, 0, 1, 3).reshape(ci, 9 * co)
    y9 = (x.reshape(b, h * w, ci) @ w9).reshape(b, h, w, 9, co)
    return shiftsum_taps_add(y9, bias)


def shiftsum_taps_add(y9, bias=None):
    """Realign + accumulate the 9 per-tap conv outputs of the shiftsum
    decomposition (shared by the dense conv3x3_shiftsum above and the int8
    ops/quant.py:conv3x3_shiftsum_w8a8). y9: (b, h, w, 9, co), tap index in
    row-major (dy, dx) order over the 3x3 stencil."""
    b, h, w, _, co = y9.shape
    y9 = jnp.pad(y9, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    out = None
    for tap in range(9):
        dy, dx = divmod(tap, 3)
        sl = lax.slice(y9, (0, dy, dx, tap, 0), (b, dy + h, dx + w, tap + 1, co))
        out = sl if out is None else out + sl
    out = out[:, :, :, 0, :]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_transpose_blocky(x, kernel, bias=None):
    """ConvTranspose2d with stride == kernel_size (reference reassembly
    upsamplers, v2_depthanything/reassembly_model.py:262-270).

    Because stride == kernel there is no tap overlap: each input pixel expands
    into an independent (k x k) output block. That makes the op an exact
    matmul + reshape — far friendlier to the MXU than a transposed conv.
    kernel: (kh, kw, in_ch, out_ch).
    """
    b, h, w, ci = x.shape
    kh, kw, _, co = kernel.shape
    y = jnp.einsum("bhwi,klio->bhkwlo", x, kernel.astype(x.dtype))
    y = y.reshape(b, h * kh, w * kw, co)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _phase_support(s: int, u: int):
    """Input-cell offsets: phase rows a whose 3-tap fuse window touches input
    cell offset u. For upsample factor s, output row p = s*i + a reads
    upsampled rows p-1..p+1, i.e. input cells (a+dp)//s for dp in -1..1."""
    return [a for a in range(s) if any((a + dp) // s == u for dp in (-1, 0, 1))]


def fuse_transpose_conv3x3_weights(resample_kernel, resample_bias, fuse_kernel):
    """Precompute phase-decomposed weights for the reassembly pair
    `conv_transpose_blocky(k=s)` -> `3x3 SAME conv (no bias)`
    (reference reassembly_model.py:244-270 then :135).

    The composite is exact: output pixel (s*i+a, s*j+b) of the fuse conv only
    sees upsampled pixels from input cells (i+u, j+v) with u,v in {-1,0,1}
    (and at most 2 distinct u per phase a), so the pair collapses to one
    small-support conv per output phase. That cuts the x4 stage's FLOPs ~5.8x
    (the 3x3 conv no longer runs at 4x spatial resolution) — the reason the
    reassembly was the ViT-Giant's second-largest component.

    Returns a dict: 't{u+1}{v+1}' -> (ci, P_uv*co) matmul weights (phases in
    a-major order per `_phase_support`), plus 'tap_bias' (3,3,co) carrying the
    resample bias pushed through the fuse taps (border-exact via a mask conv).

    Contracted host-side in numpy f32 (one-time at model build): eager jnp
    here would dispatch hundreds of small device ops, which is pathologically
    slow over a relayed-TPU link, and the s^2*9 distinct (kt @ fk) products
    are a few seconds of BLAS even at ViT-Giant width.
    """
    import numpy as np

    kt = np.asarray(resample_kernel, np.float32)
    rb = np.asarray(resample_bias, np.float32)
    fk = np.asarray(fuse_kernel, np.float32)
    s, _, ci, cr = kt.shape
    co = fk.shape[-1]
    # memoized distinct products P[a', b', dp, dq] = kt[a',b'] @ fk[dp,dq]
    # (phases share products; at most s^2 * 9 matmuls total)
    prod = {}
    fused = {}
    for u in (-1, 0, 1):
        rows = _phase_support(s, u)
        for v in (-1, 0, 1):
            cols = _phase_support(s, v)
            if not rows or not cols:
                continue
            es = []
            for a in rows:
                for b in cols:
                    e = None
                    for dp in (-1, 0, 1):
                        if (a + dp) // s != u:
                            continue
                        for dq in (-1, 0, 1):
                            if (b + dq) // s != v:
                                continue
                            key = ((a + dp) % s, (b + dq) % s, dp, dq)
                            if prod.get(key) is None:
                                prod[key] = kt[key[0], key[1]] @ fk[dp + 1, dq + 1]
                            e = prod[key] if e is None else e + prod[key]
                    es.append(e)  # (ci, co)
            fused[f"t{u + 1}{v + 1}"] = np.stack(es, axis=1).reshape(ci, len(es) * co)
    fused["tap_bias"] = np.einsum("r,pqro->pqo", rb, fk)
    return fused


def conv_transpose_fuse_phase(x, fused, s: int):
    """Apply the phase-decomposed fused resample+fuse weights (see
    `fuse_transpose_conv3x3_weights`). x: (B, h, w, ci) -> (B, s*h, s*w, co).
    Bit-equivalent to the dense pair modulo summation reassociation; used on
    the bf16 serving path only (f32 parity mode keeps the dense ops)."""
    b, h, w, ci = x.shape
    co = fused["tap_bias"].shape[-1]
    dt = x.dtype
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # int8 tier (ops/quant.quantize_reassembly_params): the taps are stored
    # as q8+scale. The activation is quantized ONCE on the padded map (the
    # per-token scales shift with the tap slices), not per tap.
    int8_taps = any(k.endswith("_q8") for k in fused)
    if int8_taps:
        pf = padded.astype(jnp.float32)
        p_scale = jnp.maximum(jnp.max(jnp.abs(pf), axis=-1, keepdims=True), 1e-12) / 127.0
        p_q8 = jnp.clip(jnp.round(pf / p_scale), -127, 127).astype(jnp.int8)
    contrib = {}
    for u in (-1, 0, 1):
        rows = _phase_support(s, u)
        for v in (-1, 0, 1):
            cols = _phase_support(s, v)
            key = f"t{u + 1}{v + 1}"
            if key not in fused and key + "_q8" not in fused:
                continue
            if int8_taps:
                xq = lax.slice(p_q8, (0, 1 + u, 1 + v, 0), (b, 1 + u + h, 1 + v + w, ci)).reshape(b, h * w, ci)
                xsc = lax.slice(p_scale, (0, 1 + u, 1 + v, 0), (b, 1 + u + h, 1 + v + w, 1)).reshape(b, h * w, 1)
                acc = lax.dot_general(xq, fused[key + "_q8"], (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32)
                y = (acc.astype(jnp.float32) * xsc * fused[key + "_scale"].reshape(1, 1, -1)).astype(dt)
                y = y.reshape(b, h, w, len(rows) * len(cols), co)
            else:
                xs = lax.slice(padded, (0, 1 + u, 1 + v, 0), (b, 1 + u + h, 1 + v + w, ci))
                y = (xs.reshape(b, h * w, ci) @ fused[key].astype(dt)).reshape(b, h, w, len(rows) * len(cols), co)
            for i, a in enumerate(rows):
                for j, bb in enumerate(cols):
                    t = y[:, :, :, i * len(cols) + j, :]
                    prev = contrib.get((a, bb))
                    contrib[(a, bb)] = t if prev is None else prev + t
    out = jnp.stack([contrib[(a, bb)] for a in range(s) for bb in range(s)], axis=3)
    out = out.reshape(b, h, w, s, s, co).transpose(0, 1, 3, 2, 4, 5).reshape(b, s * h, s * w, co)
    # resample-bias contribution through the fuse taps: constant in the
    # interior, truncated at borders exactly like the dense pair's zero pad
    ones = jnp.ones((1, s * h, s * w, 1), dt)
    bias_map = conv2d(ones, fused["tap_bias"][:, :, None, :], padding=1)
    return out + bias_map


def patchify_embed(image_nhwc, kernel, bias=None):
    """Patch embedding: stride==kernel conv expressed as space-to-depth matmul
    (reference v2_depthanything/patch_embed.py:56-62,92-98).

    kernel: (P, P, 3, F). Returns (tokens (B, gh*gw, F), (gh, gw)).
    """
    b, h, w, c = image_nhwc.shape
    p = kernel.shape[0]
    f = kernel.shape[-1]
    gh, gw = h // p, w // p
    x = image_nhwc.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
    wmat = kernel.reshape(p * p * c, f).astype(x.dtype)
    tokens = x @ wmat
    if bias is not None:
        tokens = tokens + bias.astype(tokens.dtype)
    return tokens, (gh, gw)
