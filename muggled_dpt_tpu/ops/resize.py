"""Torch-parity image resampling, built TPU-first.

The PyTorch reference (heyoeyo/muggled_dpt) relies on four distinct
``torch.nn.functional.interpolate`` configurations:

* bilinear, align_corners=False, antialias=True  — image preprocessing
  (reference: muggled_dpt/v2_depthanything/patch_embed.py:136-142)
* bicubic,  align_corners=False, antialias=False — position-embedding resize
  (reference: muggled_dpt/v2_depthanything/components/position_encoder.py:137-139)
* bilinear, align_corners=True                    — fusion / head upsampling
  (reference: muggled_dpt/v2_depthanything/components/misc_helpers.py:39-42)
* bilinear, align_corners=False, antialias=False  — BEiT relpos LUT scaling and
  demo postprocessing (reference: v31_beit/components/relative_positional_encoder.py:289-295)

``jax.image.resize`` implements none of these exactly (different cubic kernel,
no align_corners). Instead of a gather-based port, each 1-D resampling pass is
expressed as a dense (out, in) weight matrix computed **on the host at trace
time** with exact torch semantics, then applied as two matmuls (one per axis).
On TPU this runs on the MXU — resampling becomes a pair of large matrix
multiplies instead of a bandwidth-bound gather, and the weights fold into the
jitted executable for each static shape (the XLA analog of the reference's
GridCache, position_encoder.py:152).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = ["resize_2d", "resize_matrix", "resize_output_size"]


# ---------------------------------------------------------------------------
# Host-side (numpy) weight-matrix construction with exact torch semantics
# ---------------------------------------------------------------------------


def _cubic_kernel(t: np.ndarray, a: float) -> np.ndarray:
    """Cubic convolution kernel (Keys). torch uses A=-0.75 for non-antialiased
    bicubic and A=-0.5 for the antialiased variant."""
    t = np.abs(t)
    out = np.zeros_like(t)
    m1 = t <= 1.0
    m2 = (t > 1.0) & (t < 2.0)
    out[m1] = ((a + 2.0) * t[m1] - (a + 3.0)) * t[m1] * t[m1] + 1.0
    out[m2] = (((t[m2] - 5.0) * t[m2] + 8.0) * t[m2] - 4.0) * a
    return out


def _triangle_kernel(t: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(t))


@functools.lru_cache(maxsize=512)
def _resize_matrix_np(
    in_size: int,
    out_size: int,
    mode: str,
    align_corners: bool,
    antialias: bool,
) -> np.ndarray:
    """Dense (out_size, in_size) float32 row-stochastic resampling matrix that
    reproduces torch.nn.functional.interpolate bit-for-bit (up to f32 rounding)."""
    if in_size == out_size and not antialias:
        return np.eye(out_size, dtype=np.float32)

    w = np.zeros((out_size, in_size), dtype=np.float64)
    # torch computes source coordinates in float32 (area_pixel_compute_source_index
    # with scalar_t=float for f32 inputs) — emulate its rounding for bit-parity.
    dst = np.arange(out_size, dtype=np.float32)

    if align_corners:
        scale = np.float32(in_size - 1) / np.float32(out_size - 1) if out_size > 1 else np.float32(0.0)
        src = dst * scale
    else:
        scale = np.float32(in_size) / np.float32(out_size)
        src = scale * (dst + np.float32(0.5)) - np.float32(0.5)

    if antialias:
        # torch's `_compute_weights_aa` (aten/native/UpSample.h): pillow-style
        # normalized filtering; only defined for align_corners=False.
        assert not align_corners, "torch antialias requires align_corners=False"
        interp_size = 2 if mode == "linear" else 4
        kernel = _triangle_kernel if mode == "linear" else functools.partial(_cubic_kernel, a=-0.5)
        support = (interp_size * 0.5) * scale if scale >= 1.0 else interp_size * 0.5
        invscale = 1.0 / scale if scale >= 1.0 else 1.0
        center = scale * (dst + 0.5)
        xmin = np.maximum((center - support + 0.5).astype(np.int64), 0)
        xmax = np.minimum((center + support + 0.5).astype(np.int64), in_size)
        for d in range(out_size):
            idx = np.arange(xmin[d], xmax[d])
            wk = kernel((idx - center[d] + 0.5) * invscale)
            total = wk.sum()
            if total > 0:
                wk = wk / total
            w[d, idx] = wk
        return w.astype(np.float32)

    if mode == "linear":
        # torch clamps the source coordinate at 0 for linear modes
        # (area_pixel_compute_source_index with cubic=False).
        if not align_corners:
            src = np.maximum(src, 0.0)
        i0 = np.floor(src).astype(np.int64)
        i0 = np.clip(i0, 0, in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        frac = src - i0
        for d in range(out_size):
            w[d, i0[d]] += 1.0 - frac[d]
            w[d, i1[d]] += frac[d]
        return w.astype(np.float32)

    if mode == "cubic":
        # torch does NOT clamp src for bicubic; border taps are index-clamped
        # (upsample_get_value_bounded), which accumulates weight on the edges.
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for d in range(out_size):
            coeffs = _cubic_kernel(np.array([1.0 + frac[d], frac[d], 1.0 - frac[d], 2.0 - frac[d]]), a=-0.75)
            for k in range(4):
                idx = int(np.clip(i0[d] - 1 + k, 0, in_size - 1))
                w[d, idx] += coeffs[k]
        return w.astype(np.float32)

    raise ValueError(f"Unknown resize mode: {mode}")


def resize_matrix(in_size, out_size, mode="linear", align_corners=False, antialias=False):
    """Public accessor for the (out,in) resampling matrix (numpy float32)."""
    return _resize_matrix_np(int(in_size), int(out_size), mode, bool(align_corners), bool(antialias))


@functools.lru_cache(maxsize=512)
def _linear_taps_np(in_size: int, out_size: int, align_corners: bool):
    """Sparse 2-tap form of the non-antialiased linear resize: returns
    (i0, i1, w0, w1) arrays of length out_size with exact torch semantics.
    A dense matrix wastes in_size/2 x the FLOPs on what is a 2-tap gather."""
    dst = np.arange(out_size, dtype=np.float32)
    if align_corners:
        scale = np.float32(in_size - 1) / np.float32(out_size - 1) if out_size > 1 else np.float32(0.0)
        src = dst * scale
    else:
        scale = np.float32(in_size) / np.float32(out_size)
        src = np.maximum(scale * (dst + np.float32(0.5)) - np.float32(0.5), 0.0)
    i0 = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    w0 = np.float32(1.0) - w1
    return i0, i1, w0, w1


def resize_output_size(in_hw, scale_factor: float) -> tuple[int, int]:
    """torch's output-size rule for interpolate(scale_factor=s): floor(in * s)."""
    return (int(np.floor(in_hw[0] * scale_factor)), int(np.floor(in_hw[1] * scale_factor)))


@functools.lru_cache(maxsize=512)
def _banded_blocks_np(in_size: int, out_size: int, align_corners: bool, block: int = 128):
    """Block-banded decomposition of the dense 2-tap linear matrix: for each
    ``block``-row output slab, the input window its taps touch plus the dense
    (block, window) weight slice. Same row-stochastic weights as the dense
    path — only the all-zero columns outside each slab's window are dropped,
    so results are numerically identical (the MXU accumulates zeros for free;
    it's the HBM reads and MAC slots that aren't free at large sizes)."""
    w = _resize_matrix_np(in_size, out_size, "linear", align_corners, False)
    blocks = []
    for o0 in range(0, out_size, block):
        o1 = min(o0 + block, out_size)
        rows = w[o0:o1]
        nz = np.nonzero(rows.any(axis=0))[0]
        lo, hi = int(nz[0]), int(nz[-1]) + 1
        blocks.append((lo, hi, rows[:, lo:hi]))
    return tuple(blocks)


# ---------------------------------------------------------------------------
# Device-side application
# ---------------------------------------------------------------------------

# Input size (rows/cols) at which the bf16 linear pass switches from the dense
# (out,in) matmul to the block-banded form. On-chip profile (round-4g,
# tools/profile_head.py, chain-slope timed): banded beats dense at every
# measured input size — 408→816 C=256: 0.50 vs 1.41 ms, 544→1088 C=256:
# 1.36 vs 3.73, 816→1428 C=128: 1.36 vs 4.27, 1088→1904 C=128: 2.42 vs 9.33.
# (Those dense rows used the pre-4h single-pixel fold, which XLA could
# narrow through a single einsum — so they are LOWER bounds on dense cost;
# the round-4h e2e fold confirmed the direction: 1428² 199→196 ms,
# 1904² 506→500, headline 95.8→96.4 fps, no regression at any size.)
# Below ~384 input rows the dense matrix is small enough that the zero-MAC
# waste is free (round-2b measured dense beating the gather at 288→504) and
# the concat of banded slabs costs a relayout, so the dense path stays.
BANDED_MIN_IN: int | None = 384


def _apply_linear_bf16(x, axis, in_size, out_size, align_corners, compute_dtype):
    """One bf16 non-antialiased linear pass along ``axis`` (1=H, 2=W) of an
    NHWC array: dense (out,in) MXU matmul below BANDED_MIN_IN input size,
    block-banded windows above it (identical weights either way)."""
    spec = "oh,nhwc->nowc" if axis == 1 else "ow,nhwc->nhoc"
    if BANDED_MIN_IN is not None and in_size >= BANDED_MIN_IN:
        parts = [
            jnp.einsum(
                spec,
                jnp.asarray(wb, compute_dtype),
                (x[:, lo:hi] if axis == 1 else x[:, :, lo:hi]),
                preferred_element_type=compute_dtype,
            )
            for (lo, hi, wb) in _banded_blocks_np(in_size, out_size, align_corners)
        ]
        return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else parts[0]
    wm = jnp.asarray(_resize_matrix_np(in_size, out_size, "linear", align_corners, False), compute_dtype)
    return jnp.einsum(spec, wm, x, preferred_element_type=compute_dtype)


def resize_2d(
    img_nhwc: jnp.ndarray,
    out_hw: tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
    compute_dtype=None,
) -> jnp.ndarray:
    """Resize NHWC (or HWC / HW) arrays to ``out_hw`` with exact torch
    interpolate semantics. Separable: H pass then W pass, each a dense matmul
    that XLA maps onto the MXU.

    compute_dtype: dense (matmul) paths default to f32 for torch bit-parity;
    the sparse 2-tap linear path defaults to the INPUT dtype — a bf16 lerp of
    bf16 data matches what torch's fp16/bf16 GPU path does, and halves the
    HBM traffic of the fusion/head upsamples."""
    mode_1d = {"bilinear": "linear", "linear": "linear", "bicubic": "cubic", "cubic": "cubic"}[mode]
    squeeze = []
    if img_nhwc.ndim == 2:
        img_nhwc = img_nhwc[None, :, :, None]
        squeeze = [0, -1]
    elif img_nhwc.ndim == 3:
        img_nhwc = img_nhwc[None]
        squeeze = [0]

    n, h, w, c = img_nhwc.shape
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    orig_dtype = img_nhwc.dtype
    sparse_linear = mode_1d == "linear" and not antialias
    if compute_dtype is None:
        is_float = jnp.issubdtype(orig_dtype, jnp.floating)
        compute_dtype = orig_dtype if (sparse_linear and is_float) else jnp.float32
    x = img_nhwc.astype(compute_dtype)

    if sparse_linear and compute_dtype == jnp.bfloat16:
        # bf16 speed path: the SAME 2-tap weights, but applied as dense
        # (out,in) matmuls. The MXU eats the extra (mostly-zero) FLOPs for
        # free while the gather path is bound by HBM traffic + TPU gather
        # lowering — measured 816 -> ~250 us on the ViT-L head's 288->504
        # 128ch upsample. f32 (parity mode) keeps the exact-lerp taps below.
        # Above _BANDED_MIN_IN input rows/cols the zero-MAC waste stops being
        # free (the dense matrix grows quadratically with resolution) and the
        # same weights are applied block-banded: each 128-output-row slab
        # multiplies only its input window (~in/window = 6-10x fewer FLOPs at
        # 1428/1904px, every matmul still MXU-shaped).
        if out_h != h:
            x = _apply_linear_bf16(x, 1, h, out_h, align_corners, compute_dtype)
        if out_w != w:
            x = _apply_linear_bf16(x, 2, w, out_w, align_corners, compute_dtype)
        x = x.astype(orig_dtype)
        if squeeze == [0, -1]:
            return x[0, :, :, 0]
        if squeeze == [0]:
            return x[0]
        return x

    if sparse_linear:
        # sparse 2-tap gather + lerp: same exact weights, ~in_size/2 x fewer
        # FLOPs than the dense matmul (dominates fusion/head upsampling cost)
        if out_h != h:
            i0, i1, w0, w1 = _linear_taps_np(h, out_h, align_corners)
            x = (
                jnp.take(x, jnp.asarray(i0), axis=1) * jnp.asarray(w0, compute_dtype)[:, None, None]
                + jnp.take(x, jnp.asarray(i1), axis=1) * jnp.asarray(w1, compute_dtype)[:, None, None]
            )
        if out_w != w:
            i0, i1, w0, w1 = _linear_taps_np(w, out_w, align_corners)
            x = (
                jnp.take(x, jnp.asarray(i0), axis=2) * jnp.asarray(w0, compute_dtype)[:, None]
                + jnp.take(x, jnp.asarray(i1), axis=2) * jnp.asarray(w1, compute_dtype)[:, None]
            )
        x = x.astype(orig_dtype)
        if squeeze == [0, -1]:
            return x[0, :, :, 0]
        if squeeze == [0]:
            return x[0]
        return x

    # dense separable matmuls (bicubic / antialias). precision='highest'
    # keeps f32 matmul accuracy on the MXU (which would otherwise round
    # through bf16 passes) — required for torch parity.
    if out_h != h or antialias:
        wh = jnp.asarray(_resize_matrix_np(h, out_h, mode_1d, align_corners, antialias))
        x = jnp.einsum("oh,nhwc->nowc", wh, x, preferred_element_type=compute_dtype, precision="highest")
    if out_w != w or antialias:
        ww = jnp.asarray(_resize_matrix_np(w, out_w, mode_1d, align_corners, antialias))
        x = jnp.einsum("ow,nhwc->nhoc", ww, x, preferred_element_type=compute_dtype, precision="highest")

    x = x.astype(orig_dtype)
    if squeeze == [0, -1]:
        x = x[0, :, :, 0]
    elif squeeze == [0]:
        x = x[0]
    return x
