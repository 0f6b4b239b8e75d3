"""Experimental online flash attention with an int8 QK^T (W8A8 logits).

Why: at 1904^2 (N=18497) the bf16 online kernel sits near its MXU floor, and
that floor is ~2x off v5e peak because QK^T contracts over D=64 — half the
128-deep systolic array. The v5e runs int8 matmuls at 2x the bf16 MAC rate
(tools/int8_mxu_probe.py measures whether that survives K=64), so an int8
QK^T can halve the QK^T slice of the step time. PV stays bf16: quantizing p
in-kernel would add VPU passes to a VPU-bound loop, and the PV matmul's
64-wide output group is already the cheaper half.

Quantization scheme (accuracy-first):
* q: per-ROW dynamic scales (sq = max|q_row|/127), computed in XLA where
  they fuse with the qkv projection epilogue. Row granularity keeps the
  logit error at the quantization floor (~0.5% relative) instead of letting
  one hot token inflate every row's scale.
* k: per-(batch*head) tensor scale (a column-granular scale would need a
  second broadcast multiply inside the kernel).
* The kernel sees alpha = sq_row * sk * softmax_scale * log2(e) as a
  (BH, N) row input and applies it in ONE fused convert+scale pass:
  s = i32_logits.astype(f32) * alpha[:, None]. The exp2-domain fold and all
  downstream softmax math are identical to the production kernel
  (muggled_dpt_tpu/ops/pallas/flash_attention.py).

Status: EXPERIMENT. Wire into ops/ only if the on-chip sweep
(tools/flash_tune.py --int8) shows a real win AND the end-to-end error stays
inside the int8 tier's gates (docs/performance.md). Per repo convention a
losing kernel stays here as a measured negative result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from muggled_dpt_tpu.ops.pallas._common import _HAS_PLTPU, NEG_INF, pltpu, round_up as _round_up

LOG2E = 1.4426950408889634


def _online_kernel_i8(q_ref, k_ref, v_ref, a_ref, o_ref, m_ref, acc_ref, *, kv_len, block_k, d):
    """FlashAttention-2 step with int8 logits; mirrors _online_kernel's
    exp2-domain / fused-l structure (flash_attention.py) exactly after the
    logit tile is produced."""
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (BQ, D) int8
    k = k_ref[0]  # (BK, D) int8
    v = v_ref[0]  # (BK, D) bf16/f32
    # alpha rides as a (1, BQ) row (compact in HBM — a lane-padded (BQ, 128)
    # column would stream 128x the bytes); the row->column relayout is a
    # one-tile op on BQ elements, negligible next to the (BQ, BK) passes
    alpha = a_ref[0].reshape(-1, 1)  # (BQ, 1) f32 = sq_row * sk * scale * log2(e)

    s_i32 = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    s = s_i32.astype(jnp.float32) * alpha

    if kv_len % block_k != 0:
        boundary_block = kv_len // block_k
        col = lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        keep = jnp.logical_or(ki != boundary_block, col < kv_len % block_k)
        s = s + jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp2(s - m_new)
    correction = jnp.exp2(m_prev - m_new)
    m_ref[:, :1] = m_new

    ext = acc_ref.shape[1]
    v_ext = jnp.concatenate([v, jnp.ones((v.shape[0], ext - d), v.dtype)], axis=1)
    acc_ref[:] = acc_ref[:] * correction + lax.dot_general(
        p.astype(v.dtype), v_ext, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == num_k - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:, :d] / jnp.maximum(acc_ref[:, d : d + 1], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention_int8_qk(q, k, v, scale=None, block_q=1024, block_k=1024, interpret=False):
    """q/k/v: (BH, N, D), q in natural (unscaled) form. Returns (BH, N, D).

    Quantizes q (per row) and k (per batch-head) to int8 in XLA, then runs
    the int8-logit online kernel. D must not be a multiple of 128 (the
    fused-l layout is assumed, as in production where D=64)."""
    bh, n, d = q.shape
    assert d % 128 != 0, "int8 experiment assumes the fused-l layout (D=64 class)"
    scale = (d ** -0.5) if scale is None else scale

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    sq = jnp.maximum(jnp.max(jnp.abs(qf), axis=2), 1e-12) / 127.0  # (BH, N)
    sk = jnp.maximum(jnp.max(jnp.abs(kf), axis=(1, 2)), 1e-12) / 127.0  # (BH,)
    q_i8 = jnp.round(qf / sq[:, :, None]).astype(jnp.int8)
    k_i8 = jnp.round(kf / sk[:, None, None]).astype(jnp.int8)
    alpha = (sq * sk[:, None] * scale * LOG2E).astype(jnp.float32)  # (BH, N)

    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(n, 128))
    n_pad_q = _round_up(n, block_q)
    n_pad_k = _round_up(n, block_k)

    q_i8 = jnp.pad(q_i8, ((0, 0), (0, n_pad_q - n), (0, 0)))
    k_i8 = jnp.pad(k_i8, ((0, 0), (0, n_pad_k - n), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad_k - n), (0, 0)))
    ap = jnp.pad(alpha, ((0, 0), (0, n_pad_q - n)))  # (BH, N_pad_q)

    acc_cols = _round_up(d + 1, 128)
    grid = (bh, n_pad_q // block_q, n_pad_k // block_k)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_q), lambda b, i, j: (b, i)),
    ]
    kernel = functools.partial(_online_kernel_i8, kv_len=n, block_k=block_k, d=d)

    if pltpu is None:
        # pltpu.VMEM below is needed even for interpret mode — match the
        # production kernels' unconditional raise rather than implying an
        # interpret path that would NameError three lines later.
        raise RuntimeError("int8 online kernel needs pallas-TPU (pltpu unavailable)")
    scratch_shapes = [
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, acc_cols), jnp.float32),
    ]
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad_q, d), v.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **kwargs,
    )(q_i8, k_i8, vp, ap)
    return out[:, :n, :]


# ---------------------------------------------------------------------------
# Round-4c: ONE-PASS int8-QK^T in the fused-slab layout.
#
# Two findings changed the design after the online variant above:
# * the serving cutover moved to one-pass at every DPT N (ops/pallas/
#   flash_attention.py:ONE_PASS_MAX_KV, round-4 sweep), so an int8 online
#   kernel no longer matches the production dispatch;
# * the online variant's (1, block_q, 64) int8 q/k REFS fail Mosaic lowering
#   (int8 min tile (32, 128) — the block minor dim is 64). Packing each
#   head's q|k side by side in one (N_pad, hpp*2D) slab keeps every ref's
#   minor dim at >=256 lanes; the 64-wide per-head slices happen on VALUES
#   inside the kernel, which Mosaic relayouts instead of refusing.
#
# The MXU case for int8 logits (tools/int8_mxu_probe.py, round-4c sane
# measurements): int8 K-slope 204.9 TMAC/s vs bf16 97.9 (a true 2x), and at
# the attention QK^T shape class int8 is 1.74x faster. PV stays bf16 — the
# probe's 4.73x int8 PV number is HBM-bound shape artifact, and quantizing p
# in-kernel would add VPU passes where the kernel is VPU-tight.
# ---------------------------------------------------------------------------


def _onepass_i8qk_kernel(qk_ref, v_ref, a_ref, o_ref, *, kv_len, d, hpp, block_q):
    """One-pass attention with int8 QK^T logits in the fused-slab layout.

    qk_ref: (1, N_pad, hpp*2D) int8, columns [head][q|k][dim]; q rows are
    pre-scaled by softmax_scale*log2(e)/sq_row before quantization.
    v_ref: (1, N_pad, hpp*D) storage-dtype v slab, [head][dim] columns.
    a_ref: (1, 1, 8, BQ) f32 alpha rows = sq_row * sk_head (the exp2-domain
    softmax scale already rode into q before quantization); rows j >= hpp
    are sublane padding — Pallas TPU requires the block's last two dims
    divisible by (8, 128), and hpp=2 isn't.
    Mirrors _onepass_qkv_kernel's structure (muggled_dpt_tpu/ops/pallas/
    flash_attention.py): independent per-head chains for MXU/VPU overlap,
    (1, KV_pad) additive pad mask, fused softmax row-sum in the PV matmul's
    padded 128-lane output group."""
    qk = qk_ref[0]
    vs = v_ref[0]
    kv_pad = qk.shape[0]
    alpha_rows = a_ref[0, 0]  # (8, BQ) — hpp rows used, rest sublane padding
    mask_row = None
    if kv_len < kv_pad:
        col = lax.broadcasted_iota(jnp.int32, (1, kv_pad), 1)
        mask_row = jnp.where(col < kv_len, 0.0, NEG_INF).astype(jnp.float32)
    qsrc = qk
    if block_q is not None:
        # ref-level pl.ds load: Mosaic has no lowering for dynamic_slice on
        # values (see _onepass_qkv_kernel / tests/test_tpu_lowering.py)
        qsrc = qk_ref[0, pl.ds(pl.program_id(2) * block_q, block_q), :]
    for j in range(hpp):
        base = j * 2 * d
        q = qsrc[:, base : base + d]  # (BQ, D) int8
        k = qk[:, base + d : base + 2 * d]  # (KV_pad, D) int8
        v = vs[:, j * d : (j + 1) * d]
        s_i32 = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
        s = s_i32.astype(jnp.float32) * alpha_rows[j].reshape(-1, 1)
        if mask_row is not None:
            s = s + mask_row
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        ext = _round_up(d + 1, 128)
        v_ext = jnp.concatenate([v, jnp.ones((v.shape[0], ext - d), v.dtype)], axis=1)
        of = lax.dot_general(
            p.astype(v.dtype), v_ext, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o = of[:, :d] / jnp.maximum(of[:, d : d + 1], 1e-30)
        o_ref[0, :, j * d : (j + 1) * d] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "block_q", "interpret"))
def flash_attention_int8_qk_fused(qkv, num_heads, scale=None, block_q=None, interpret=False):
    """One-pass int8-QK^T attention off the head-major fused qkv projection.

    qkv: (B, N, 3C), columns [head][q|k|v][dim] (the production layout,
    checkpoints/convert_common.py:qkv_head_major). Returns (B, N, C).

    XLA side (fuses with the qkv projection epilogue): q rows fold in
    softmax_scale*log2(e), then quantize per ROW (sq = max|q_row|/127); k
    quantizes per (batch, head) tensor. alpha = sq_row * sk_head rides as
    (B, H, N_pad) f32 rows. v stays in the storage dtype.

    Error class: per-row int8 logits carry ~0.5-1% relative error — the same
    order as bf16's own 8-bit-mantissa rounding of q/k — but this is gated
    into the OPT-IN int8 tier only (ops/quant.py) pending the tier-gate
    re-measurement; see module docstring."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    assert d % 128 != 0, "int8 experiment assumes the fused-l layout (D=64 class)"
    scale = (d ** -0.5) if scale is None else scale
    hpp = None
    for cand in (1, 2, 4, 8):
        if num_heads % cand == 0 and (2 * d * cand) % 128 == 0 and (d * cand) % 128 == 0:
            hpp = cand
            break
    assert hpp is not None, "no head grouping satisfies the 128-lane rule"

    n_pad = _round_up(n, 128)
    if block_q is None:
        limit = 2 * 16 * 1024 * 1024  # logit budget, as the bf16 fused picker
        cap = max(256, limit // (hpp * n_pad * 4) // 128 * 128)
        cap = min(cap, n_pad)
        block_q, best_pad = cap, _round_up(n_pad, cap)
        for cand in range(cap, 511, -128):
            padded = _round_up(n_pad, cand)
            if padded < best_pad:
                block_q, best_pad = cand, padded
    block_q = min(block_q, n_pad)
    n_pad_q = _round_up(n_pad, block_q)

    hm = qkv.reshape(b, n, num_heads, 3, d)
    qf = hm[..., 0, :].astype(jnp.float32) * (scale * LOG2E)  # (B, N, H, D)
    kf = hm[..., 1, :].astype(jnp.float32)
    v = hm[..., 2, :]
    sq = jnp.maximum(jnp.max(jnp.abs(qf), axis=3), 1e-12) / 127.0  # (B, N, H)
    sk = jnp.maximum(jnp.max(jnp.abs(kf), axis=(1, 3)), 1e-12) / 127.0  # (B, H)
    q_i8 = jnp.round(qf / sq[..., None]).astype(jnp.int8)
    k_i8 = jnp.round(kf / sk[:, None, :, None]).astype(jnp.int8)
    alpha = (sq * sk[:, None, :]).transpose(0, 2, 1)  # (B, H, N)

    qk_slab = jnp.stack([q_i8, k_i8], axis=3).reshape(b, n, 2 * c)  # [h][q|k][d]
    v_slab = v.reshape(b, n, c)
    qk_slab = jnp.pad(qk_slab, ((0, 0), (0, n_pad_q - n), (0, 0)))
    v_slab = jnp.pad(v_slab, ((0, 0), (0, n_pad_q - n), (0, 0)))
    # (B, groups, 8, N_pad): head-group-major with the hpp axis padded to the
    # 8-sublane minimum (see _onepass_i8qk_kernel docstring)
    ap = jnp.pad(alpha, ((0, 0), (0, 0), (0, n_pad_q - n))).astype(jnp.float32)
    ap = ap.reshape(b, num_heads // hpp, hpp, n_pad_q)
    ap = jnp.pad(ap, ((0, 0), (0, 0), (0, 8 - hpp), (0, 0))) if hpp < 8 else ap

    grid = (b, num_heads // hpp, n_pad_q // block_q)
    kernel = functools.partial(
        _onepass_i8qk_kernel, kv_len=n, d=d, hpp=hpp,
        block_q=block_q if n_pad_q != block_q else None,
    )
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=max(100 * 1024 * 1024, hpp * block_q * n_pad_q * 4 + 16 * 1024 * 1024)
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_pad_q, 2 * d * hpp), lambda bi, gi, qi: (bi, 0, gi)),
            pl.BlockSpec((1, n_pad_q, d * hpp), lambda bi, gi, qi: (bi, 0, gi)),
            pl.BlockSpec((1, 1, 8, block_q), lambda bi, gi, qi: (bi, gi, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d * hpp), lambda bi, gi, qi: (bi, qi, gi)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad_q, c), qkv.dtype),
        interpret=interpret,
        **kwargs,
    )(qk_slab, v_slab, ap)
    return out[:, :n, :]
