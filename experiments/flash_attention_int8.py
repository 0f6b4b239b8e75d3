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
