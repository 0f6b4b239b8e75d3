"""Pallas TPU flash attention with optional additive bias.

Serves the three attention flavors in this framework (SURVEY.md §7 kernel ①/③):
* DINOv2 full self-attention (Depth-Anything V1/V2) — no bias
* BEiT self-attention — additive relative-position bias per (head, q, k)
* (SwinV2 windows use the XLA path; window areas are small enough that the
  materialized logits already live in VMEM-sized tiles.)

Design (FlashAttention-2 work partitioning, arXiv:2307.08691): one grid
program per (batch*head, query-block); full K/V for that head streamed into
VMEM once and iterated in BLOCK_K chunks with an online-softmax running
(max, sum, accumulator) carry — the N x N logit matrix never exists in HBM.
All softmax math is f32 on the VPU; the two matmuls per chunk hit the MXU with
f32 accumulation. Inputs padded to block multiples; padded key columns are
masked with -inf (statically, shapes are trace-time constants)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

NEG_INF = -1e30


def flash_attention_available() -> bool:
    try:
        return _HAS_PLTPU and jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len, block_k, scale, bias_ref=None):
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, D)
    block_q, d = q.shape
    n_pad = k_ref.shape[1]
    num_chunks = n_pad // block_k

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_chunk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)  # (BK, D)
        v_chunk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_chunk, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        if bias_ref is not None:
            s = s + bias_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        # mask out padded key columns (kv_len is a static python int)
        col = i * block_k + lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p, v_chunk, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m, l, acc = lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_bhnd(q, k, v, bias=None, scale=None, block_q=128, block_k=256, interpret=False):
    """q/k/v: (BH, N, D) -> (BH, N, D). bias: optional (BH, N, N)."""
    bh, n, d = q.shape
    scale = (d ** -0.5) if scale is None else scale
    block_k = min(block_k, _round_up(n, 128))
    n_pad_q = _round_up(n, block_q)
    n_pad_k = _round_up(n, block_k)

    qp = jnp.pad(q, ((0, 0), (0, n_pad_q - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad_k - n), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad_k - n), (0, 0)))

    grid = (bh, n_pad_q // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, n_pad_k, d), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, n_pad_k, d), lambda b, i: (b, 0, 0)),
    ]
    args = [qp, kp, vp]
    kernel = functools.partial(_kernel, kv_len=n, block_k=block_k, scale=scale)
    if bias is not None:
        bp = jnp.pad(bias, ((0, 0), (0, n_pad_q - n), (0, n_pad_k - n)))
        in_specs.append(pl.BlockSpec((1, block_q, n_pad_k), lambda b, i: (b, i, 0)))
        args.append(bp)

        def kernel_with_bias(q_ref, k_ref, v_ref, b_ref, o_ref):
            _kernel(q_ref, k_ref, v_ref, o_ref, kv_len=n, block_k=block_k, scale=scale, bias_ref=b_ref)

        kernel = kernel_with_bias

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad_q, d), q.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :n, :]


def flash_attention(q, k, v, bias=None, scale=None, interpret=False):
    """Drop-in for jax.nn.dot_product_attention with (B, N, H, D) layout and
    optional additive bias broadcastable to (B, H, N, N)."""
    b, n, h, d = q.shape
    to_bhnd = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    qb, kb, vb = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    bias_b = None
    if bias is not None:
        bias_b = jnp.broadcast_to(bias, (b, h, n, n)).reshape(b * h, n, n)
    out = _flash_bhnd(qb, kb, vb, bias_b, scale=scale, interpret=interpret)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
