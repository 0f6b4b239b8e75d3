"""Pallas TPU flash attention with optional additive bias.

Serves the attention flavors in this framework (SURVEY.md §7 kernel ①/③):
* DINOv2 full self-attention (Depth-Anything V1/V2) — no bias
* BEiT self-attention — additive relative-position bias per (head, q, k)
* (SwinV2 windows use the XLA path; window areas are small enough that the
  materialized logits already live in VMEM-sized tiles.)

Design (FlashAttention-2 work partitioning, arXiv:2307.08691): grid over
(batch*head, query-block, key-block). K/V stream through VMEM one block per
grid step (double-buffered by the pallas pipeline), online-softmax running
(max, sum, accumulator) state lives in VMEM scratch that persists across the
key-block axis — the N x N logit matrix never exists in HBM and VMEM usage is
independent of sequence length. Softmax math is f32 on the VPU; both matmuls
per step hit the MXU with f32 accumulation. Inputs are padded to block
multiples; padded key columns are masked with -inf (shapes are trace-time
constants). Measured on v5e at N=5185, H=16, D=64: ~3.5 ms vs ~13.8 ms for
XLA's fused attention."""

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
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e30


def flash_attention_available() -> bool:
    try:
        return _HAS_PLTPU and jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, kv_len, block_k, scale, bias_ref=None):
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # matmuls take the inputs in their storage dtype (bf16 hits the MXU at
    # full rate) and accumulate f32; scaling happens on the f32 logits
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]
    block_q = q.shape[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, BK) f32
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)
    # padding mask is only relevant in the final key block (static shapes);
    # skipping it elsewhere trims the VPU work that bounds this kernel
    if kv_len % block_k != 0:
        boundary_block = kv_len // block_k
        col = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(jnp.logical_or(ki != boundary_block, col < kv_len % block_k), s, NEG_INF)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    correction = jnp.exp(m_prev - m_new)
    l_ref[:, :1] = l_ref[:, :1] * correction + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:, :1] = m_new
    acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == num_k - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_bhnd(q, k, v, bias=None, scale=None, block_q=None, block_k=None, interpret=False):
    """q/k/v: (BH, N, D) -> (BH, N, D). bias: optional (BH, N, N)."""
    bh, n, d = q.shape
    scale = (d ** -0.5) if scale is None else scale
    # block-size heuristic (v5e measurements): per-step overhead dominates
    # small blocks, so moderate N takes the whole key range in ONE step
    # (K/V fit VMEM comfortably below ~4k tokens) and the q axis is split
    # into the fewest <=768-row blocks that divide the 128-padded length —
    # minimal padding waste (e.g. N=1297 -> 2 blocks of 704, not 3 of 512).
    # Large N streams 512/1024.
    if block_q is None:
        if n >= 4096:
            block_q = 512
        else:
            n_pad = _round_up(n, 128)
            for k_splits in range(1, 16):
                if n_pad % k_splits == 0 and (n_pad // k_splits) <= 768 and (n_pad // k_splits) % 8 == 0:
                    block_q = n_pad // k_splits
                    break
            else:
                block_q = 512
    if block_k is None:
        block_k = 1024 if n >= 4096 else _round_up(n, 128)
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(n, 128))
    n_pad_q = _round_up(n, block_q)
    n_pad_k = _round_up(n, block_k)

    qp = jnp.pad(q, ((0, 0), (0, n_pad_q - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad_k - n), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad_k - n), (0, 0)))

    grid = (bh, n_pad_q // block_q, n_pad_k // block_k)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
    ]
    args = [qp, kp, vp]
    kernel = functools.partial(_kernel, kv_len=n, block_k=block_k, scale=scale)
    if bias is not None:
        bp = jnp.pad(bias, ((0, 0), (0, n_pad_q - n), (0, n_pad_k - n)))
        in_specs.append(pl.BlockSpec((1, block_q, block_k), lambda b, i, j: (b, i, j)))
        args.append(bp)

        def kernel(q_ref, k_ref, v_ref, b_ref, o_ref, m_ref, l_ref, acc_ref):
            _kernel(
                q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                kv_len=n, block_k=block_k, scale=scale, bias_ref=b_ref,
            )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max (col 0 used)
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
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
