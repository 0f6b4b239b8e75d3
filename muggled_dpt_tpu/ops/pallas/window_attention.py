"""Pallas TPU fused windowed attention for SwinV2 (SURVEY.md §7 kernel ②).

Each grid program handles one (batch, window, head): the window's logits,
CPB relative-position bias, shift mask and softmax all live in VMEM — the
XLA path materializes (B, nW, H, A, A) logit tensors in HBM (127 MB per
block for Swin-L stage 1 at 384²) plus a broadcast bias of the same size.
The CPB bias (per head) and shift mask (per window) stay factored: separate
block specs index them by the head / window component of the program id, so
the combined bias never exists anywhere.

Cosine attention is handled outside the kernel: q is l2-normalized and scaled
by the learned per-head logit_scale, k is l2-normalized (cheap elementwise
work XLA fuses into the qkv projection), so the kernel computes a plain
dot + bias + softmax + weighted sum."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ._common import NEG_INF, round_up as _round_up, tpu_kernels_available


def window_flash_available() -> bool:
    return tpu_kernels_available()


def _kernel(q_ref, k_ref, v_ref, cpb_ref, mask_ref, o_ref, *, kv_len):
    q = q_ref[0]  # (A_pad, D)
    k = k_ref[0]
    v = v_ref[0]
    a_pad = q.shape[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # padded key columns are masked by the CPB bias itself: the wrapper pads
    # the bias's key axis with NEG_INF at trace time, so no iota/select VPU
    # passes run in the kernel; kv_len is unused here but kept in the
    # signature so the wrapper's partial() documents the logical key length
    del kv_len
    s = s + cpb_ref[0].astype(jnp.float32)
    if mask_ref is not None:
        s = s + mask_ref[0].astype(jnp.float32)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def window_flash_attention(q, k, v, cpb_bias, mask=None, interpret: bool = False):
    """Fused windowed attention.

    q, k, v:   (B, nW, A, H, D) — q pre-scaled (normalized * logit_scale),
               k pre-normalized.
    cpb_bias:  (H, A, A) continuous-position bias (16*sigmoid(...)).
    mask:      optional (nW, A, A) shift mask of 0/-100.
    Returns (B, nW, A, H, D)."""
    b, nw, a, h, d = q.shape
    a_pad = _round_up(a, 128)

    def to_p(x):  # (B, nW, A, H, D) -> (B*nW*H, A_pad, D), head fastest
        x = x.transpose(0, 1, 3, 2, 4).reshape(b * nw * h, a, d)
        return jnp.pad(x, ((0, 0), (0, a_pad - a), (0, 0)))

    qp, kp, vp = to_p(q), to_p(k), to_p(v)
    # pad the bias's query rows with zeros (dead rows, sliced away) but its
    # KEY columns with NEG_INF — this doubles as the pad mask, so the kernel
    # needs no masking passes at all
    cpb = jnp.pad(cpb_bias, ((0, 0), (0, a_pad - a), (0, 0)))
    cpb = jnp.pad(cpb, ((0, 0), (0, 0), (0, a_pad - a)), constant_values=NEG_INF)

    in_specs = [
        pl.BlockSpec((1, a_pad, d), lambda p: (p, 0, 0)),
        pl.BlockSpec((1, a_pad, d), lambda p: (p, 0, 0)),
        pl.BlockSpec((1, a_pad, d), lambda p: (p, 0, 0)),
        pl.BlockSpec((1, a_pad, a_pad), lambda p: (p % h, 0, 0)),  # per-head CPB
    ]
    args = [qp, kp, vp, cpb]
    if mask is not None:
        maskp = jnp.pad(mask, ((0, 0), (0, a_pad - a), (0, a_pad - a)))
        in_specs.append(pl.BlockSpec((1, a_pad, a_pad), lambda p: ((p // h) % nw, 0, 0)))
        args.append(maskp)

        def kernel(q_ref, k_ref, v_ref, cpb_ref, mask_ref, o_ref):
            _kernel(q_ref, k_ref, v_ref, cpb_ref, mask_ref, o_ref, kv_len=a)

    else:

        def kernel(q_ref, k_ref, v_ref, cpb_ref, o_ref):
            _kernel(q_ref, k_ref, v_ref, cpb_ref, None, o_ref, kv_len=a)

    out = pl.pallas_call(
        kernel,
        grid=(b * nw * h,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, a_pad, d), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nw * h, a_pad, d), q.dtype),
        interpret=interpret,
    )(*args)
    out = out[:, :a, :].reshape(b, nw, h, a, d).transpose(0, 1, 3, 2, 4)
    return out
