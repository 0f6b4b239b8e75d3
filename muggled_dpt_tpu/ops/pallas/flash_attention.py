"""Pallas TPU flash attention (with optional additive bias for BEiT relpos).

Placeholder gating: until the kernel lands, callers fall back to
jax.nn.dot_product_attention (XLA's fused attention)."""

from __future__ import annotations

import jax


def flash_attention_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu" and _KERNEL_READY
    except Exception:
        return False


_KERNEL_READY = False


def flash_attention(q, k, v, bias=None, scale=None):
    raise NotImplementedError
