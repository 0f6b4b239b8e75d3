"""Mosaic (TPU) lowering gate for every Pallas kernel entry point.

Interpret-mode tests validate kernel NUMERICS on CPU but never run the Mosaic
lowering, so a kernel can pass the whole suite and still be uncompilable on
the chip — exactly what happened in round 4d: the q-blocked fused-qkv kernel
used lax.dynamic_slice on a loaded VALUE (no Mosaic lowering exists) and every
>=756px serving size failed on hardware while CPU tests stayed green.

jax.export with platforms=['tpu'] runs the full StableHLO+Mosaic lowering
pipeline on the CPU-only test backend (no device needed), which catches
unimplemented primitives, block-shape divisibility errors, and layout
violations. These tests lower each kernel at the shapes serving actually
dispatches; they do NOT execute anything.
"""

import functools

import jax
import jax.numpy as jnp
import pytest


def _lower_tpu(fn, *args):
    """Export fn for the TPU platform (lowering only, no execution)."""
    jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)


# ---------------------------------------------------------------------------
# fused-qkv one-pass kernel (the serving default)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n",
    [
        1297,  # 504^2 ViT-L grid (whole-N regime)
        2917,  # 756^2 — first q-blocked size (n_pad > whole-N VMEM ceiling)
        5477,  # 1036^2
        10405,  # 1428^2 — hpp=4 + qk_first XL dispatch (the measured win point)
        12288,  # hpp=4 window ceiling (HPP4_MAX_NPAD) — pin compile feasibility at the bound
        18497,  # 1904^2 (past the hpp=4 window; back to hpp=2)
    ],
)
def test_fused_qkv_lowers(n):
    from muggled_dpt_tpu.ops.pallas.flash_attention import flash_attention_fused_qkv

    qkv = jnp.zeros((1, n, 3 * 16 * 64), jnp.bfloat16)
    _lower_tpu(functools.partial(flash_attention_fused_qkv, num_heads=16), qkv)


def test_fused_qkv_biased_lowers():
    from muggled_dpt_tpu.ops.pallas.flash_attention import flash_attention_fused_qkv

    n, h, d = 1026, 16, 64  # BEiT-L @512: 32^2 grid + 2 extra tokens
    qkv = jnp.zeros((1, n, 3 * h * d), jnp.bfloat16)
    bias = jnp.zeros((1, h, n, n), jnp.bfloat16)
    _lower_tpu(lambda qkv, bias: flash_attention_fused_qkv(qkv, h, bias=bias), qkv, bias)


def test_fused_qkv_bias_stack_lowers():
    from muggled_dpt_tpu.ops.pallas.flash_attention import flash_attention_fused_qkv
    from muggled_dpt_tpu.ops.pallas._common import round_up

    n, h, d, layers = 1026, 16, 64, 2
    n_pad = round_up(n, 128)
    qkv = jnp.zeros((1, n, 3 * h * d), jnp.bfloat16)
    stack = jnp.zeros((layers, h, n_pad, n_pad), jnp.bfloat16)

    def fn(qkv, stack, layer):
        return flash_attention_fused_qkv(qkv, h, bias_stack=stack, layer=layer)

    _lower_tpu(fn, qkv, stack, jnp.int32(1))


# ---------------------------------------------------------------------------
# (B, N, H, D) wrapper: plain one-pass and online kernels
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n,biased",
    [
        (1297, False),
        (1026, True),
        (2917, False),
        # biased q-blocked regime: since ONE_PASS_MAX_KV went to 32768 the
        # plain one-pass kernel serves BIASED large-N calls too (BEiT grids
        # past the fused gate's whole-N VMEM ceiling), with the 256-row-floor
        # block_q and sliced bias blocks — lower it like the unbiased ladder
        (2917, True),
        (10405, True),
    ],
)
def test_flash_attention_lowers(n, biased):
    from muggled_dpt_tpu.ops.pallas.flash_attention import flash_attention

    q = jnp.zeros((1, n, 8, 64), jnp.bfloat16)
    bias = jnp.zeros((1, 8, n, n), jnp.bfloat16) if biased else None
    if bias is None:
        _lower_tpu(flash_attention, q, q, q)
    else:
        _lower_tpu(flash_attention, q, q, q, bias)


@pytest.mark.parametrize("biased", [False, True])
def test_online_kernel_lowers(biased):
    from muggled_dpt_tpu.ops.pallas.flash_attention import _flash_bhnd_prescaled

    n = 4097
    q = jnp.zeros((2, n, 64), jnp.bfloat16)
    fn = functools.partial(_flash_bhnd_prescaled, one_pass=False)
    if biased:
        bias = jnp.zeros((2, n, n), jnp.bfloat16)
        _lower_tpu(fn, q, q, q, bias)
    else:
        _lower_tpu(fn, q, q, q)


# ---------------------------------------------------------------------------
# SwinV2 window kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("masked", [False, True])
def test_window_attention_lowers(masked):
    from muggled_dpt_tpu.ops.pallas.window_attention import window_flash_attention

    nw, h, t, d = 4, 6, 256, 32  # 16x16 windows, SwinV2-ish head dim
    q = jnp.zeros((1, nw, t, h, d), jnp.bfloat16)
    cpb = jnp.zeros((h, t, t), jnp.bfloat16)
    mask = jnp.zeros((nw, t, t), jnp.bfloat16) if masked else None
    if mask is None:
        _lower_tpu(window_flash_attention, q, q, q, cpb)
    else:
        _lower_tpu(window_flash_attention, q, q, q, cpb, mask)


# ---------------------------------------------------------------------------
# int8-QK^T experiment kernels (tier candidates)
# ---------------------------------------------------------------------------


def test_int8_fused_onepass_lowers():
    from experiments.flash_attention_int8 import flash_attention_int8_qk_fused

    n, h, d = 2917, 16, 64
    qkv = jnp.zeros((1, n, 3 * h * d), jnp.bfloat16)
    _lower_tpu(functools.partial(flash_attention_int8_qk_fused, num_heads=h), qkv)
