"""Pallas flash-attention kernel vs the naive softmax reference
(interpret mode, runs on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from muggled_dpt_tpu.ops.pallas.flash_attention import flash_attention


def _naive(q, k, v, bias=None, scale=None):
    d = q.shape[-1]
    s = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * s, k).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", w.astype(q.dtype), v)


@pytest.mark.parametrize("n", [64, 200, 513])  # exercises padding/tail masking
@pytest.mark.parametrize("with_bias", [False, True])
def test_flash_matches_naive(n, with_bias):
    rng = np.random.default_rng(0)
    b, h, d = 1, 3, 32
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, n, n)), jnp.float32) if with_bias else None

    ref = np.asarray(_naive(q, k, v, bias))
    got = np.asarray(flash_attention(q, k, v, bias=bias, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_bias", [False, True])
def test_flash_online_path(with_bias):
    """N above the one-pass cutoff exercises the streamed-key online kernel
    (scratch state + per-block correction + tail masking)."""
    from muggled_dpt_tpu.ops.pallas import flash_attention as fa

    rng = np.random.default_rng(2)
    b, n, h, d = 1, fa.ONE_PASS_MAX_KV + 100, 1, 16
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, n, n)), jnp.float32) if with_bias else None
    ref = np.asarray(_naive(q, k, v, bias))
    got = np.asarray(flash_attention(q, k, v, bias=bias, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_flash_all_logits_negative():
    """The mask-free padding trick shifts by max(logits, 0); strongly negative
    logit rows must still normalize correctly."""
    rng = np.random.default_rng(3)
    n = 130  # pads to 256 -> exercises the analytic pad correction
    q = jnp.asarray(rng.standard_normal((1, n, 1, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, n, 1, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, n, 1, 16)), jnp.float32)
    bias = jnp.full((1, 1, n, n), -40.0, jnp.float32)  # all real logits << 0
    ref = np.asarray(_naive(q, k, v, bias))
    got = np.asarray(flash_attention(q, k, v, bias=bias, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("with_bias", [False, True])
def test_fused_qkv_matches_naive(with_bias):
    """Head-major fused-qkv kernel vs explicit softmax attention."""
    from muggled_dpt_tpu.ops.pallas.flash_attention import flash_attention_fused_qkv

    rng = np.random.default_rng(7)
    b, n, h, d = 2, 200, 4, 32  # d*hpp must reach the 128-lane width (hpp=4)
    # build head-major (B, N, [h][3][d]) qkv and the equivalent split tensors
    qkv = jnp.asarray(rng.standard_normal((b, n, h, 3, d)), jnp.float32)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    bias = jnp.asarray(rng.standard_normal((b, h, n, n)), jnp.float32) if with_bias else None

    ref = np.asarray(_naive(q, k, v, bias))
    got = np.asarray(
        flash_attention_fused_qkv(qkv.reshape(b, n, 3 * h * d), h, bias=bias, interpret=True)
    ).reshape(b, n, h, d)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_flash_custom_scale():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 100, 2, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 100, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 100, 2, 16)), jnp.float32)
    ref = np.asarray(_naive(q, k, v, scale=0.5))
    got = np.asarray(flash_attention(q, k, v, scale=0.5, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
