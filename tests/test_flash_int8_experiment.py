"""int8-QK^T online flash experiment vs naive f32 attention (interpret mode).

The kernel lives under experiments/ until the on-chip sweep decides whether
the v5e's 2x int8 MXU rate survives the D=64 contraction AND the accuracy
stays inside the int8 tier's gates (see experiments/flash_attention_int8.py
and tools/int8_mxu_probe.py)."""

import numpy as np
import jax.numpy as jnp

from experiments.flash_attention_int8 import flash_attention_int8_qk


def naive_attention(q, k, v, scale):
    s = np.einsum("bnd,bmd->bnm", q, k).astype(np.float64) * scale
    p = np.exp(s - s.max(axis=2, keepdims=True))
    p /= p.sum(axis=2, keepdims=True)
    return np.einsum("bnm,bmd->bnd", p, v)


def test_int8_qk_close_to_f32_attention():
    rng = np.random.default_rng(0)
    bh, n, d = 4, 700, 64  # n % block_k != 0 exercises the boundary mask
    q = rng.standard_normal((bh, n, d)).astype(np.float32)
    k = rng.standard_normal((bh, n, d)).astype(np.float32)
    v = rng.standard_normal((bh, n, d)).astype(np.float32)
    scale = d ** -0.5

    ref = naive_attention(q, k, v, scale)
    got = np.asarray(
        flash_attention_int8_qk(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            block_q=256, block_k=256, interpret=True,
        )
    )
    # int8 logits perturb the softmax weights by ~the quantization floor;
    # outputs are convex combinations of unit-scale v so absolute error is
    # the right yardstick
    err = np.abs(got - ref).max()
    assert err < 5e-2, err
    mean_err = np.abs(got - ref).mean()
    assert mean_err < 5e-3, mean_err


def test_int8_qk_exact_when_quantization_is_lossless():
    """Rows whose max |entry| hits the scale anchor quantize exactly; with
    integer-grid inputs the kernel's only remaining error is f32 round-off."""
    rng = np.random.default_rng(1)
    bh, n, d = 2, 256, 64
    qi = rng.integers(-127, 128, (bh, n, d)).astype(np.float32)
    ki = rng.integers(-127, 128, (bh, n, d)).astype(np.float32)
    qi[:, :, 0] = 127  # anchor every row scale at exactly 127
    ki[:, :, 0] = 127
    c = 0.02
    q, k = qi * c, ki * c
    v = rng.standard_normal((bh, n, d)).astype(np.float32)
    scale = d ** -0.5

    ref = naive_attention(q, k, v, scale)
    got = np.asarray(
        flash_attention_int8_qk(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            block_q=128, block_k=128, interpret=True,
        )
    )
    err = np.abs(got - ref).max()
    assert err < 2e-4, err


def test_int8_qk_fused_onepass_matches_dequantized_naive():
    """The round-4c one-pass fused-slab int8 kernel, exactly: a naive softmax
    over the same dequantized int8 logits must match to f32 tolerance, and
    the true (unquantized) attention to int8-tier tolerance."""
    import jax.numpy as jnp
    from experiments.flash_attention_int8 import LOG2E, flash_attention_int8_qk_fused

    rng = np.random.default_rng(3)
    b, n, h, d = 2, 300, 2, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    qkv = jnp.stack([q, k, v], axis=3).reshape(b, n, 3 * h * d)

    for block_q in (None, 128):
        got = np.asarray(
            flash_attention_int8_qk_fused(qkv, h, interpret=True, block_q=block_q)
        ).reshape(b, n, h, d)

        # emulate the wrapper's quantization exactly
        scale = d ** -0.5
        qf = np.asarray(q) * (scale * LOG2E)
        kf = np.asarray(k)
        sq = np.maximum(np.abs(qf).max(axis=3), 1e-12) / 127.0
        sk = np.maximum(np.abs(kf).max(axis=(1, 3)), 1e-12) / 127.0
        q_i8 = np.round(qf / sq[..., None]).astype(np.int8)
        k_i8 = np.round(kf / sk[:, None, :, None]).astype(np.int8)
        logits2 = (
            np.einsum("bnhd,bmhd->bhnm", q_i8.astype(np.float64), k_i8.astype(np.float64))
            * (sq.transpose(0, 2, 1) * sk[..., None])[..., None]
        )
        w = np.exp2(logits2 - logits2.max(axis=-1, keepdims=True))
        w /= w.sum(axis=-1, keepdims=True)
        ref_deq = np.einsum("bhnm,bmhd->bnhd", w, np.asarray(v, np.float64))
        np.testing.assert_allclose(got, ref_deq, rtol=5e-5, atol=5e-5)

        # and the int8 error vs TRUE attention stays at the tier's scale
        logits_t = np.einsum("bnhd,bmhd->bhnm", np.asarray(q, np.float64), np.asarray(k, np.float64)) * scale
        wt = np.exp(logits_t - logits_t.max(axis=-1, keepdims=True))
        wt /= wt.sum(axis=-1, keepdims=True)
        ref_true = np.einsum("bhnm,bmhd->bnhd", wt, np.asarray(v, np.float64))
        err = np.abs(got - ref_true).max()
        assert err < 0.05, f"int8-QK error vs true attention too large: {err}"
