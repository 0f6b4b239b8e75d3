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
