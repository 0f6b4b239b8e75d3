"""XL fused-qkv one-pass variants (experiments/flash_attention_xl.py) vs the
naive softmax reference (interpret mode) + the Mosaic TPU lowering gate.

The variants must match the production kernel's numerics exactly — same exp2
domain, mask-before-max pad handling, fused-l ones column — at every
(hpp, qp, pipelined, block_q) the on-chip sweep (tools/flash_tune.py --xl)
measures, and must LOWER for TPU at the XL serving shapes (round-4d lesson:
interpret-mode green does not imply a Mosaic lowering exists)."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from experiments.flash_attention_xl import flash_attention_fused_qkv_xl


def _naive(q, k, v, scale=None):
    d = q.shape[-1]
    s = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * s, k).astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", w.astype(q.dtype), v)


def _mk(rng, b, n, h, d):
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    return q, k, v, jnp.stack([q, k, v], axis=3).reshape(b, n, 3 * h * d)


@pytest.mark.parametrize("pipelined", [False, True])
@pytest.mark.parametrize("qp", [1, 2])
def test_xl_matches_naive(pipelined, qp):
    # n=700, block_q=256 -> n_pad_q 768 (qp=1) / 1024 (qp=2): dead q rows,
    # pad-column masking, and (qp=2) a sub-block straddling the pad all live
    rng = np.random.default_rng(7)
    b, n, h, d = 2, 700, 4, 64
    q, k, v, qkv = _mk(rng, b, n, h, d)
    ref = np.asarray(_naive(q, k, v))
    got = np.asarray(
        flash_attention_fused_qkv_xl(
            qkv, h, block_q=256, qp=qp, pipelined=pipelined, interpret=True
        ).reshape(b, n, h, d)
    )
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_xl_hpp_override_matches_naive():
    rng = np.random.default_rng(9)
    b, n, h, d = 1, 500, 8, 64
    q, k, v, qkv = _mk(rng, b, n, h, d)
    ref = np.asarray(_naive(q, k, v))
    got = np.asarray(
        flash_attention_fused_qkv_xl(
            qkv, h, hpp=4, block_q=256, pipelined=True, interpret=True
        ).reshape(b, n, h, d)
    )
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_xl_all_logits_negative():
    """Pad mask applied BEFORE the max (production contract): every real
    logit far below zero must not underflow against the pad columns' raw
    zeros (see tests/test_flash_attention.py::test_flash_all_logits_negative)."""
    rng = np.random.default_rng(3)
    b, n, h, d = 1, 200, 2, 64
    q = jnp.asarray(np.abs(rng.standard_normal((b, n, h, d))) + 0.5, jnp.float32) * 4.0
    k = -(jnp.asarray(np.abs(rng.standard_normal((b, n, h, d))) + 0.5, jnp.float32) * 4.0)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    qkv = jnp.stack([q, k, v], axis=3).reshape(b, n, 3 * h * d)
    ref = np.asarray(_naive(q, k, v))
    got = np.asarray(
        flash_attention_fused_qkv_xl(
            qkv, h, block_q=128, qp=2, pipelined=True, interpret=True
        ).reshape(b, n, h, d)
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_xl_ablation_runs():
    """The no-softmax ablation is a TIMING floor, not a numeric path — just
    pin that it executes and returns finite values at the variant shapes."""
    rng = np.random.default_rng(5)
    b, n, h, d = 1, 300, 2, 64
    _, _, _, qkv = _mk(rng, b, n, h, d)
    got = np.asarray(
        flash_attention_fused_qkv_xl(
            qkv, h, block_q=128, ablate_softmax=True, interpret=True
        )
    )
    assert got.shape == (b, n, h * d) and np.isfinite(got).all()


@pytest.mark.parametrize(
    "n,qp,pipelined",
    [
        (10405, 1, True),  # 1428^2 serving shape
        (18497, 2, True),  # 1904^2, paired q-sub-blocks
        (18497, 1, False),  # anchor structure
    ],
)
def test_xl_lowers_for_tpu(n, qp, pipelined):
    """Full Mosaic lowering at the XL serving shapes (no execution)."""
    qkv = jnp.zeros((1, n, 3 * 16 * 64), jnp.bfloat16)
    fn = functools.partial(
        flash_attention_fused_qkv_xl, num_heads=16, qp=qp, pipelined=pipelined
    )
    jax.export.export(jax.jit(fn), platforms=["tpu"])(qkv)
