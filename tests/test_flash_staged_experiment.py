"""Staged (k-panel) fused-qkv one-pass experiment vs the naive softmax
reference (interpret mode) + the Mosaic TPU lowering gate.

The experiment (experiments/flash_attention_staged.py) must match the
production kernel's numerics exactly — same exp2 domain, same mask-before-
max pad handling — at every (hpp, panels, block_q) the on-chip sweep
(tools/flash_tune.py --staged) measures, and must LOWER for TPU at the
serving shapes (the round-4d lesson: interpret-mode green does not imply a
Mosaic lowering exists — see tests/test_tpu_lowering.py)."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from experiments.flash_attention_staged import (
    _panel_bounds,
    flash_attention_fused_qkv_staged,
)


def _naive(q, k, v, scale=None):
    d = q.shape[-1]
    s = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * s, k).astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", w.astype(q.dtype), v)


def test_panel_bounds():
    assert _panel_bounds(1024, 1) == (0, 1024)
    assert _panel_bounds(1024, 2) == (0, 512, 1024)
    assert _panel_bounds(1280, 2) == (0, 640, 1280)
    # non-divisible: 1408/3 -> 512-wide panels, 384 remainder
    assert _panel_bounds(1408, 3) == (0, 512, 1024, 1408)
    # panels wider than n_pad collapse
    assert _panel_bounds(128, 4) == (0, 128)
    for n_pad, p in ((5504, 4), (10496, 8), (18560, 6)):
        b = _panel_bounds(n_pad, p)
        assert b[0] == 0 and b[-1] == n_pad
        assert all(x % 128 == 0 for x in b)
        assert all(b[i] < b[i + 1] for i in range(len(b) - 1))


@pytest.mark.parametrize("hpp", [None, 2, 4])
@pytest.mark.parametrize("panels", [1, 3])
def test_staged_matches_naive(hpp, panels):
    rng = np.random.default_rng(7)
    b, n, h, d = 2, 300, 4, 64  # n=300 -> n_pad 384: pad-column masking live
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    qkv = jnp.stack([q, k, v], axis=3).reshape(b, n, 3 * h * d)

    ref = np.asarray(_naive(q, k, v))
    got = np.asarray(
        flash_attention_fused_qkv_staged(
            qkv, h, hpp=hpp, panels=panels, interpret=True
        ).reshape(b, n, h, d)
    )
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("n,block_q", [(700, 256), (500, 384)])
def test_staged_q_blocked_matches_naive(n, block_q):
    """Forced q-blocking incl. a block that does not divide n_pad (extra dead
    q rows + pad-column masking together), panels cutting across the pad."""
    rng = np.random.default_rng(11)
    b, h, d = 2, 2, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    qkv = jnp.stack([q, k, v], axis=3).reshape(b, n, 3 * h * d)

    ref = np.asarray(_naive(q, k, v))
    got = np.asarray(
        flash_attention_fused_qkv_staged(
            qkv, h, block_q=block_q, panels=4, interpret=True
        ).reshape(b, n, h, d)
    )
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_staged_all_logits_negative():
    """Every real logit far below zero with pad columns present: the pad mask
    must be applied BEFORE the max (the production kernel's contract) or the
    zero-valued pad logits would win the max and underflow every real
    weight."""
    rng = np.random.default_rng(3)
    b, n, h, d = 1, 200, 2, 64
    # q strictly positive, k strictly negative -> EVERY real logit is a large
    # negative sum (~-140 natural, ~-200 in log2 domain): exp2 underflows to
    # exactly 0 if the pad columns' raw 0-logits win the max
    q = jnp.asarray(np.abs(rng.standard_normal((b, n, h, d))) + 0.5, jnp.float32) * 4.0
    k = -(jnp.asarray(np.abs(rng.standard_normal((b, n, h, d))) + 0.5, jnp.float32) * 4.0)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    qkv = jnp.stack([q, k, v], axis=3).reshape(b, n, 3 * h * d)

    ref = np.asarray(_naive(q, k, v))
    got = np.asarray(
        flash_attention_fused_qkv_staged(qkv, h, panels=2, interpret=True).reshape(
            b, n, h, d
        )
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_staged_d128_separate_l_variant():
    """D % 128 == 0 path (separate per-panel l sums, no fused ones column)."""
    rng = np.random.default_rng(5)
    b, n, h, d = 1, 260, 2, 128
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    qkv = jnp.stack([q, k, v], axis=3).reshape(b, n, 3 * h * d)

    ref = np.asarray(_naive(q, k, v))
    got = np.asarray(
        flash_attention_fused_qkv_staged(qkv, h, panels=2, interpret=True).reshape(
            b, n, h, d
        )
    )
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("hpp,panels", [(2, 4), (4, 4), (2, 8), (4, 1)])
@pytest.mark.parametrize("n", [5477, 10405])
def test_staged_lowers_for_tpu(n, hpp, panels):
    """Full Mosaic lowering (no execution) at the serving shapes the sweep
    measures — catches unimplemented primitives and block-shape violations
    interpret mode can't see."""
    qkv = jnp.zeros((1, n, 3 * 16 * 64), jnp.bfloat16)
    fn = functools.partial(
        flash_attention_fused_qkv_staged, num_heads=16, hpp=hpp, panels=panels
    )
    jax.export.export(jax.jit(fn), platforms=["tpu"])(qkv)
