"""Fused SwinV2 window-attention kernel vs the einsum reference
(interpret mode, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from muggled_dpt_tpu.ops.pallas.window_attention import window_flash_attention


def _einsum_ref(q_scaled, k_norm, v, cpb, mask):
    logits = jnp.einsum("bwnhd,bwmhd->bwhnm", q_scaled.astype(jnp.float32), k_norm.astype(jnp.float32))
    logits = logits + cpb[None, None]
    if mask is not None:
        logits = logits + mask[None, :, None, :, :]
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bwhnm,bwmhd->bwnhd", w.astype(v.dtype), v)


@pytest.mark.parametrize("area", [16, 36, 150])  # incl. non-128-multiple padding
@pytest.mark.parametrize("with_mask", [False, True])
def test_window_kernel_matches_einsum(area, with_mask):
    rng = np.random.default_rng(0)
    b, nw, h, d = 2, 4, 3, 32
    q = jnp.asarray(rng.standard_normal((b, nw, area, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nw, area, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nw, area, h, d)), jnp.float32)
    cpb = jnp.asarray(rng.standard_normal((h, area, area)), jnp.float32)
    mask = None
    if with_mask:
        mask = jnp.asarray(rng.choice([0.0, -100.0], size=(nw, area, area)).astype(np.float32))

    ref = np.asarray(_einsum_ref(q, k, v, cpb, mask))
    got = np.asarray(window_flash_attention(q, k, v, cpb, mask, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_window_count_dispatch_gate(monkeypatch):
    """Round-5 A/B fold (tools/window_ab.py): with impl="pallas", the kernel
    dispatches only at many-window stages (nW >= 8, where it measured
    2.1-2.2x faster); few-window stages keep the XLA einsum composite
    (kernel measured 2-5x slower at nW <= 4)."""
    from muggled_dpt_tpu.models import swinv2 as sw
    from muggled_dpt_tpu.ops.pallas import window_attention as wa

    calls = []
    monkeypatch.setattr(wa, "window_flash_available", lambda: True)
    monkeypatch.setattr(
        wa, "window_flash_attention",
        lambda q, k, v, cpb, mask=None: calls.append(q.shape) or _einsum_ref(
            q.astype(jnp.float32), k.astype(jnp.float32), v, cpb.astype(jnp.float32),
            None if mask is None else mask.astype(jnp.float32),
        ).astype(v.dtype),
    )

    rng = np.random.default_rng(0)
    h, d, win = 2, 64, 4
    c = h * d
    bp = {
        "qkv_kernel": jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.float32),
        "q_bias": jnp.zeros((c,), jnp.float32),
        "v_bias": jnp.zeros((c,), jnp.float32),
        "logit_scale": jnp.ones((h,), jnp.float32),
        "proj_kernel": jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32),
        "proj_bias": jnp.zeros((c,), jnp.float32),
        "_pretrained_window_size": win,
        "cpb0_kernel": jnp.asarray(rng.standard_normal((2, 64)) * 0.1, jnp.float32),
        "cpb0_bias": jnp.zeros((64,), jnp.float32),
        "cpb1_kernel": jnp.asarray(rng.standard_normal((64, h)) * 0.1, jnp.float32),
    }

    # 16 windows (grid 16x16, window 4) -> kernel used
    x16 = jnp.asarray(rng.standard_normal((1, 16, 16, c)), jnp.float32)
    sw.window_attention(x16, bp, h, (16, 16), (win, win), False, impl="pallas")
    assert len(calls) == 1, "nW=16 must dispatch the fused kernel"

    # 4 windows (grid 8x8, window 4) -> XLA composite
    x4 = jnp.asarray(rng.standard_normal((1, 8, 8, c)), jnp.float32)
    sw.window_attention(x4, bp, h, (8, 8), (win, win), False, impl="pallas")
    assert len(calls) == 1, "nW=4 must stay on the XLA einsum path"

    # the gate is on b*nW (the kernel's grid is b*nW*heads): the same
    # 4-window stage at batch 8 has 32 programs of parallelism -> kernel
    x4b = jnp.asarray(rng.standard_normal((8, 8, 8, c)), jnp.float32)
    sw.window_attention(x4b, bp, h, (8, 8), (win, win), False, impl="pallas")
    assert len(calls) == 2, "B=8 x nW=4 must dispatch the fused kernel"

    # batch alone below the product threshold stays on XLA (B=4, nW=1)
    x1b = jnp.asarray(rng.standard_normal((4, 4, 4, c)), jnp.float32)
    sw.window_attention(x1b, bp, h, (4, 4), (win, win), False, impl="pallas")
    assert len(calls) == 2, "B=4 x nW=1 must stay on the XLA einsum path"
