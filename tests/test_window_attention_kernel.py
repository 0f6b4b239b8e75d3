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
