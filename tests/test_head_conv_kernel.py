"""Fused head-tail kernel (conv3x3+relu+1x1+act) vs the shipped ops
(interpret mode, CPU). Like pallas_fused_mlp it lives under experiments/ as a
measured negative result (999 vs 332 us on v5e at the ViT-L head shape) but
is kept correct."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from experiments.pallas_head_conv import fused_head_tail
from muggled_dpt_tpu.ops.nn import conv3x3_shiftsum, linear


@pytest.mark.parametrize("h,w,metric", [(40, 56, False), (37, 52, True)])
def test_fused_head_tail_matches_unfused(h, w, metric):
    rng = np.random.default_rng(0)
    ci, co = 16, 8
    x = jnp.asarray(rng.standard_normal((1, h, w, ci)) * 0.3, jnp.float32)
    ck = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.2, jnp.float32)
    cb = jnp.asarray(rng.standard_normal(co) * 0.2, jnp.float32)
    pk = jnp.asarray(rng.standard_normal((co, 1)) * 0.3, jnp.float32)
    pb = jnp.asarray(rng.standard_normal(1) * 0.1, jnp.float32)

    ref = jax.nn.relu(conv3x3_shiftsum(x, ck, cb))
    ref = linear(ref, pk, pb)
    ref = (jax.nn.sigmoid(ref) if metric else jax.nn.relu(ref))[..., 0]
    got = fused_head_tail(x, ck, cb, pk, pb, is_metric=metric, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_shiftsum_direct_dispatch_matches():
    """conv3x3_shiftsum's SHIFTSUM_MAX_HW fallback (direct conv at large
    spatial sizes) computes the same conv: exact same math modulo f32
    summation order (ops/nn.py:conv3x3_shiftsum)."""
    import numpy as np
    import jax.numpy as jnp
    import muggled_dpt_tpu.ops.nn as NN

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 17, 23, 24)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 24, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
    old = NN.SHIFTSUM_MAX_HW
    try:
        NN.SHIFTSUM_MAX_HW = None
        ref = np.asarray(NN.conv3x3_shiftsum(x, k, b))
        NN.SHIFTSUM_MAX_HW = 4  # force the direct-conv branch
        got = np.asarray(NN.conv3x3_shiftsum(x, k, b))
    finally:
        NN.SHIFTSUM_MAX_HW = old
    assert np.max(np.abs(ref - got)) < 1e-4
