"""Fused LN->MLP->LayerScale-residual kernel vs the unfused ops
(interpret mode, CPU). The kernel lives under experiments/ (not the shipped
package) because XLA's own fusion measured faster on v5e at model shapes;
this test keeps the measured-negative-result artifact correct."""

import numpy as np
import jax.numpy as jnp

from experiments.pallas_fused_mlp import fused_ln_mlp_residual
from muggled_dpt_tpu.ops.nn import layer_norm, mlp_gelu


def test_fused_mlp_matches_unfused():
    rng = np.random.default_rng(0)
    b, n, f, h = 2, 100, 64, 256
    x = jnp.asarray(rng.standard_normal((b, n, f)), jnp.float32)
    p = {
        "fc1_kernel": jnp.asarray(rng.standard_normal((f, h)) * 0.05, jnp.float32),
        "fc1_bias": jnp.asarray(rng.standard_normal(h) * 0.05, jnp.float32),
        "fc2_kernel": jnp.asarray(rng.standard_normal((h, f)) * 0.05, jnp.float32),
        "fc2_bias": jnp.asarray(rng.standard_normal(f) * 0.05, jnp.float32),
    }
    g = jnp.asarray(1 + rng.standard_normal(f) * 0.05, jnp.float32)
    bb = jnp.asarray(rng.standard_normal(f) * 0.05, jnp.float32)
    ls = jnp.asarray(1 + rng.standard_normal(f) * 0.05, jnp.float32)

    ref = x + ls * mlp_gelu(layer_norm(x, g, bb), p)
    got = fused_ln_mlp_residual(
        x, g, bb, p["fc1_kernel"], p["fc1_bias"], p["fc2_kernel"], p["fc2_bias"], ls,
        block_rows=64, block_hidden=128, interpret=True,
    )
    # poly-erf gelu differs from exact erf by ~1.5e-7 relative
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)
