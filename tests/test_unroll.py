"""Unrolled-blocks serving mode matches the scan path exactly."""

import numpy as np
import jax.numpy as jnp

from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt
from muggled_dpt_tpu.models.depth_anything import make_family_spec


def test_unroll_matches_scan():
    model = make_depthanythingv2_dpt(64, 1, 8, (8, 16, 32, 64), (8, 8), 16, dtype=jnp.float32)
    cfg_unrolled = dict(model.config, unroll_blocks=True)
    spec_unrolled = make_family_spec(cfg_unrolled, version=2)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    out_scan = np.asarray(model.spec["forward"](model.params, x))
    out_unrolled = np.asarray(spec_unrolled["forward"](model.params, x))
    np.testing.assert_allclose(out_unrolled, out_scan, rtol=1e-6, atol=1e-6)
