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


def test_loader_unroll_blocks_kwarg(tmp_path):
    """make_dpt_from_state_dict(unroll_blocks=True) reaches the serving-mode
    spec through the checkpoint-loading path (docs/serving.md recipe)."""
    import torch

    from muggled_dpt_tpu.checkpoints.random_init import random_original_depth_anything_state_dict
    from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

    cfg = {"features_per_token": 64, "num_blocks": 4, "reassembly_features_list": [8, 16, 32, 64],
           "fusion_channels": 16, "patch_size_px": 14, "base_patch_grid_hw": (8, 8)}
    sd = random_original_depth_anything_state_dict(cfg, seed=9)
    ckpt = str(tmp_path / "depth_anything_v2_tiny.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)

    img = np.random.default_rng(0).integers(0, 256, (120, 160, 3), np.uint8)
    _, m_scan = make_dpt_from_state_dict(ckpt)
    cfg_u, m_unroll = make_dpt_from_state_dict(ckpt, unroll_blocks=True)
    assert cfg_u.get("unroll_blocks") is True
    np.testing.assert_allclose(
        np.asarray(m_unroll.inference(img)), np.asarray(m_scan.inference(img)), rtol=1e-5, atol=1e-6
    )


def test_partial_unroll_k_matches_scan():
    """unroll_blocks=k (lax.scan(unroll=k) middle ground) is numerically the
    scan path — including k=3, which does not divide the 2-block stage
    segments of an 8-block model."""
    model = make_depthanythingv2_dpt(64, 1, 8, (8, 16, 32, 64), (8, 8), 16, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    out_scan = np.asarray(model.spec["forward"](model.params, x))
    for k in (2, 3):
        spec_k = make_family_spec(dict(model.config, unroll_blocks=k), version=2)
        out_k = np.asarray(spec_k["forward"](model.params, x))
        np.testing.assert_allclose(out_k, out_scan, rtol=1e-6, atol=1e-6, err_msg=f"unroll={k}")
