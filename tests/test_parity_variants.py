"""Parity for the remaining Depth-Anything variants: ViT-Giant (SwiGLU MLP)
and the metric (sigmoid-head) models, plus batch invariance."""

import numpy as np
import pytest
import torch

from conftest import add_reference_to_path, reference_available

from muggled_dpt_tpu.checkpoints.random_init import (
    random_original_depth_anything_state_dict,
    swiglu_hidden,
)
from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

needs_reference = pytest.mark.skipif(not reference_available(), reason="/root/reference not mounted")

GIANT_CFG = {
    "features_per_token": 64,
    "num_blocks": 4,
    "reassembly_features_list": [8, 16, 32, 64],
    "fusion_channels": 16,
    "patch_size_px": 14,
    "base_patch_grid_hw": (8, 8),
    "is_giant": True,
}


def _save_pt(sd_np, path):
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}, str(path))
    return str(path)


def _abs_rel(ours, ref):
    return float(np.abs(ours - ref).mean() / (np.abs(ref).mean() + 1e-12))


def test_swiglu_hidden_sizing():
    # misc_helpers.py:157-168: hidden = 8*((int(4F*2/3)+7)//8)
    assert swiglu_hidden(1536) == 8 * ((int(1536 * 4 * 2 / 3) + 7) // 8)
    assert swiglu_hidden(64) == 8 * ((int(64 * 4 * 2 / 3) + 7) // 8)


@needs_reference
def test_giant_swiglu_parity(tmp_path):
    add_reference_to_path()
    from muggled_dpt.make_dpt import make_dpt_from_state_dict as ref_make

    sd = random_original_depth_anything_state_dict(GIANT_CFG, seed=31)
    path = _save_pt(sd, tmp_path / "depth_anything_v2_vitg_tiny.pt")

    rng = np.random.default_rng(5)
    image_bgr = rng.integers(0, 256, size=(90, 120, 3), dtype=np.uint8)

    ref_cfg, ref_model = ref_make(path, enable_cache=False)
    assert ref_cfg["is_giant"]
    with torch.inference_mode():
        ref_depth = ref_model.inference(image_bgr, 56, True).float().numpy()

    cfg, model = make_dpt_from_state_dict(path)
    assert cfg["is_giant"]
    depth = np.asarray(model.inference(image_bgr, 56, True))
    assert _abs_rel(depth, ref_depth) < 1e-4


@needs_reference
def test_metric_head_parity(tmp_path):
    add_reference_to_path()
    from muggled_dpt.make_dpt import make_dpt_from_state_dict as ref_make

    cfg_dict = dict(GIANT_CFG, is_giant=False)
    sd = random_original_depth_anything_state_dict(cfg_dict, seed=13)
    path = _save_pt(sd, tmp_path / "depth_anything_v2_metric_outdoor_tiny.pt")

    rng = np.random.default_rng(6)
    image_bgr = rng.integers(0, 256, size=(90, 120, 3), dtype=np.uint8)

    ref_cfg, ref_model = ref_make(path, enable_cache=False)
    assert ref_cfg["is_metric"]
    with torch.inference_mode():
        ref_depth = ref_model.inference(image_bgr, 56, True).float().numpy()

    cfg, model = make_dpt_from_state_dict(path)
    assert cfg["is_metric"]
    depth = np.asarray(model.inference(image_bgr, 56, True))
    # metric head ends in sigmoid -> outputs in (0, 1)
    assert depth.min() > 0.0 and depth.max() < 1.0
    assert _abs_rel(depth, ref_depth) < 1e-4


def test_batch_forward_consistency(tmp_path):
    """forward() on a batch equals per-image forwards (batching support the
    reference documents for direct forward use, dpt_model.py:96-99)."""
    sd = random_original_depth_anything_state_dict(dict(GIANT_CFG, is_giant=False), seed=2)
    path = _save_pt(sd, tmp_path / "depth_anything_v2_tiny.pt")
    _, model = make_dpt_from_state_dict(path)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 3, 56, 56)).astype(np.float32)
    batch_out = np.asarray(model.forward(x))
    for i in range(3):
        single = np.asarray(model.forward(x[i : i + 1]))
        np.testing.assert_allclose(batch_out[i : i + 1], single, rtol=1e-5, atol=1e-5)
