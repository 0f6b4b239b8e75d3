"""End-to-end numerical parity: tiny randomly-initialized Depth-Anything
checkpoints (original format, saved as real .pt files) run through BOTH the
torch reference implementation and this framework; outputs must agree to well
under the 1e-3 abs-rel budget (BASELINE.json).

Exercises: pt_loader (torch-free .pt reading), model-type sniffing, config
inference from shapes, key conversion, and the full forward pipeline."""

import numpy as np
import pytest
import torch

from conftest import add_reference_to_path, reference_available

from muggled_dpt_tpu.checkpoints.random_init import random_original_depth_anything_state_dict
from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

TINY_CFG = {
    "features_per_token": 64,
    "num_blocks": 8,
    "num_heads": 1,
    "reassembly_features_list": [8, 16, 32, 64],
    "fusion_channels": 16,
    "patch_size_px": 14,
    "base_patch_grid_hw": (8, 8),
    "is_giant": False,
}

needs_reference = pytest.mark.skipif(not reference_available(), reason="/root/reference not mounted")


def _save_pt(sd_np: dict, path) -> str:
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}, str(path))
    return str(path)


def _abs_rel(ours: np.ndarray, ref: np.ndarray) -> float:
    scale = float(np.abs(ref).mean()) + 1e-12
    return float(np.abs(ours - ref).mean() / scale)


@pytest.fixture(scope="module")
def tiny_ckpt_path(tmp_path_factory):
    sd = random_original_depth_anything_state_dict(TINY_CFG, seed=3)
    return _save_pt(sd, tmp_path_factory.mktemp("ckpt") / "depth_anything_v2_tiny.pt")


def test_pt_loader_roundtrip(tiny_ckpt_path):
    from muggled_dpt_tpu.checkpoints.pt_loader import load_state_dict

    sd = load_state_dict(tiny_ckpt_path)
    orig = random_original_depth_anything_state_dict(TINY_CFG, seed=3)
    assert set(sd.keys()) == set(orig.keys())
    for k in orig:
        np.testing.assert_array_equal(sd[k], orig[k], err_msg=k)


def test_config_inference(tiny_ckpt_path):
    cfg, model = make_dpt_from_state_dict(tiny_ckpt_path)
    assert cfg["features_per_token"] == 64
    assert cfg["num_blocks"] == 8
    assert cfg["num_heads"] == 1
    assert cfg["reassembly_features_list"] == [8, 16, 32, 64]
    assert cfg["fusion_channels"] == 16
    assert cfg["patch_size_px"] == 14
    assert tuple(cfg["base_patch_grid_hw"]) == (8, 8)
    assert not cfg["is_giant"] and not cfg["is_metric"]


@needs_reference
@pytest.mark.parametrize("version", ["v1", "v2"])
@pytest.mark.parametrize("square,side", [(True, 56), (False, 84)])
def test_e2e_parity_vs_torch_reference(tmp_path, version, square, side):
    add_reference_to_path()
    from muggled_dpt.make_dpt import make_dpt_from_state_dict as ref_make

    sd = random_original_depth_anything_state_dict(TINY_CFG, seed=7)
    name = "depth_anything_v2_tiny.pt" if version == "v2" else "depth_anything_v1_tiny.pt"
    path = _save_pt(sd, tmp_path / name)

    rng = np.random.default_rng(11)
    image_bgr = rng.integers(0, 256, size=(93, 121, 3), dtype=np.uint8)

    ref_cfg, ref_model = ref_make(path, enable_cache=False, enable_optimizations=True)
    with torch.inference_mode():
        ref_depth = ref_model.inference(image_bgr, side, square).float().numpy()

    cfg, model = make_dpt_from_state_dict(path)
    depth = np.asarray(model.inference(image_bgr, side, square))

    assert depth.shape == ref_depth.shape
    assert _abs_rel(depth, ref_depth) < 1e-4, f"abs-rel {_abs_rel(depth, ref_depth)}"


@needs_reference
def test_forward_parity_prepared_tensor(tmp_path):
    """forward() on an externally prepared BCHW tensor (batch of 2)."""
    add_reference_to_path()
    from muggled_dpt.make_dpt import make_dpt_from_state_dict as ref_make

    sd = random_original_depth_anything_state_dict(TINY_CFG, seed=5)
    path = _save_pt(sd, tmp_path / "depth_anything_v2_tiny.pt")

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 56, 84)).astype(np.float32)

    _, ref_model = ref_make(path, enable_cache=False)
    with torch.inference_mode():
        ref_depth = ref_model(torch.from_numpy(x)).float().numpy()

    _, model = make_dpt_from_state_dict(path)
    assert model.verify_input(x)
    depth = np.asarray(model.forward(x))
    assert _abs_rel(depth, ref_depth) < 1e-4
