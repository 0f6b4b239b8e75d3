"""SwinV2 family: parity vs torch reference + windowing machinery unit tests."""

import numpy as np
import pytest
import torch

from conftest import add_reference_to_path, reference_available

from muggled_dpt_tpu.checkpoints.swinv2 import random_original_state_dict
from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

# Tiny config: base grid 16, window 4 -> stages see grids 16/8/4/2 with
# shifting active in stages 0-1 (grid > window) and disabled later.
TINY_CFG = {
    "features_per_stage": [16, 32, 64, 128],
    "heads_per_stage": [2, 4, 4, 8],
    "layers_per_stage": [2, 2, 4, 2],
    "base_patch_grid_hw": (16, 16),
    "window_size_hw": (4, 4),
    "pretrained_window_sizes_per_stage": [None, None, None, None],
    "fusion_channels": 16,
    "patch_size_px": 4,
}

needs_reference = pytest.mark.skipif(not reference_available(), reason="/root/reference not mounted")


def _save_pt(sd_np, path):
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}, str(path))
    return str(path)


def _abs_rel(ours, ref):
    return float(np.abs(ours - ref).mean() / (np.abs(ref).mean() + 1e-12))


@needs_reference
def test_window_plan_matches_reference():
    add_reference_to_path()
    from muggled_dpt.v31_swinv2.components.windowed_attention import adjust_window_and_shift_sizes
    from muggled_dpt_tpu.models.swinv2 import window_plan

    for grid in [(16, 16), (8, 8), (7, 9), (10, 14), (3, 3), (12, 20), (5, 25)]:
        for target in [(4, 4), (6, 6), (16, 16), (5, 5)]:
            ref_win, ref_shift = adjust_window_and_shift_sizes(grid, target)
            win, shift = window_plan(grid, target)
            assert win == tuple(ref_win) and shift == tuple(ref_shift), (grid, target)


@needs_reference
def test_shift_mask_matches_reference():
    add_reference_to_path()
    from muggled_dpt.v31_swinv2.components.windowed_attention import make_shift_mask
    from muggled_dpt_tpu.models.swinv2 import shift_mask_np

    for grid, win, shift in [((16, 16), (4, 4), (2, 2)), ((12, 20), (4, 4), (2, 2)), ((8, 8), (4, 8), (2, 4))]:
        ref = make_shift_mask(grid, win, shift).numpy()  # (nW, 1, A, A)
        ours = shift_mask_np(grid, win, shift)  # (nW, A, A)
        np.testing.assert_array_equal(ours, ref[:, 0])


@needs_reference
def test_cpb_bias_matches_reference():
    add_reference_to_path()
    from muggled_dpt.v31_swinv2.components.relative_positional_encoder import RelativePositionEncoding
    from muggled_dpt_tpu.models.swinv2 import cpb_bias
    from muggled_dpt_tpu.checkpoints.convert_common import t_linear, t_vec

    heads, win = 3, (4, 6)
    ref_mod = RelativePositionEncoding(heads, pretrained_window_size=8)
    sd = ref_mod.state_dict()
    bp = {
        "cpb0_kernel": t_linear(sd["bias_mlp.0.weight"].numpy()),
        "cpb0_bias": t_vec(sd["bias_mlp.0.bias"].numpy()),
        "cpb1_kernel": t_linear(sd["bias_mlp.2.weight"].numpy()),
    }
    with torch.no_grad():
        ref_bias = ref_mod._get_position_bias(win).numpy()  # (1, H, A, A)
    ours = np.asarray(cpb_bias(bp, win, 8))
    np.testing.assert_allclose(ours, ref_bias[0], rtol=1e-4, atol=1e-5)


def test_cpb_cache_matches_uncached(tmp_path):
    """The per-grid CPB cache (make_aux / compute_cpb_stack) must be
    numerically identical to the in-scan per-forward CPB computation."""
    sd = random_original_state_dict(TINY_CFG, seed=5)
    path = _save_pt(sd, tmp_path / "swin2_tiny_256.pt")
    rng = np.random.default_rng(3)
    image_bgr = rng.integers(0, 256, size=(130, 170, 3), dtype=np.uint8)

    _, model = make_dpt_from_state_dict(path)
    assert model.spec.get("make_aux") is not None
    model.config["enable_cache"] = True
    cached = np.asarray(model.inference(image_bgr, 96, False))
    assert model._aux_cache, "cache should have been populated"
    model.config["enable_cache"] = False
    uncached = np.asarray(model.inference(image_bgr, 96, False))
    np.testing.assert_allclose(cached, uncached, rtol=1e-5, atol=1e-6)


@needs_reference
@pytest.mark.parametrize("square,side", [(True, 64), (False, 96)])
def test_e2e_parity_vs_torch_reference(tmp_path, square, side):
    add_reference_to_path()
    from muggled_dpt.make_dpt import make_dpt_from_state_dict as ref_make

    sd = random_original_state_dict(TINY_CFG, seed=21)
    path = _save_pt(sd, tmp_path / "swin2_tiny_256.pt")

    rng = np.random.default_rng(17)
    image_bgr = rng.integers(0, 256, size=(150, 110, 3), dtype=np.uint8)

    ref_cfg, ref_model = ref_make(path, enable_cache=True, enable_optimizations=True)
    with torch.inference_mode():
        ref_depth = ref_model.inference(image_bgr, side, square).float().numpy()

    cfg, model = make_dpt_from_state_dict(path)
    assert cfg["heads_per_stage"] == [2, 4, 4, 8]
    assert tuple(cfg["window_size_hw"]) == (4, 4)
    assert tuple(cfg["base_patch_grid_hw"]) == (16, 16)
    depth = np.asarray(model.inference(image_bgr, side, square))

    assert depth.shape == ref_depth.shape
    assert _abs_rel(depth, ref_depth) < 1e-4, f"abs-rel {_abs_rel(depth, ref_depth)}"
