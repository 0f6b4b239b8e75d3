"""BEiT family: parity vs torch reference + relpos machinery unit tests."""

import numpy as np
import pytest
import torch

from conftest import add_reference_to_path, reference_available

from muggled_dpt_tpu.checkpoints.beit import random_original_state_dict
from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

TINY_CFG = {
    "features_per_token": 64,
    "num_blocks": 8,
    "num_heads": 4,
    "reassembly_features_list": [8, 16, 32, 64],
    "fusion_channels": 16,
    "patch_size_px": 16,
    "base_patch_grid_hw": (6, 6),
}

needs_reference = pytest.mark.skipif(not reference_available(), reason="/root/reference not mounted")


def _save_pt(sd_np, path):
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}, str(path))
    return str(path)


def _abs_rel(ours, ref):
    return float(np.abs(ours - ref).mean() / (np.abs(ref).mean() + 1e-12))


def test_relative_position_index_matches_reference_doc():
    """The documented example for a 2x3 grid (relative_positional_encoder.py:229-236)."""
    from muggled_dpt_tpu.models.beit import relative_position_index

    expected = np.array(
        [
            [17, 15, 15, 15, 15, 15, 15],
            [16, 7, 6, 5, 2, 1, 0],
            [16, 8, 7, 6, 3, 2, 1],
            [16, 9, 8, 7, 4, 3, 2],
            [16, 12, 11, 10, 7, 6, 5],
            [16, 13, 12, 11, 8, 7, 6],
            [16, 14, 13, 12, 9, 8, 7],
        ],
        dtype=np.int32,
    )
    np.testing.assert_array_equal(relative_position_index((2, 3)), expected)


@needs_reference
def test_bias_stack_matches_reference():
    add_reference_to_path()
    from muggled_dpt.v31_beit.components.relative_positional_encoder import RelativePositionEncoding
    from muggled_dpt_tpu.models.beit import compute_bias_stack

    heads, base_grid, grid = 4, (6, 6), (4, 5)
    lut_len = (2 * 6 - 1) ** 2 + 3
    rng = np.random.default_rng(0)
    lut = rng.standard_normal((lut_len, heads)).astype(np.float32)

    ref_mod = RelativePositionEncoding(heads, base_grid)
    with torch.no_grad():
        ref_mod.ref_bias_lut.copy_(torch.from_numpy(lut))
        ref_bias = ref_mod._generate_position_bias_lut(grid).numpy()  # (1, H, N, N)

    ours = np.asarray(compute_bias_stack(np.stack([lut]), base_grid, grid))  # (1, H, N, N)
    np.testing.assert_allclose(ours, ref_bias, rtol=1e-5, atol=1e-5)


@needs_reference
@pytest.mark.parametrize("enable_cache", [True, False])
def test_e2e_parity_vs_torch_reference(tmp_path, enable_cache):
    add_reference_to_path()
    from muggled_dpt.make_dpt import make_dpt_from_state_dict as ref_make

    sd = random_original_state_dict(TINY_CFG, seed=9)
    path = _save_pt(sd, tmp_path / "beit_tiny_512.pt")

    rng = np.random.default_rng(13)
    image_bgr = rng.integers(0, 256, size=(120, 98, 3), dtype=np.uint8)

    ref_cfg, ref_model = ref_make(path, enable_cache=enable_cache, enable_optimizations=True)
    with torch.inference_mode():
        ref_depth = ref_model.inference(image_bgr, 96, True).float().numpy()

    cfg, model = make_dpt_from_state_dict(path)
    model.config["enable_cache"] = enable_cache
    assert cfg["num_heads"] == 4 and tuple(cfg["base_patch_grid_hw"]) == (6, 6)
    depth = np.asarray(model.inference(image_bgr, 96, True))

    assert depth.shape == ref_depth.shape
    assert _abs_rel(depth, ref_depth) < 1e-4, f"abs-rel {_abs_rel(depth, ref_depth)}"


def test_bias_toeplitz_expansion_matches_gather():
    """compute_bias_stack's one-hot selection matmuls must reproduce the
    direct LUT[index] gather bit-exactly (one-hot rows: each output element
    is 1.0 * value + zeros — exact in f32), including rectangular grids and
    LUT rescales."""
    import jax.numpy as jnp

    from muggled_dpt_tpu.models.beit import compute_bias_stack, relative_position_index
    from muggled_dpt_tpu.ops.resize import resize_2d

    rng = np.random.default_rng(0)
    for (bh, bw), (gh, gw) in [((6, 6), (6, 6)), ((6, 6), (9, 7)), ((4, 4), (5, 5))]:
        L, H = 3, 2
        ref_h, ref_w = 2 * bh - 1, 2 * bw - 1
        lut = jnp.asarray(rng.standard_normal((L, ref_h * ref_w + 3, H)), jnp.float32)
        got = np.asarray(compute_bias_stack(lut, (bh, bw), (gh, gw)))

        new_h, new_w = 2 * gh - 1, 2 * gw - 1
        tl = np.asarray(lut)[:, : ref_h * ref_w, :].reshape(L, ref_h, ref_w, H)
        if (new_h, new_w) != (ref_h, ref_w):
            tl = np.asarray(resize_2d(jnp.asarray(tl), (new_h, new_w), mode="bilinear", align_corners=False))
        full = np.concatenate([tl.reshape(L, new_h * new_w, H), np.asarray(lut)[:, ref_h * ref_w :, :]], axis=1)
        idx = relative_position_index((gh, gw))
        n = idx.shape[0]
        ref = full[:, idx.reshape(-1), :].reshape(L, n, n, H).transpose(0, 3, 1, 2)
        np.testing.assert_array_equal(got, ref.astype(np.float32), err_msg=f"{(bh,bw)}->{(gh,gw)}")
