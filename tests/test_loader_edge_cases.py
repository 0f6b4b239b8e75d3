"""pt_loader edge cases: dtypes (f16/bf16/i64), nested wrappers,
non-contiguous tensors, scalars; plus the no-optimizations model path."""

import numpy as np
import pytest
import torch

from muggled_dpt_tpu.checkpoints.pt_loader import load_pt, load_state_dict


def test_dtypes_roundtrip(tmp_path):
    t16 = torch.arange(12, dtype=torch.float16).reshape(3, 4)
    tb16 = torch.arange(12, dtype=torch.bfloat16).reshape(4, 3) / 7
    ti = torch.arange(5, dtype=torch.int64)
    tb = torch.tensor([True, False, True])
    path = str(tmp_path / "dtypes.pt")
    torch.save({"f16": t16, "bf16": tb16, "i64": ti, "bool": tb}, path)
    sd = load_pt(path)
    np.testing.assert_array_equal(sd["f16"], t16.numpy())
    np.testing.assert_array_equal(np.asarray(sd["bf16"], np.float32), tb16.float().numpy())
    np.testing.assert_array_equal(sd["i64"], ti.numpy())
    np.testing.assert_array_equal(sd["bool"], tb.numpy())


def test_noncontiguous_and_scalar(tmp_path):
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    view = base.t()  # non-contiguous stride
    scalar = torch.tensor(3.5)
    path = str(tmp_path / "views.pt")
    torch.save({"t": view, "s": scalar}, path)
    sd = load_pt(path)
    np.testing.assert_array_equal(sd["t"], view.numpy())
    assert float(sd["s"]) == 3.5


def test_nested_model_wrapper(tmp_path):
    inner = {"pretrained.cls_token": torch.zeros(1, 1, 4)}
    path = str(tmp_path / "wrapped.pt")
    torch.save({"model": inner}, path)
    sd = load_state_dict(path)
    assert "pretrained.cls_token" in sd


def test_no_optimizations_path_matches(tmp_path):
    """enable_optimizations=False (naive/hookable attention) must produce the
    same outputs as the optimized path (reference transformer_block.py:37-39)."""
    from muggled_dpt_tpu.checkpoints.random_init import random_original_depth_anything_state_dict
    from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

    cfg = {
        "features_per_token": 64, "num_blocks": 4, "reassembly_features_list": [8, 16, 32, 64],
        "fusion_channels": 16, "patch_size_px": 14, "base_patch_grid_hw": (8, 8),
    }
    sd = random_original_depth_anything_state_dict(cfg, seed=6)
    path = str(tmp_path / "depth_anything_v2_t.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    _, m_opt = make_dpt_from_state_dict(path, enable_optimizations=True)
    _, m_naive = make_dpt_from_state_dict(path, enable_optimizations=False)
    x = np.random.default_rng(0).standard_normal((1, 3, 56, 56)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(m_opt.forward(x)), np.asarray(m_naive.forward(x)), rtol=1e-5, atol=1e-5
    )


def test_safetensors_checkpoint(tmp_path):
    """.safetensors checkpoints load through the same auto-loader path."""
    from safetensors.numpy import save_file
    from muggled_dpt_tpu.checkpoints.random_init import random_original_depth_anything_state_dict
    from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

    cfg = {
        "features_per_token": 64, "num_blocks": 4, "reassembly_features_list": [8, 16, 32, 64],
        "fusion_channels": 16, "patch_size_px": 14, "base_patch_grid_hw": (8, 8),
    }
    sd = random_original_depth_anything_state_dict(cfg, seed=1)
    path = str(tmp_path / "depth_anything_v2_tiny.safetensors")
    save_file(sd, path)
    config, model = make_dpt_from_state_dict(path)
    assert config["features_per_token"] == 64
    depth = np.asarray(model.inference(np.zeros((120, 160, 3), np.uint8)))
    assert depth.shape == (1, 112, 112)


def test_truncated_checkpoint_raises_cleanly(tmp_path):
    """A corrupted/truncated .pt must fail with a real exception (not hang or
    return garbage); the zip path and the legacy fallback both get exercised."""
    import pytest

    from muggled_dpt_tpu.checkpoints.pt_loader import load_state_dict

    sd = {"pretrained.cls_token": torch.zeros(1, 1, 8)}
    good = tmp_path / "ok.pt"
    torch.save(sd, str(good))
    raw = good.read_bytes()

    truncated = tmp_path / "truncated.pt"
    truncated.write_bytes(raw[: len(raw) // 2])
    with pytest.raises(Exception):
        load_state_dict(str(truncated))

    garbage = tmp_path / "garbage.pt"
    garbage.write_bytes(b"\x00" * 256)
    with pytest.raises(Exception):
        load_state_dict(str(garbage))


def test_wrong_family_weights_raise_on_strict_load(tmp_path):
    """Forcing the wrong family (model_type override) onto a checkpoint must
    raise from config inference / strict conversion, not build a broken model."""
    import pytest

    from muggled_dpt_tpu.checkpoints.random_init import random_original_depth_anything_state_dict
    from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

    cfg = {"features_per_token": 64, "num_blocks": 4, "reassembly_features_list": [8, 16, 32, 64],
           "fusion_channels": 16, "patch_size_px": 14, "base_patch_grid_hw": (8, 8)}
    sd = random_original_depth_anything_state_dict(cfg, seed=1)
    ckpt = tmp_path / "depth_anything_v2_tiny.pt"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(ckpt))

    with pytest.raises(Exception):
        make_dpt_from_state_dict(str(ckpt), model_type="beit")


def test_unknown_model_type_message(tmp_path):
    """An unrecognizable checkpoint reports the accepted types (reference
    make_dpt.py behavior) instead of a KeyError deep in conversion."""
    import pytest

    from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

    ckpt = tmp_path / "mystery.pt"
    torch.save({"some.unrelated.key": torch.zeros(3)}, str(ckpt))
    with pytest.raises(NotImplementedError, match="model type"):
        make_dpt_from_state_dict(str(ckpt))
