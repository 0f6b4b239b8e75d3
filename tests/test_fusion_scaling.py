"""Fusion-scaling experiment regression: the head upsample factor must come
from the family spec (P/8 for Depth-Anything, MiDaS-fixed 2.0 for BEiT and
SwinV2 — v31_swinv2/head_model.py:43), and the experiment output must match
full-pipeline inference for every family."""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
import torch

from conftest import REPO_ROOT

from muggled_dpt_tpu.make_beit_dpt import make_beit_dpt
from muggled_dpt_tpu.make_depthanythingv1_dpt import make_depthanythingv1_dpt
from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt
from muggled_dpt_tpu.make_swinv2_dpt import make_swinv2_dpt
from muggled_dpt_tpu.models import dpt_neck


def _tiny_models():
    return {
        "da_v2": make_depthanythingv2_dpt(64, 1, 4, (8, 16, 32, 64), (8, 8), 16),
        "da_v1": make_depthanythingv1_dpt(64, 1, 4, (8, 16, 32, 64), (8, 8), 16),
        "beit": make_beit_dpt(
            features_per_token=32, num_heads=2, num_blocks=4,
            reassembly_features_list=(8, 16, 24, 32), base_patch_grid_hw=(8, 8), fusion_channels=16,
        ),
        "swinv2": make_swinv2_dpt(
            features_per_stage=(16, 32, 64, 128), heads_per_stage=(2, 4, 4, 8),
            layers_per_stage=(2, 2, 2, 2), window_size_hw=(4, 4),
            pretrained_window_sizes_per_stage=(None,) * 4,
            base_patch_grid_hw=(16, 16), fusion_channels=16,
        ),
    }


EXPECTED_HEAD_UPSAMPLE = {"da_v2": 14 / 8, "da_v1": 14 / 8, "beit": 2.0, "swinv2": 2.0}


@pytest.mark.parametrize("family", ["da_v2", "da_v1", "beit", "swinv2"])
def test_spec_head_upsample_and_manual_fusion_shape(family):
    model = _tiny_models()[family]
    assert model.spec["head_upsample"] == EXPECTED_HEAD_UPSAMPLE[family]

    # manual fusion+head (what fusion_scaling.py does) must reproduce the
    # full-pipeline output exactly at unit scales
    rng = np.random.default_rng(0)
    image_bgr = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    image_bchw = model.prepare_image_bgr(image_bgr)
    depth_full = np.asarray(model.forward(image_bchw))

    _, internals = model.forward_with_internals(image_bchw)
    maps = internals["reassembly_maps"]
    fused = dpt_neck.fusion_forward(maps, model.params["fusion"], input_scales=(1.0, 1.0, 1.0, 1.0))
    depth_manual = np.asarray(
        dpt_neck.head_forward(fused, model.params["head"], model.spec["head_upsample"], False)
    )
    assert depth_manual.shape == depth_full.shape
    np.testing.assert_allclose(depth_manual, depth_full, rtol=1e-5, atol=1e-6)


def test_fusion_scaling_script_swinv2(tmp_path):
    """End-to-end: the experiment script itself on a SwinV2 checkpoint (the
    family where patch_size_px/8 would have produced a wrong 0.5x head)."""
    from muggled_dpt_tpu.checkpoints.swinv2 import random_original_state_dict

    cfg = {
        "features_per_stage": [16, 32, 64, 128],
        "heads_per_stage": [2, 4, 4, 8],
        "layers_per_stage": [2, 2, 2, 2],
        "base_patch_grid_hw": (16, 16),
        "window_size_hw": (4, 4),
        "pretrained_window_sizes_per_stage": [None] * 4,
        "fusion_channels": 16,
        "patch_size_px": 4,
    }
    sd = random_original_state_dict(cfg, seed=9)
    ckpt = str(tmp_path / "swin2_tiny_256.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, ckpt)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, osp.join(REPO_ROOT, "experiments", "fusion_scaling.py"),
         "-m", ckpt, "-f", "1,1,1,1", "-o", str(tmp_path / "out")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "scales=" in r.stdout
