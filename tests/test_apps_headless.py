"""Smoke tests: the demo apps run end-to-end headless on the CPU backend."""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
import torch
import cv2

from conftest import REPO_ROOT

from muggled_dpt_tpu.checkpoints.random_init import random_original_depth_anything_state_dict

TINY = {
    "features_per_token": 64,
    "num_blocks": 4,
    "reassembly_features_list": [8, 16, 32, 64],
    "fusion_channels": 16,
    "patch_size_px": 14,
    "base_patch_grid_hw": (8, 8),
}


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("apps")
    sd = random_original_depth_anything_state_dict(TINY, seed=4)
    ckpt = str(d / "depth_anything_v2_tiny.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    img = np.random.default_rng(0).integers(0, 256, (120, 160, 3), dtype=np.uint8)
    img_path = str(d / "img.png")
    cv2.imwrite(img_path, img)
    vid_path = str(d / "vid.mp4")
    vw = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 120))
    for t in range(8):
        vw.write(np.roll(img, 5 * t, axis=1))
    vw.release()
    return {"ckpt": ckpt, "img": img_path, "vid": vid_path, "dir": str(d)}


def _run(args, cwd, timeout=300):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout
    )


def test_run_image_headless(fixtures):
    r = _run(
        [osp.join(REPO_ROOT, "run_image.py"), "-m", fixtures["ckpt"], "-i", fixtures["img"],
         "--headless", "-d", "cpu", "-f32"],
        cwd=fixtures["dir"],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Saved:" in r.stdout
    saved = os.listdir(osp.join(fixtures["dir"], "saved_results"))
    assert any(f.endswith("_raw.npy") for f in saved)


def test_run_video_headless(fixtures):
    r = _run(
        [osp.join(REPO_ROOT, "run_video.py"), "-m", fixtures["ckpt"], "-i", fixtures["vid"],
         "--headless", "--max_frames", "10", "-sync", "-d", "cpu", "-f32",
         # display_ms / no_cache / recording / headless-crop (no persisted
         # crop in history -> warn and skip, never open a UI)
         "-t", "5", "-nc", "-r", "--crop"],
        cwd=fixtures["dir"],
    )
    assert r.returncode == 0, r.stderr[-2000:]


def test_simple_example(fixtures):
    r = _run(
        [osp.join(REPO_ROOT, "simple_examples", "depth_prediction.py"), "-m", fixtures["ckpt"],
         "-i", fixtures["img"], "--no_display"],
        cwd=fixtures["dir"],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Inverse depth shape" in r.stdout


def test_experiments_headless(fixtures):
    """attention/block-norm explorers keep a batch --headless mode for CI."""
    for script, marker in (
        ("attention_visualization.py", "row/column attention"),
        ("block_norm_visualization.py", "per-block norm maps"),
    ):
        r = _run(
            [osp.join(REPO_ROOT, "experiments", script), "-m", fixtures["ckpt"],
             "-i", fixtures["img"], "--headless"],
            cwd=fixtures["dir"],
        )
        assert r.returncode == 0, (script, r.stderr[-2000:])
        assert marker in r.stdout, (script, r.stdout[-500:])


def test_internal_features_example(fixtures):
    """The 'executable shape spec' example runs all five components manually."""
    r = _run(
        [osp.join(REPO_ROOT, "simple_examples", "internal_features.py"), "-m", fixtures["ckpt"]],
        cwd=fixtures["dir"],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "depth" in r.stdout.lower()


def test_run_image_headless_beit_and_swinv2(fixtures, tmp_path):
    """The app surface works for the MiDaS families too (auto-loader sniffing
    included): tiny original-format checkpoints through run_image."""
    from muggled_dpt_tpu.checkpoints.beit import random_original_state_dict as beit_sd
    from muggled_dpt_tpu.checkpoints.swinv2 import random_original_state_dict as swin_sd

    beit_cfg = {"features_per_token": 64, "num_blocks": 8, "num_heads": 4,
                "reassembly_features_list": [8, 16, 32, 64], "fusion_channels": 16,
                "patch_size_px": 16, "base_patch_grid_hw": (6, 6)}
    swin_cfg = {"features_per_stage": [16, 32, 64, 128], "heads_per_stage": [2, 4, 4, 8],
                "layers_per_stage": [2, 2, 4, 2], "base_patch_grid_hw": (16, 16),
                "window_size_hw": (4, 4), "pretrained_window_sizes_per_stage": [None] * 4,
                "fusion_channels": 16, "patch_size_px": 4}
    for name, sd in (("dpt_beit_tiny_512.pt", beit_sd(beit_cfg, seed=3)),
                     ("dpt_swin2_tiny_256.pt", swin_sd(swin_cfg, seed=3))):
        ckpt = str(tmp_path / name)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
        r = _run(
            [osp.join(REPO_ROOT, "run_image.py"), "-m", ckpt, "-i", fixtures["img"],
             "--headless", "-d", "cpu", "-f32"],
            cwd=str(tmp_path),
        )
        assert r.returncode == 0, (name, r.stderr[-2000:])
        assert "Saved:" in r.stdout, name


def test_run_batch_folder_data_parallel(fixtures):
    """run_batch.py processes a folder over a 2-device virtual CPU data mesh,
    writing u16/npy/color outputs for every image (padded final batch)."""
    d = fixtures["dir"]
    frames_dir = osp.join(d, "batch_frames")
    os.makedirs(frames_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(3):  # 3 frames over batch=2 -> exercises the padded flush
        cv2.imwrite(osp.join(frames_dir, f"in_{i}.png"), rng.integers(0, 256, (120, 160, 3), dtype=np.uint8))

    out_dir = osp.join(d, "batch_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="--xla_force_host_platform_device_count=2")
    r = subprocess.run(
        [sys.executable, osp.join(REPO_ROOT, "run_batch.py"), "-m", fixtures["ckpt"], "-i", frames_dir,
         "-o", out_dir, "-dp", "2", "-f32", "--save", "u16,npy,color", "--unroll", "2"],
        cwd=d, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Done: 3 frames" in r.stdout
    assert "batch per step: 2" in r.stdout  # -dp 2 means a 2-wide DATA axis
    saved = sorted(os.listdir(out_dir))
    for i in range(3):
        assert f"in_{i}.png" in saved and f"in_{i}.npy" in saved and f"in_{i}_color.png" in saved
    u16 = cv2.imread(osp.join(out_dir, "in_0.png"), cv2.IMREAD_UNCHANGED)
    assert u16.dtype == np.uint16 and u16.max() == 65535
    # frames differ -> depths must differ (no padded-output mixups)
    a = np.load(osp.join(out_dir, "in_0.npy"))
    b = np.load(osp.join(out_dir, "in_1.npy"))
    assert a.shape == b.shape and not np.allclose(a, b)


def test_run_batch_eval_gt(fixtures):
    """--eval_gt: self-consistency (the model's own outputs as ground truth
    must score ~perfect), SSI alignment absorbing a global 2x gt scale, and
    --eval_no_align exposing it (rmse_log = ln 2)."""
    d = fixtures["dir"]
    frames_dir = osp.join(d, "eval_frames")
    os.makedirs(frames_dir, exist_ok=True)
    rng = np.random.default_rng(8)
    for i in range(2):
        cv2.imwrite(osp.join(frames_dir, f"ev_{i}.png"), rng.integers(0, 256, (120, 160, 3), dtype=np.uint8))

    out_dir, gt_dir = osp.join(d, "eval_out"), osp.join(d, "eval_gt")
    r = _run([osp.join(REPO_ROOT, "run_batch.py"), "-m", fixtures["ckpt"], "-i", frames_dir,
              "-o", out_dir, "-dp", "1", "-f32", "--save", "npy"], cwd=d)
    assert r.returncode == 0, r.stderr[-2000:]
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(2):
        np.save(osp.join(gt_dir, f"ev_{i}.npy"), np.load(osp.join(out_dir, f"ev_{i}.npy")) * 2.0)

    r = _run([osp.join(REPO_ROOT, "run_batch.py"), "-m", fixtures["ckpt"], "-i", frames_dir,
              "-o", osp.join(d, "eval_out2"), "-dp", "1", "-f32", "--save", "npy",
              "--eval_gt", gt_dir], cwd=d)
    assert r.returncode == 0, r.stderr[-2000:]
    line = next(l for l in r.stdout.splitlines() if l.startswith("Eval vs"))
    assert "(2/2 frames, SSI-aligned)" in line and "abs_rel=0.0000" in line and "delta1=1.0000" in line

    r = _run([osp.join(REPO_ROOT, "run_batch.py"), "-m", fixtures["ckpt"], "-i", frames_dir,
              "-o", osp.join(d, "eval_out3"), "-dp", "1", "-f32", "--save", "npy",
              "--eval_gt", gt_dir, "--eval_no_align"], cwd=d)
    assert r.returncode == 0, r.stderr[-2000:]
    line = next(l for l in r.stdout.splitlines() if l.startswith("Eval vs"))
    assert "no-align" in line and "abs_rel=0.5000" in line and "rmse_log=0.6931" in line


def test_run_batch_video_max_frames(fixtures):
    """Video input: --max_frames caps the run; single-device path."""
    d = fixtures["dir"]
    out_dir = osp.join(d, "batch_vid_out")
    r = _run(
        [osp.join(REPO_ROOT, "run_batch.py"), "-m", fixtures["ckpt"], "-i", fixtures["vid"],
         "-o", out_dir, "-dp", "1", "-f32", "--max_frames", "4"],
        cwd=d,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Done: 4 frames" in r.stdout
    assert sorted(os.listdir(out_dir)) == [f"frame_{i:06d}.png" for i in range(4)]
