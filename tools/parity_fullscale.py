#!/usr/bin/env python3
"""Production-scale f32 parity gates vs the PyTorch reference.

The per-component parity suites (tests/test_parity_*) run 64-dim toy models;
this tool runs REAL configs at their default serving sizes and gates the
BASELINE.md north star — abs-rel < 1e-3 vs the torch reference — where error
accumulation actually happens: 12-block encoders at 384-768 dims, grid-37
bicubic posenc ratios, 24-grid BEiT LUT rescales (961-row), SwinV2 64-grid
window planning. Checkpoints are synthetic (original format, fan-in-scaled;
checkpoints/random_init.py et al.) because real weights are not downloadable
in this environment; both stacks read the same .pt file, so the comparison
exercises the full load->convert->forward pipeline at production scale.

Configs mirror the reference's documented standard configs:
  DA-V2/V1 vit-small  (make_depthanythingv1_dpt.py:96-103)
  BEiT base-384       (make_beit_dpt.py:103-110)
  SwinV2 tiny-256     (make_swinv2_dpt.py:105-114)

Each family runs BOTH square sizing at the default size and AR-preserving
sizing (dpt_model.py:87-109; patch_embed prepare_image sizing :117-130).

Usage: python tools/parity_fullscale.py [--families da-v2,da-v1,beit,swinv2]
Runs on CPU (forces JAX_PLATFORMS=cpu; torch reference is CPU-only here).
"""

import argparse
import os
import os.path as osp
import sys
import tempfile

# must run on the CPU backend: the torch side is CPU, and f32 parity needs
# the exact-lerp resize paths, not the TPU serving paths. Overrides the
# environment's preset JAX_PLATFORMS=axon — never touch the (exclusive)
# TPU from a parity run.
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np  # noqa: E402

ABS_REL_BUDGET = 1e-3  # BASELINE.md north star

CASES = {
    "da-v2": {
        "filename": "depth_anything_v2_vits.pt",
        "config": {
            "features_per_token": 384,
            "num_blocks": 12,
            "num_heads": 6,
            "reassembly_features_list": [48, 96, 192, 384],
            "fusion_channels": 64,
            "patch_size_px": 14,
            "base_patch_grid_hw": (37, 37),
            "is_giant": False,
        },
        "default_size": 518,
        # 700 square -> grid 50: bicubic posenc UPSIZE from the 37x37 table
        "extra_sizes": [(True, 700)],
    },
    "da-v1": {
        "filename": "depth_anything_v1_vits.pt",
        "config": "da-v2",  # same generator/config, v1 steered by filename
        "default_size": 518,
    },
    "da-v2-metric": {
        # metric variant: sigmoid head + filename sentinel (make_dpt.py:53-66)
        "filename": "depth_anything_v2_metric_vits.pt",
        "config": "da-v2",
        "default_size": 518,
    },
    "beit": {
        "filename": "midas_beit_base_384.pt",
        "config": {
            "features_per_token": 768,
            "num_blocks": 12,
            "num_heads": 12,
            "reassembly_features_list": [96, 192, 384, 768],
            "fusion_channels": 256,
            "patch_size_px": 16,
            "base_patch_grid_hw": (24, 24),
        },
        "default_size": 384,
        # 512 square -> grid 32: the L-512 LUT-rescale ratio (47-row base LUT
        # side bilinear-upsized to 63) on the base-384 table
        "extra_sizes": [(True, 512)],
    },
    "swinv2": {
        "filename": "midas_swin2_tiny_256.pt",
        "config": {
            "features_per_stage": [96, 192, 384, 768],
            "heads_per_stage": [3, 6, 12, 24],
            "layers_per_stage": [2, 2, 6, 2],
            "base_patch_grid_hw": (64, 64),
            "window_size_hw": (16, 16),
            "pretrained_window_sizes_per_stage": [16, 16, 16, 8],
            "fusion_channels": 256,
            "patch_size_px": 4,
        },
        "default_size": 256,
        # 384 square -> grid 96: window replan (divisor search) + CPB tables
        # normalized by the 16/8 pretrained sizes at a non-native grid
        "extra_sizes": [(True, 384)],
    },
    # -- XL tier (--xl): 24-block 1024-dim encoders, the real L-scale error-
    # accumulation test. Noticeably slower on CPU torch; run explicitly.
    "da-v2-l": {
        "filename": "depth_anything_v2_vitl.pt",
        "config": {
            "features_per_token": 1024,
            "num_blocks": 24,
            "num_heads": 16,
            "reassembly_features_list": [256, 512, 1024, 1024],
            "fusion_channels": 256,
            "patch_size_px": 14,
            "base_patch_grid_hw": (37, 37),
            "is_giant": False,
        },
        "default_size": 518,
        "xl": True,
    },
    "beit-l-512": {
        "filename": "midas_beit_large_512.pt",
        "config": {
            "features_per_token": 1024,
            "num_blocks": 24,
            "num_heads": 16,
            "reassembly_features_list": [256, 512, 1024, 1024],
            "fusion_channels": 256,
            "patch_size_px": 16,
            "base_patch_grid_hw": (32, 32),
        },
        "default_size": 512,
        "xl": True,
    },
    "da-v2-giant-width": {
        # ViT-Giant pathway at PRODUCTION WIDTH (1536d/24h SwiGLU blocks, the
        # giant's all-1536 reassembly) but 8 blocks instead of 40 to keep the
        # CPU-torch runtime sane — depth accumulation is covered by the
        # 24-block cases above; this one gates the giant-only code paths
        # (SwiGLU FFN, swiglu_hidden sizing) at real dimensions
        "filename": "depth_anything_v2_vitg.pt",
        "config": {
            "features_per_token": 1536,
            "num_blocks": 8,
            "num_heads": 24,
            "reassembly_features_list": [1536, 1536, 1536, 1536],
            "fusion_channels": 384,
            "patch_size_px": 14,
            "base_patch_grid_hw": (37, 37),
            "is_giant": True,
        },
        "default_size": 518,
        "xl": True,
    },
    "swinv2-l-384": {
        # swin2_large_384 standard config (make_swinv2_dpt.py:87-95): 24-layer
        # hierarchical encoder, 24-px windows with the 12/12/12/6 pretrained
        # CPB normalization — the L-scale error-accumulation case for SwinV2
        "filename": "midas_swin2_large_384.pt",
        "config": {
            "features_per_stage": [192, 384, 768, 1536],
            "heads_per_stage": [6, 12, 24, 48],
            "layers_per_stage": [2, 2, 18, 2],
            "base_patch_grid_hw": (96, 96),
            "window_size_hw": (24, 24),
            "pretrained_window_sizes_per_stage": [12, 12, 12, 6],
            "fusion_channels": 256,
            "patch_size_px": 4,
        },
        "default_size": 384,
        "xl": True,
    },
}


def build_state_dict(family: str, seed: int = 31):
    cfg = CASES[family]["config"]
    if isinstance(cfg, str):
        cfg = CASES[cfg]["config"]
    if family.startswith("da"):
        from muggled_dpt_tpu.checkpoints.random_init import random_original_depth_anything_state_dict

        return random_original_depth_anything_state_dict(cfg, seed=seed)
    if family.startswith("beit"):
        from muggled_dpt_tpu.checkpoints.beit import random_original_state_dict

        return random_original_state_dict(cfg, seed=seed)
    if family.startswith("swinv2"):
        from muggled_dpt_tpu.checkpoints.swinv2 import random_original_state_dict

        return random_original_state_dict(cfg, seed=seed)
    raise ValueError(family)


def make_test_image() -> np.ndarray:
    """Synthetic photo-like input shared by the CLI and the pytest wrapper
    (tests/test_parity_fullscale.py): smooth gradients + texture noise."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    base = 120 + 60 * np.sin(yy / 37.0) + 50 * np.cos(xx / 53.0)
    image = base[..., None] + rng.normal(0, 18, (480, 640, 3))
    return np.clip(image, 0, 255).astype(np.uint8)


def abs_rel(ours: np.ndarray, ref: np.ndarray) -> float:
    scale = float(np.abs(ref).mean()) + 1e-12
    return float(np.abs(ours - ref).mean() / scale)


def run_family(family: str, tmp_dir: str, image_bgr: np.ndarray, runs=None):
    """Returns a list of (case_name, abs_rel, ok) tuples.

    runs: optional [(use_square, size), ...] subset override — used by the
    default-on thin CI gate (tests/test_parity_fullscale.py) to run a single
    ~60 s case instead of the family's full sizing matrix."""
    import torch

    sys.path.insert(0, "/root/reference")
    from muggled_dpt.make_dpt import make_dpt_from_state_dict as ref_make

    from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

    case = CASES[family]
    sd = build_state_dict(family)
    path = osp.join(tmp_dir, case["filename"])
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)

    # reference at library defaults (the configuration real users get)
    ref_cfg, ref_model = ref_make(path)
    cfg, model = make_dpt_from_state_dict(path)
    assert bool(ref_cfg.get("is_metric", False)) == bool(cfg.get("is_metric", False))

    side = case["default_size"]
    if runs is None:
        runs = [(True, side), (False, side)] + list(case.get("extra_sizes", []))
    results = []
    for square, sz in runs:
        label = f"{'square' if square else 'AR'}@{sz}"
        with torch.inference_mode():
            ref_depth = ref_model.inference(image_bgr, sz, square).float().numpy()
        depth = np.asarray(model.inference(image_bgr, sz, square), np.float32)
        assert depth.shape == ref_depth.shape, (depth.shape, ref_depth.shape)
        err = abs_rel(depth, ref_depth)
        results.append((f"{family} {label}", err, err < ABS_REL_BUDGET))
    return results


def main(argv=None):
    default_families = ",".join(f for f, c in CASES.items() if not c.get("xl"))
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--families", default=default_families, help="comma-separated subset")
    ap.add_argument("--xl", action="store_true", help="also run the 24-block L-scale cases")
    args = ap.parse_args(argv)
    families = [f for f in (s.strip() for s in args.families.split(",")) if f]
    if args.xl:
        families += [f for f, c in CASES.items() if c.get("xl") and f not in families]

    image_bgr = make_test_image()

    all_ok = True
    rows = []
    with tempfile.TemporaryDirectory() as tmp_dir:
        for family in families:
            for name, err, ok in run_family(family.strip(), tmp_dir, image_bgr):
                rows.append((name, err, ok))
                all_ok &= ok
                print(f"[{'PASS' if ok else 'FAIL'}] {name:28s} abs-rel {err:.2e} (budget {ABS_REL_BUDGET:.0e})")
    print("\nALL PASS" if all_ok else "\nFAILURES PRESENT")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
