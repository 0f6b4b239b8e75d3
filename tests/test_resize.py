"""Element-wise parity of ops.resize against torch.nn.functional.interpolate.

This gates the <1e-3 abs-rel budget: every interpolation mode the reference
uses must match torch exactly (see SURVEY.md §7 'Hard parts')."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from muggled_dpt_tpu.ops.resize import resize_2d, resize_output_size

SIZES = [
    (8, 8, 16, 16),      # 2x upsample
    (37, 37, 16, 16),    # posenc-style downsample, non-integer ratio
    (37, 37, 64, 64),    # posenc-style upsample
    (10, 14, 7, 25),     # anisotropic, mixed up/down
    (518, 518, 252, 252),
    (32, 32, 56, 56),    # 1.75x (head upsample ratio)
    (5, 5, 5, 5),        # identity
    (1, 7, 3, 1),        # degenerate edges
]


def _run_torch(x_nchw, out_hw, mode, align_corners, antialias):
    kwargs = dict(size=out_hw, mode=mode, antialias=antialias)
    if mode != "nearest":
        kwargs["align_corners"] = align_corners
    return F.interpolate(torch.from_numpy(x_nchw), **kwargs).numpy()


def _run_ours(x_nchw, out_hw, mode, align_corners, antialias):
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    y = resize_2d(x_nhwc, out_hw, mode=mode, align_corners=align_corners, antialias=antialias)
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@pytest.mark.parametrize("in_h,in_w,out_h,out_w", SIZES)
@pytest.mark.parametrize(
    "mode,align_corners,antialias",
    [
        ("bilinear", False, True),   # image preprocessing
        ("bilinear", False, False),  # BEiT LUT scaling / postprocess
        ("bilinear", True, False),   # fusion & head upsampling
        ("bicubic", False, False),   # position-embedding resize
    ],
)
def test_resize_matches_torch(in_h, in_w, out_h, out_w, mode, align_corners, antialias):
    if align_corners and (out_h == 1 or out_w == 1 or in_h == 1 or in_w == 1):
        pytest.skip("degenerate align_corners")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, in_h, in_w)).astype(np.float32)
    ref = _run_torch(x, (out_h, out_w), mode, align_corners, antialias)
    got = _run_ours(x, (out_h, out_w), mode, align_corners, antialias)
    # atol 1e-4: f32 accumulation-order difference (matmul vs sequential sum)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_scale_factor_output_size():
    # torch: interpolate(scale_factor=1.75) on 32x32 -> 56x56 (head upsample)
    assert resize_output_size((32, 32), 1.75) == (56, 56)
    assert resize_output_size((36, 20), 2.0) == (72, 40)
    x = np.random.default_rng(1).standard_normal((1, 4, 36, 20)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="bilinear", align_corners=True).numpy()
    got = _run_ours(x, resize_output_size((36, 20), 2.0), "bilinear", True, False)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_uint8_image_path():
    # image prep: uint8 converted to float then resized with antialias
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(100, 160, 3), dtype=np.uint8)
    x = img.astype(np.float32)[None].transpose(0, 3, 1, 2)
    ref = F.interpolate(torch.from_numpy(x), size=(56, 84), mode="bilinear", align_corners=False, antialias=True).numpy()
    got = _run_ours(x, (56, 84), "bilinear", False, True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_bf16_dense_matmul_branch_matches_two_tap():
    """The bf16 speed path applies the SAME 2-tap weights as dense MXU
    matmuls (ops/resize.py); it must agree with the f32 exact-lerp path to
    within bf16 rounding, for both upsample ratios the model uses."""
    import jax.numpy as jnp
    from muggled_dpt_tpu.ops.resize import resize_2d

    rng = np.random.default_rng(3)
    for (hw_in, hw_out, c) in ((36, 63, 8), (20, 40, 16)):
        x32 = rng.standard_normal((1, hw_in, hw_in, c)).astype(np.float32)
        ref = np.asarray(resize_2d(jnp.asarray(x32), (hw_out, hw_out), mode="bilinear", align_corners=True))
        got = np.asarray(
            resize_2d(jnp.asarray(x32, jnp.bfloat16), (hw_out, hw_out), mode="bilinear", align_corners=True),
            np.float32,
        )
        denom = max(np.abs(ref).max(), 1e-9)
        assert np.max(np.abs(got - ref)) / denom < 3e-2, (hw_in, hw_out)


def test_bf16_banded_branch_matches_dense(monkeypatch):
    """The block-banded bf16 pass drops only all-zero weight columns per
    128-row output slab, so it must agree with the dense-matmul branch to
    bf16 rounding at every size — including non-multiple-of-128 outputs,
    upsamples and downsamples, and through the public resize_2d dispatch."""
    import jax.numpy as jnp
    from muggled_dpt_tpu.ops import resize as R

    rng = np.random.default_rng(4)
    cases = [
        (160, 280, 8),   # 1.75x head-style upsample, out not /128
        (144, 288, 4),   # exact 2x fusion-style upsample
        (300, 170, 4),   # downsample
        (130, 131, 3),   # awkward near-identity sizes
    ]
    for hw_in, hw_out, c in cases:
        x = jnp.asarray(rng.standard_normal((1, hw_in, hw_in, c)), jnp.bfloat16)
        monkeypatch.setattr(R, "BANDED_MIN_IN", None)
        dense = np.asarray(resize_2d(x, (hw_out, hw_out), mode="bilinear", align_corners=True), np.float32)
        monkeypatch.setattr(R, "BANDED_MIN_IN", 1)  # force banded on both passes
        banded = np.asarray(resize_2d(x, (hw_out, hw_out), mode="bilinear", align_corners=True), np.float32)
        denom = max(np.abs(dense).max(), 1e-9)
        assert np.max(np.abs(banded - dense)) / denom < 1e-2, (hw_in, hw_out)
    # banded window bookkeeping: slabs tile the output exactly and windows
    # cover only the taps each slab touches
    blocks = R._banded_blocks_np(816, 1428, True)
    assert sum(wb.shape[0] for (_, _, wb) in blocks) == 1428
    assert all(hi - lo == wb.shape[1] for (lo, hi, wb) in blocks)
    assert max(wb.shape[1] for (_, _, wb) in blocks) < 816 // 6  # real FLOP cut
