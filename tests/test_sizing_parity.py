"""Image-sizing math parity: compute_scaled_hw must reproduce the reference's
prepare_image sizing rule (round-to-multiple-of-tiling, square or AR mode)
for every family's tiling, across many input shapes."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

needs_reference = pytest.mark.skipif(not reference_available(), reason="/root/reference not mounted")

SHAPES = [(480, 640), (93, 121), (1080, 1920), (28, 28), (10, 2000), (517, 519)]
SIDES = [None, 56, 196, 384, 518, 1036]


def _ref_scaled_hw(img_hw, max_side, use_square, tiling, default_size):
    # the reference rule (v2 patch_embed.py:117-130), reimplemented for the test
    if max_side is None:
        max_side = default_size
    h, w = img_hw
    largest = max(h, w)
    scale = max_side / largest
    targ = (largest, largest) if use_square else (h, w)
    return tuple(max(1, round(s * scale / tiling)) * tiling for s in targ)


@needs_reference
@pytest.mark.parametrize("family,tiling,default", [("da", 28, 518), ("beit", 32, 512), ("swin", 32, 256)])
def test_scaled_hw_matches_reference_patch_embed(family, tiling, default):
    add_reference_to_path()
    if family == "da":
        from muggled_dpt.v2_depthanything.patch_embed import PatchEmbed

        pe = PatchEmbed(8, 14, default)
    elif family == "beit":
        from muggled_dpt.v31_beit.patch_embed import PatchEmbed

        pe = PatchEmbed(8, 16, default)
    else:
        from muggled_dpt.v31_swinv2.patch_embed import PatchEmbed

        pe = PatchEmbed(8, 4, default)

    rng = np.random.default_rng(0)
    for h, w in SHAPES:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for side in SIDES:
            for square in (True, False):
                t = pe.prepare_image(img, side, square)
                ref_hw = tuple(t.shape[2:])
                got = _ref_scaled_hw((h, w), side, square, tiling, default)
                assert got == ref_hw, (family, (h, w), side, square, got, ref_hw)


def test_facade_uses_same_rule():
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

    model = make_depthanythingv2_dpt(64, 1, 4, (8, 16, 32, 64), (8, 8), 16)
    # default size = base grid * patch = 112, tiling 28
    assert model.compute_scaled_hw((480, 640)) == (112, 112)
    assert model.compute_scaled_hw((480, 640), 518, True) == (504, 504)
    # note round(18.5) == 18 under banker's rounding, matching torch's rule
    assert model.compute_scaled_hw((480, 640), 518, False) == (392, 504)
