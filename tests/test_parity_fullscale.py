"""Production-scale f32 parity gates (BASELINE.md north star: abs-rel < 1e-3
vs the torch reference at real configs / default serving sizes).

These cases take ~1-2 CPU-minutes per family, so they are opt-in here to keep
the default suite inside its time budget: set RUN_FULLSCALE=1 (CI nightly) or
run `python tools/parity_fullscale.py` directly. The tool and this wrapper
share all case definitions (tools/parity_fullscale.py:CASES)."""

import os

import numpy as np
import pytest

from conftest import reference_available

_needs_reference = pytest.mark.skipif(not reference_available(), reason="/root/reference not mounted")
_full_matrix = pytest.mark.skipif(
    os.environ.get("RUN_FULLSCALE", "") != "1",
    reason="production-scale parity matrix is opt-in (RUN_FULLSCALE=1 or tools/parity_fullscale.py)",
)

pytestmark = [_needs_reference]


@pytest.fixture(scope="module")
def fullscale():
    import tools.parity_fullscale as pf

    return pf


@pytest.fixture(scope="module")
def image_bgr():
    # shared with the CLI so both entry points gate the same input
    from tools.parity_fullscale import make_test_image

    return make_test_image()


def test_fullscale_parity_thin_gate(fullscale, image_bgr, tmp_path):
    """Default-on production-scale gate: one DA-V2 vit-s square@518 case
    (~60 s) so a parity regression at real config scale can't hide between
    manual RUN_FULLSCALE runs. The full sizing/family matrix stays opt-in."""
    for name, err, ok in fullscale.run_family("da-v2", str(tmp_path), image_bgr, runs=[(True, 518)]):
        assert ok, f"{name}: abs-rel {err:.2e} over budget {fullscale.ABS_REL_BUDGET}"


@_full_matrix
@pytest.mark.parametrize("family", ["da-v2", "da-v1", "da-v2-metric", "beit", "swinv2"])
def test_fullscale_parity(family, fullscale, image_bgr, tmp_path):
    for name, err, ok in fullscale.run_family(family, str(tmp_path), image_bgr):
        assert ok, f"{name}: abs-rel {err:.2e} over budget {fullscale.ABS_REL_BUDGET}"
