"""Shared plumbing for the Pallas TPU kernels (flash_attention.py,
window_attention.py): the pltpu import guard, availability predicate, the
-inf masking constant and tile rounding — one copy so guard/constant fixes
can't drift between kernels."""

from __future__ import annotations

import jax

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e30


def tpu_kernels_available() -> bool:
    """pltpu importable AND the default device is a real TPU."""
    try:
        return _HAS_PLTPU and jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
