"""Shared tensor-surgery helpers for converting original torch state dicts
into this framework's NHWC/(in,out) parameter pytrees."""

from __future__ import annotations

import numpy as np

F32 = np.float32


def t_linear(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> (in, out)."""
    return np.ascontiguousarray(w.astype(F32).T)


def t_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (out, in, kh, kw) -> HWIO (kh, kw, in, out)."""
    return np.ascontiguousarray(w.astype(F32).transpose(2, 3, 1, 0))


def t_conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) -> (kh, kw, in, out)."""
    return np.ascontiguousarray(w.astype(F32).transpose(2, 3, 0, 1))


def t_conv1x1_as_linear(w: np.ndarray) -> np.ndarray:
    """torch 1x1 Conv2d weight (out, in, 1, 1) -> linear (in, out)."""
    return np.ascontiguousarray(w.astype(F32)[:, :, 0, 0].T)


def t_vec(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.astype(F32))


def stack_blocks(per_block_dicts: list[dict]) -> dict:
    """Stack a list of identical per-block param dicts along a leading layer
    axis (the lax.scan layout)."""
    keys = per_block_dicts[0].keys()
    return {k: np.stack([d[k] for d in per_block_dicts], axis=0) for k in keys}


def max_index(state_dict: dict, prefix: str, nth: int = 0) -> int:
    """Largest integer appearing right after `prefix.` across keys."""
    import re

    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    best = -1
    for k in state_dict:
        m = pat.match(k)
        if m:
            best = max(best, int(m.group(1)))
    return best
