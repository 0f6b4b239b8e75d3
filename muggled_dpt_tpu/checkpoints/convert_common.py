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


def qkv_head_major(kernel: np.ndarray, num_heads: int) -> np.ndarray:
    """Reorder a fused qkv Linear kernel's output columns from torch's
    [q|k|v][head][dim] to head-major [head][q|k|v][dim], so each head's
    q/k/v land contiguous in the projection output — the flash kernel then
    reads one dense (N, 3D) slab per head straight from the qkv matmul
    output, with no transposes (ops/pallas/flash_attention.py)."""
    cin, c3 = kernel.shape
    d = c3 // 3 // num_heads
    return np.ascontiguousarray(
        kernel.reshape(cin, 3, num_heads, d).transpose(0, 2, 1, 3).reshape(cin, c3)
    )


def qkv_vec_head_major(vec: np.ndarray, num_heads: int) -> np.ndarray:
    """Same [q|k|v][head][dim] -> [head][q|k|v][dim] reorder for a bias vector."""
    c3 = vec.shape[-1]
    d = c3 // 3 // num_heads
    return np.ascontiguousarray(vec.reshape(3, num_heads, d).transpose(1, 0, 2).reshape(c3))


def stack_blocks(per_block_dicts: list[dict]) -> dict:
    """Stack a list of identical per-block param dicts along a leading layer
    axis (the lax.scan layout)."""
    keys = per_block_dicts[0].keys()
    return {k: np.stack([d[k] for d in per_block_dicts], axis=0) for k in keys}


def max_index(state_dict: dict, prefix: str, nth: int = 0) -> int:
    """Largest integer appearing right after `prefix.` across keys.

    `prefix` must be a literal key prefix (no '#' digit wildcards): the suffix
    is sliced at len(prefix), which would misalign if '#' matched a
    different-length digit run."""
    from .key_regex import get_nth_integer, has_prefix

    assert "#" not in prefix, "max_index requires a literal prefix (no '#' wildcards)"
    best = -1
    for k in state_dict:
        if has_prefix(k, prefix + ".#."):
            best = max(best, get_nth_integer(k[len(prefix) :], 0))
    return best
