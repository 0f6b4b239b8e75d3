"""BEiT image encoder (MiDaS v3.1), functional JAX.

Reference behavior (cited for parity):
* 4-stage structure, cls token prepend: v31_beit/image_encoder_model.py:68-91
* pre-norm block with gamma LayerScale: image_encoder_model.py:233-251
* attention with separate q/v bias (no k bias) + additive relative-position
  bias at every block: image_encoder_model.py:293-356
* per-block learned relpos LUT, bilinearly rescaled per grid then gathered by a
  deterministic NxN relative-index matrix:
  v31_beit/components/relative_positional_encoder.py:242-309
* index-matrix construction: relative_positional_encoder.py:117-238

TPU-first design: the relative-position index matrix is a trace-time numpy
constant; the per-layer bias stack (L, H, N, N) is produced by one batched
bilinear-resize (MXU matmuls) + one gather over all layers at once, and is
either cached per grid by the facade (the reference's GridCache / enable_cache
path, with its 1.5-2x speedup claim, v31_beit/components/README.md:91) or
recomputed inline. Blocks run as a lax.scan that consumes (block params, bias)
pairs, so the 24-layer model compiles a single block program."""

from __future__ import annotations

from dataclasses import dataclass
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.nn import layer_norm, mlp_gelu, self_attention
from ..ops.resize import resize_2d


@dataclass(frozen=True)
class BEiTConfig:
    features: int
    num_heads: int
    num_blocks: int
    base_grid_hw: tuple[int, int]
    attn_impl: str = "xla"


@functools.lru_cache(maxsize=64)
def _axis_selection_np(g: int) -> np.ndarray:
    """(g*g, 2g-1) one-hot selection matrix S[(iq*g + ik), iq-ik+g-1] = 1.

    The relative-position bias is 2D block-Toeplitz: bias[(yq,xq),(yk,xk)] =
    T[yq-yk, xq-xk]. Expanding the table per axis with these one-hot matmuls
    runs on the MXU and replaces the reference's "extremely slow" N x N
    gather (relative_positional_encoder.py:303) — measured 4.6 ms/layer for
    the XLA gather at grid 32 vs sub-millisecond for the matmuls. One-hot
    rows make the matmul EXACT in f32 (each output is 1.0 * value + zeros)."""
    iq, ik = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    s = np.zeros((g * g, 2 * g - 1), np.float32)
    s[(iq * g + ik).ravel(), (iq - ik + g - 1).ravel()] = 1.0
    return s


@functools.lru_cache(maxsize=64)
def relative_position_index(grid_hw: tuple[int, int]) -> np.ndarray:
    """Deterministic (N, N) int32 matrix of relative-offset ids, with special
    cls entries (relative_positional_encoder.py:117-238). N = gh*gw + 1."""
    gh, gw = grid_hw
    yy, xx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    coords = np.stack([yy.ravel(), xx.ravel()]).astype(np.int64)  # (2, A)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, A, A)
    rel_y = (rel[0] + gh - 1) * (2 * gw - 1)
    rel_x = rel[1] + gw - 1

    n = gh * gw + 1
    max_token_index = (2 * gh - 1) * (2 * gw - 1) - 1
    idx = np.zeros((n, n), dtype=np.int32)
    idx[1:, 1:] = rel_y + rel_x
    idx[0, :] = max_token_index + 1  # cls-to-token
    idx[:, 0] = max_token_index + 2  # token-to-cls
    idx[0, 0] = max_token_index + 3  # cls-to-cls
    return idx


def calculate_bias_bytes(num_layers: int, num_heads: int, grid_hw, bytes_per_element: int = 4) -> int:
    """HBM cost of the full cached bias stack — the budget math the reference
    documents per layer (relative_positional_encoder.py:313-332, e.g. 1.6 GB
    for BEiT-L-512 at 512^2)."""
    n = grid_hw[0] * grid_hw[1] + 1
    return int(num_layers * num_heads * n * n * bytes_per_element)


def compute_bias_stack(relpos_lut, base_grid_hw, grid_hw, pad_to: int | None = None):
    """Per-layer relative-position bias (L, H, N, N) for a patch grid.

    relpos_lut: (L, R, H) stacked learned tables, R = (2bh-1)(2bw-1)+3.
    Rescaling uses torch-default bilinear (align_corners=False, no antialias) —
    relative_positional_encoder.py:289-295.

    pad_to: when set, zero-pads the last two dims to this size. The cached
    stack is built pre-padded to the flash kernel's 128-lane tile size so the
    per-block jnp.pad copy (~95 us x 24 layers of HBM traffic per forward at
    L-512) disappears from the serving path. The kernel ADDS a -1e30 iota
    row-mask to the padded key columns (it does not overwrite them), so the
    zero padding here is load-bearing: pads must stay zero/finite."""
    num_layers, _, heads = relpos_lut.shape
    bh, bw = base_grid_hw
    gh, gw = grid_hw
    ref_h, ref_w = 2 * bh - 1, 2 * bw - 1
    new_h, new_w = 2 * gh - 1, 2 * gw - 1

    lut = relpos_lut.astype(jnp.float32)
    token_lut = lut[:, : ref_h * ref_w, :].reshape(num_layers, ref_h, ref_w, heads)
    if (new_h, new_w) != (ref_h, ref_w):
        token_lut = resize_2d(token_lut, (new_h, new_w), mode="bilinear", align_corners=False)
    token_lut = token_lut.reshape(num_layers, new_h * new_w, heads)
    full_lut = jnp.concatenate([token_lut, lut[:, ref_h * ref_w :, :]], axis=1)  # (L, R', H)

    # Block-Toeplitz expansion via one-hot selection matmuls instead of the
    # N x N gather (see _axis_selection_np): bias[(yq,xq),(yk,xk)] =
    # T[yq-yk+gh-1, xq-xk+gw-1] for patch tokens; exact in f32.
    t = token_lut.reshape(num_layers, new_h, new_w, heads)
    sy = jnp.asarray(_axis_selection_np(gh))  # (gh^2, 2gh-1)
    sx = jnp.asarray(_axis_selection_np(gw))  # (gw^2, 2gw-1)
    hi = jax.lax.Precision.HIGHEST
    c1 = jnp.einsum("pa,labh->lpbh", sy, t, precision=hi)  # (L, gh^2, 2gw-1, H)
    c2 = jnp.einsum("qb,lpbh->lpqh", sx, c1, precision=hi)  # (L, gh^2, gw^2, H)
    n = gh * gw + 1
    tok = (
        c2.reshape(num_layers, gh, gh, gw, gw, heads)
        .transpose(0, 5, 1, 3, 2, 4)
        .reshape(num_layers, heads, n - 1, n - 1)
    )
    # cls borders from the 3 special LUT rows (cls->token, token->cls,
    # cls->cls; same final state as the reference's index writes,
    # relative_positional_encoder.py:117-238)
    specials = lut[:, ref_h * ref_w :, :].transpose(0, 2, 1)  # (L, H, 3)
    pad_n = pad_to if (pad_to is not None and pad_to > n) else n
    bias = jnp.pad(tok, ((0, 0), (0, 0), (1, pad_n - n), (1, pad_n - n)))
    bias = bias.at[:, :, 0, :n].set(jnp.broadcast_to(specials[:, :, 0:1], (num_layers, heads, n)))
    bias = bias.at[:, :, :n, 0].set(jnp.broadcast_to(specials[:, :, 1:2], (num_layers, heads, n)))
    bias = bias.at[:, :, 0, 0].set(specials[:, :, 2])
    return bias


def block_forward(tokens, bp, bias_hnn, cfg: BEiTConfig, capture: bool = False):
    """Pre-norm block with additive attention bias (image_encoder_model.py:233-251).
    The k-bias is structurally zero (image_encoder_model.py:293-298): q/v biases
    are fused into a head-major [head][q|k|v][dim] qkv bias with zero k slots
    (matching the qkv kernel column order, checkpoints/convert_common.py)."""
    h, d = cfg.num_heads, cfg.features // cfg.num_heads
    qkv_bias = jnp.concatenate(
        [
            bp["q_bias"].reshape(h, 1, d),
            jnp.zeros((h, 1, d), bp["q_bias"].dtype),
            bp["v_bias"].reshape(h, 1, d),
        ],
        axis=1,
    ).reshape(3 * cfg.features)
    # pass through dense or int8-quantized kernel variants (ops/quant.py)
    attn_params = {
        k: bp[k]
        for k in (
            "qkv_kernel", "qkv_kernel_q8", "qkv_kernel_scale", "qkv_act_smooth",
            "proj_kernel", "proj_kernel_q8", "proj_kernel_scale", "proj_act_smooth", "proj_bias",
        )
        if k in bp
    }
    attn_params["qkv_bias"] = qkv_bias
    h = layer_norm(tokens, bp["norm1_scale"], bp["norm1_bias"])
    if isinstance(bias_hnn, tuple):
        bias = bias_hnn  # (stack, layer) — kernel-indexed cached-bias path
    else:
        bias = bias_hnn[None]  # (1, H, N, N), broadcast over batch
    if capture:
        h, attn_weights = self_attention(h, attn_params, cfg.num_heads, bias=bias, capture=True)
    else:
        h = self_attention(h, attn_params, cfg.num_heads, bias=bias, impl=cfg.attn_impl)
        attn_weights = None
    tokens = tokens + bp["ls1"].astype(tokens.dtype) * h

    h = layer_norm(tokens, bp["norm2_scale"], bp["norm2_bias"])
    h = mlp_gelu(h, bp)
    tokens = tokens + bp["ls2"].astype(tokens.dtype) * h
    return (tokens, attn_weights) if capture else tokens


def encoder_forward(params, patch_tokens, patch_grid_hw, cfg: BEiTConfig, bias_stack=None, capture: bool = False):
    """BEiT 4-output encoder (image_encoder_model.py:68-91). No absolute
    pos-embed and no output norm — position information enters purely through
    the per-block attention bias.

    bias_stack: optional precomputed (L, H, N, N) (the enable_cache path);
    computed inline from the stacked LUTs when None."""
    b = patch_tokens.shape[0]
    cls_tok = params["cls_token"].astype(patch_tokens.dtype)
    tokens = jnp.concatenate([jnp.broadcast_to(cls_tok, (b, 1, cfg.features)), patch_tokens], axis=1)

    # Cached mode: the precomputed (L, H, N, N) stack arrives in the compute
    # dtype (bf16 halves HBM traffic); logits still accumulate in f32.
    # Inline mode (enable_cache=False): the bias is generated per block INSIDE
    # the scan from that block's LUT, so peak memory is one layer's (H, N, N)
    # — the reference's cache-disabled behavior, which is what makes very
    # large grids feasible (the full stack is ~13 GB at 1024^2 for L-24).
    inline_bias = bias_stack is None

    stacked = {k: v for k, v in params["blocks"].items() if k != "relpos_lut"}
    taps = tuple((cfg.num_blocks // 4) * (i + 1) - 1 for i in range(4))

    if not capture:
        outputs = []
        start = 0

        if inline_bias:

            def body(tok, xs):
                bp, lut = xs
                bias = compute_bias_stack(lut[None], cfg.base_grid_hw, patch_grid_hw)[0]
                return block_forward(tok, bp, bias.astype(tok.dtype), cfg), None

            bias_source = params["blocks"]["relpos_lut"]
        else:
            # cached mode: the scan carries only a LAYER INDEX; the kernel
            # reads its bias blocks straight from the full stack via a
            # scalar-prefetch index_map — no per-layer dynamic-slice copy
            # (~42 MB x L of extra HBM round-trip at L-512 otherwise)

            def body(tok, xs):
                bp, li = xs
                return block_forward(tok, bp, (bias_stack, li), cfg), None

            bias_source = jnp.arange(cfg.num_blocks, dtype=jnp.int32)

        for t in taps:
            seg = jax.tree_util.tree_map(lambda a: a[start : t + 1], stacked)
            src_seg = bias_source[start : t + 1]
            tokens = lax.scan(body, tokens, (seg, src_seg))[0]
            outputs.append(tokens)
            start = t + 1
        return tuple(outputs)

    # capture mode (analysis, small inputs): full stack is fine
    if inline_bias:
        bias_stack = compute_bias_stack(params["blocks"]["relpos_lut"], cfg.base_grid_hw, patch_grid_hw)
    internals = {"block_tokens": [], "attention": []}
    outputs = []
    for i in range(cfg.num_blocks):
        bp = jax.tree_util.tree_map(lambda a: a[i], stacked)
        tokens, attn = block_forward(tokens, bp, bias_stack[i], cfg, capture=True)
        internals["block_tokens"].append(tokens)
        internals["attention"].append(attn)
        if i in taps:
            outputs.append(tokens)
    return tuple(outputs), internals
