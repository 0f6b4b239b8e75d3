"""SwinV2 hierarchical image encoder (MiDaS v3.1), functional JAX.

Reference behavior (cited for parity):
* 4 stages with PatchMerge between (v31_swinv2/image_encoder_model.py:53-98)
* post-norm blocks: attention -> norm1 -> +res, mlp -> norm2 -> +res
  (image_encoder_model.py:213-225); Swin LayerNorms use default eps=1e-5
* scaled cosine attention: normalize(q)@normalize(k)^T * logit_scale, q/v bias
  only (v31_swinv2/components/windowed_attention.py:47-61,92-123)
* log-CPB relative position bias: MLP(2->512->heads) over a log-scaled
  normalized coord table, gathered per window, 16*sigmoid
  (components/relative_positional_encoder.py:55-188)
* dynamic window/shift resizing: nearest-divisor search in [win/2, 2win)
  (windowed_attention.py:345-388); cyclic roll shifting (:193-194,225-226)
* 0/-100 shift mask built from 3x3 region slices (:394-439)
* patch merge: 2x2 TL/BL/TR/BR decimate-concat -> Linear 4C->C' (no bias) ->
  LayerNorm (components/patch_merge.py:37-103)

TPU-first design: the window plan (sizes/shifts), shift masks, CPB coordinate
tables and gather indices are all *trace-time host constants* per patch grid —
exactly the data the reference caches in its three GridCaches
(relative_positional_encoder.py:49-51) and mask buffer (:232-258). Window
partition/reverse are pure reshape/transposes that XLA folds into layouts;
rolls become lax.roll (a static rotation). Each stage's (no-shift, shift)
block pairs are stacked and scanned so the 18-block stage compiles one pair
program."""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.nn import layer_norm, linear, mlp_gelu

SWIN_LN_EPS = 1e-5


@dataclass(frozen=True)
class SwinV2Config:
    features_per_stage: tuple[int, int, int, int]
    heads_per_stage: tuple[int, int, int, int]
    layers_per_stage: tuple[int, int, int, int]
    window_size_hw: tuple[int, int]
    pretrained_window_sizes: tuple  # per stage; None entries -> normalize by own window
    attn_impl: str = "xla"


# ---------------------------------------------------------------------------
# Trace-time host constants (the reference's cached tensors)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=256)
def window_plan(patch_grid_hw, target_window_hw):
    """Window + shift sizing for a grid (windowed_attention.py:345-388).
    Returns (window_hw, shift_hw)."""
    gh, gw = patch_grid_hw
    th, tw = target_window_hw

    def fit(win, grid):
        win = min(win, grid)
        if grid % win != 0:
            divisors = [d for d in range(win // 2, 2 * win) if grid % d == 0]
            win = min(divisors, key=lambda d: abs(grid - d))
        return win

    win_h, win_w = fit(th, gh), fit(tw, gw)
    shift_h = 0 if gh <= win_h else win_h // 2
    shift_w = 0 if gw <= win_w else win_w // 2
    return (win_h, win_w), (shift_h, shift_w)


@functools.lru_cache(maxsize=256)
def shift_mask_np(patch_grid_hw, window_hw, shift_hw):
    """(nW, A, A) float32 mask of 0/-100 entries (windowed_attention.py:394-439)."""
    gh, gw = patch_grid_hw
    win_h, win_w = window_hw
    shift_h, shift_w = shift_hw
    if shift_h == 0 and shift_w == 0:
        return None
    region = np.zeros((gh, gw), dtype=np.float32)
    cnt = 0
    for hs in (slice(0, -win_h), slice(-win_h, -shift_h), slice(-shift_h, None)):
        for ws in (slice(0, -win_w), slice(-win_w, -shift_w), slice(-shift_w, None)):
            region[hs, ws] = cnt
            cnt += 1
    # partition into windows
    region = region.reshape(gh // win_h, win_h, gw // win_w, win_w).transpose(0, 2, 1, 3)
    region = region.reshape(-1, win_h * win_w)  # (nW, A)
    diff = region[:, None, :] - region[:, :, None]
    return np.where(diff != 0, np.float32(-100.0), np.float32(0.0))


@functools.lru_cache(maxsize=256)
def cpb_coords_table_np(window_hw, pretrained_window_size):
    """Log-scaled normalized coord table, ((2h-1)(2w-1), 2) float32
    (relative_positional_encoder.py:121-188)."""
    win_h, win_w = window_hw
    ys = np.arange(-(win_h - 1), win_h, dtype=np.float32)
    xs = np.arange(-(win_w - 1), win_w, dtype=np.float32)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    table = np.stack([yy, xx], axis=-1)  # (2h-1, 2w-1, 2)
    div_h = win_h if pretrained_window_size is None else pretrained_window_size
    div_w = win_w if pretrained_window_size is None else pretrained_window_size
    table[..., 0] /= max(div_h - 1, 1)
    table[..., 1] /= max(div_w - 1, 1)
    scale = 8.0
    table = np.sign(table) * np.log2(np.abs(table * scale) + 1.0) / np.log2(scale)
    return table.reshape(-1, 2).astype(np.float32)


@functools.lru_cache(maxsize=256)
def cpb_index_np(window_hw):
    """(A, A) int32 gather index into the coords table
    (relative_positional_encoder.py:192-283)."""
    win_h, win_w = window_hw
    yy, xx = np.meshgrid(np.arange(win_h), np.arange(win_w), indexing="ij")
    coords = np.stack([yy.ravel(), xx.ravel()]).astype(np.int64)
    rel = coords[:, :, None] - coords[:, None, :]
    idx = (rel[0] + win_h - 1) * (2 * win_w - 1) + (rel[1] + win_w - 1)
    return idx.astype(np.int32)


def cpb_bias(bp, window_hw, pretrained_window_size):
    """Continuous position bias for one block: 16*sigmoid(MLP(coords))[index],
    shaped (H, A, A) (relative_positional_encoder.py:60-94)."""
    table = jnp.asarray(cpb_coords_table_np(window_hw, pretrained_window_size))  # (R, 2)
    h = jax.nn.relu(linear(table, bp["cpb0_kernel"], bp["cpb0_bias"]))
    lut = linear(h, bp["cpb1_kernel"], None)  # (R, heads), no bias
    idx = jnp.asarray(cpb_index_np(window_hw))  # (A, A)
    bias = jnp.take(lut, idx.reshape(-1), axis=0).reshape(idx.shape[0], idx.shape[1], -1)
    return 16.0 * jax.nn.sigmoid(bias.transpose(2, 0, 1))


def compute_cpb_stack(encoder_params, patch_grid_hw, cfg: SwinV2Config):
    """Precompute the CPB bias of EVERY block for one patch grid, stacked per
    stage for consumption by the pair-scan — the cross-frame cache equivalent
    of the reference's three CPB GridCaches (relative_positional_encoder.py:
    49-51,97-117; ~30-40% video speedup claimed at
    v31_swinv2/components/README.md:111). Without it the CPB MLP + gather
    would re-run inside the scan on every forward.

    Returns a list of 4 per-stage pytrees {"b0": (P, H, A, A), "b1": ...}."""
    gh, gw = patch_grid_hw
    aux = []
    for s in range(4):
        if s > 0:
            gh, gw = gh // 2, gw // 2
        window_hw, _ = window_plan((gh, gw), cfg.window_size_hw)
        pws = cfg.pretrained_window_sizes[s]
        stage_pairs = encoder_params["stages"][s]
        stage_aux = {}
        for key in ("b0", "b1"):
            bps = {k: stage_pairs[key][k] for k in ("cpb0_kernel", "cpb0_bias", "cpb1_kernel")}
            stage_aux[key] = jax.vmap(lambda bp: cpb_bias(bp, window_hw, pws))(bps)
        aux.append(stage_aux)
    return aux


def cpb_stack_bytes(cfg: SwinV2Config, patch_grid_hw, bytes_per_el: int = 4) -> int:
    """HBM cost of the full CPB cache for one grid (all stages/blocks)."""
    gh, gw = patch_grid_hw
    total = 0
    for s in range(4):
        if s > 0:
            gh, gw = gh // 2, gw // 2
        (win_h, win_w), _ = window_plan((gh, gw), cfg.window_size_hw)
        area = win_h * win_w
        total += cfg.layers_per_stage[s] * cfg.heads_per_stage[s] * area * area * bytes_per_el
    return total


# ---------------------------------------------------------------------------
# Attention / blocks
# ---------------------------------------------------------------------------


def window_attention(tokens_img, bp, num_heads, grid_hw, target_window_hw, is_shift_block, capture=False, impl="xla", cpb=None):
    """Windowed scaled-cosine attention on an image-like (B, H, W, C) tensor
    (windowed_attention.py:65-123). cpb: optional precomputed (H, A, A) bias
    from compute_cpb_stack; when None it is computed in-graph."""
    b, gh, gw, c = tokens_img.shape
    d = c // num_heads
    (win_h, win_w), (shift_h, shift_w) = window_plan((gh, gw), target_window_hw)
    shifting = is_shift_block and (shift_h > 0 or shift_w > 0)

    x = tokens_img
    if shifting:
        x = jnp.roll(x, shift=(-shift_h, -shift_w), axis=(1, 2))

    # partition into (B, nWy, nWx, A, C)
    nwy, nwx = gh // win_h, gw // win_w
    area = win_h * win_w
    x = x.reshape(b, nwy, win_h, nwx, win_w, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, nwy * nwx, area, c)

    qkv = linear(x, bp["qkv_kernel"], None).reshape(b, nwy * nwx, area, 3, num_heads, d)
    q = qkv[..., 0, :, :] + bp["q_bias"].astype(x.dtype).reshape(num_heads, d)
    k = qkv[..., 1, :, :]
    v = qkv[..., 2, :, :] + bp["v_bias"].astype(x.dtype).reshape(num_heads, d)

    # cosine attention: normalized q/k in f32, learned per-head scale
    # (logit_scale stored pre-clamped+exp'd by the converter,
    # convert_midas_state_dict_keys.py:115-131)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qf = qf * lax.rsqrt(jnp.sum(qf * qf, axis=-1, keepdims=True) + 1e-12)
    kf = kf * lax.rsqrt(jnp.sum(kf * kf, axis=-1, keepdims=True) + 1e-12)

    if cpb is None:
        cpb = cpb_bias(bp, (win_h, win_w), bp["_pretrained_window_size"])  # (H, A, A) f32
    mask = shift_mask_np((gh, gw), (win_h, win_w), (shift_h, shift_w)) if shifting else None

    use_kernel = False
    if impl == "pallas" and not capture:
        from ..ops.pallas.window_attention import window_flash_available

        # Round-5 per-op A/B (tools/window_ab.py, docs/performance.md): the
        # fused kernel wins only where the window count gives its grid real
        # parallelism — at Swin-L-384 stage shapes, nW=16 runs 2.1-2.2x
        # FASTER than the XLA composite while nW=4 is ~2x slower and nW=1 up
        # to 5x slower. The kernel's grid is b*nW*heads (one program per
        # (batch, window, head)), so batch multiplies its parallelism the
        # same way window count does — gate on the trace-time PRODUCT:
        # kernel for many-(batch×window) shapes, XLA einsum for the rest.
        # (At B=1 this is the original nW >= 8 stage gate.)
        use_kernel = (b * nwy * nwx >= 8) and window_flash_available()

    if use_kernel:
        from ..ops.pallas.window_attention import window_flash_attention

        # fold the logit scale into normalized q; kernel does dot+bias+softmax
        q_scaled = (qf * bp["logit_scale"].astype(jnp.float32).reshape(num_heads, 1)).astype(x.dtype)
        out = window_flash_attention(
            q_scaled, kf.astype(x.dtype), v, cpb, None if mask is None else jnp.asarray(mask)
        )
        weights = None
    else:
        logits = jnp.einsum("bwnhd,bwmhd->bwhnm", qf, kf, preferred_element_type=jnp.float32)
        logits = logits * bp["logit_scale"].astype(jnp.float32).reshape(1, 1, num_heads, 1, 1)
        logits = logits + cpb.astype(jnp.float32)[None, None]
        if mask is not None:
            logits = logits + jnp.asarray(mask)[None, :, None, :, :]
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bwhnm,bwmhd->bwnhd", weights.astype(v.dtype), v)

    out = out.reshape(b, nwy * nwx, area, c)
    out = linear(out, bp["proj_kernel"], bp["proj_bias"])

    # reverse partition (+ reverse shift)
    out = out.reshape(b, nwy, nwx, win_h, win_w, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, gh, gw, c)
    if shifting:
        out = jnp.roll(out, shift=(shift_h, shift_w), axis=(1, 2))
    return (out, weights) if capture else out


def block_forward(tokens_img, bp, num_heads, grid_hw, window_hw, is_shift_block, capture=False, impl="xla", cpb=None):
    """Post-norm Swin block (image_encoder_model.py:213-225)."""
    if capture:
        h, attn_w = window_attention(tokens_img, bp, num_heads, grid_hw, window_hw, is_shift_block, capture=True, cpb=cpb)
    else:
        h = window_attention(tokens_img, bp, num_heads, grid_hw, window_hw, is_shift_block, impl=impl, cpb=cpb)
        attn_w = None
    h = layer_norm(h, bp["norm1_scale"], bp["norm1_bias"], eps=SWIN_LN_EPS)
    tokens_img = tokens_img + h

    h = mlp_gelu(tokens_img, bp)
    h = layer_norm(h, bp["norm2_scale"], bp["norm2_bias"], eps=SWIN_LN_EPS)
    return (tokens_img + h, attn_w) if capture else tokens_img + h


def patch_merge(tokens_img, mp):
    """2x2 decimate-concat -> Linear (no bias) -> LayerNorm (patch_merge.py:49-103)."""
    tl = tokens_img[:, 0::2, 0::2, :]
    bl = tokens_img[:, 1::2, 0::2, :]
    tr = tokens_img[:, 0::2, 1::2, :]
    br = tokens_img[:, 1::2, 1::2, :]
    x = jnp.concatenate([tl, bl, tr, br], axis=-1)
    x = linear(x, mp["reduction_kernel"], None)
    return layer_norm(x, mp["norm_scale"], mp["norm_bias"], eps=SWIN_LN_EPS)


def encoder_forward(params, patch_tokens, patch_grid_hw, cfg: SwinV2Config, capture: bool = False, aux=None):
    """SwinV2 4-output encoder (image_encoder_model.py:77-98). Outputs are
    'rows of tokens' at grids g, g/2, g/4, g/8 with C, 2C, 4C, 8C features.
    aux: optional precomputed CPB bias stacks from compute_cpb_stack; when
    given, the CPB MLP + gather are skipped entirely per forward."""
    b = patch_tokens.shape[0]
    gh, gw = patch_grid_hw
    x = patch_tokens.reshape(b, gh, gw, -1)

    outputs = []
    grids = []
    internals = {"block_tokens": [], "attention": []} if capture else None
    for s in range(4):
        if s > 0:
            x = patch_merge(x, params["merges"][s - 1])
            gh, gw = gh // 2, gw // 2
        heads = cfg.heads_per_stage[s]
        pws = cfg.pretrained_window_sizes[s]
        stage_pairs = params["stages"][s]  # stacked over pairs
        stage_aux = None if aux is None else aux[s]
        num_pairs = cfg.layers_per_stage[s] // 2

        if capture:
            for i in range(num_pairs):
                pair = jax.tree_util.tree_map(lambda a: a[i], stage_pairs)
                pair_aux = None if stage_aux is None else jax.tree_util.tree_map(lambda a: a[i], stage_aux)
                for key, is_shift in (("b0", False), ("b1", True)):
                    bp = dict(pair[key])
                    bp["_pretrained_window_size"] = pws
                    cpb = None if pair_aux is None else pair_aux[key]
                    x, attn_w = block_forward(x, bp, heads, (gh, gw), cfg.window_size_hw, is_shift, capture=True, cpb=cpb)
                    internals["block_tokens"].append(x.reshape(b, gh * gw, -1))
                    internals["attention"].append(attn_w)
        else:

            def pair_body(carry, xs, heads=heads, gh=gh, gw=gw, pws=pws, cached=stage_aux is not None):
                pair, pair_aux = xs if cached else (xs, None)
                y = carry
                for key, is_shift in (("b0", False), ("b1", True)):
                    bp = dict(pair[key])
                    bp["_pretrained_window_size"] = pws
                    cpb = None if pair_aux is None else pair_aux[key]
                    y = block_forward(y, bp, heads, (gh, gw), cfg.window_size_hw, is_shift, impl=cfg.attn_impl, cpb=cpb)
                return y, None

            xs = stage_pairs if stage_aux is None else (stage_pairs, stage_aux)
            if num_pairs > 1:
                x = lax.scan(pair_body, x, xs)[0]
            else:
                first = jax.tree_util.tree_map(lambda a: a[0], xs)
                x = pair_body(x, first)[0]

        outputs.append(x.reshape(b, gh * gw, -1))
        grids.append((gh, gw))

    if capture:
        return tuple(outputs), tuple(grids), internals
    return tuple(outputs), tuple(grids)
