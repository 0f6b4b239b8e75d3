"""DINOv2 image encoder (Depth-Anything V1 & V2), functional JAX.

Reference behavior (cited for parity):
* 4-stage structure & shared output norm: v2_depthanything/image_encoder_model.py:64-94
* pre-norm block with LayerScale: v2_depthanything/components/transformer_block.py:53-65
* SwiGLU switch for ViT-Giant: transformer_block.py:47-48
* learned pos-embed resized per grid via f32 bicubic (antialias=False):
  v2_depthanything/components/position_encoder.py:108-143
* V1 taps the last 4 consecutive blocks instead of 4 even stages:
  v1_depthanything/image_encoder_model.py:92-104 (everything else identical)

TPU-first design notes: all transformer blocks within a model are identical in
shape, so block parameters are *stacked* along a leading layer axis and the
encoder body is a single `lax.scan` — one compiled block program regardless of
depth (fast compiles, and XLA double-buffers the parameter streaming from HBM).
The per-grid pos-embed resize happens at trace time through ops.resize, so each
compiled executable bakes in its grid — the XLA analog of the reference's
GridCache (position_encoder.py:152-212).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.nn import layer_norm, mlp_gelu, mlp_swiglu, self_attention
from ..ops.resize import resize_2d


@dataclass(frozen=True)
class DinoV2Config:
    features: int
    num_heads: int
    num_blocks: int
    base_grid_hw: tuple[int, int]
    is_giant: bool = False
    taps: tuple[int, ...] = ()  # block indices whose outputs feed the DPT neck
    attn_impl: str = "xla"
    # Unrolled blocks run faster on v5e (XLA fuses across layers) but compile
    # slower per input shape — off by default to keep interactive
    # size-switching usable; turn on for serving. True = full Python unroll;
    # an int k >= 2 = lax.scan(unroll=k). The round-4e interleaved confirm
    # @504^2 ViT-L: scan 81.2 fps / k=6 96.0 (31 s compile) / k=12 96.0 /
    # full 94.0 (106 s cold) — k=6 is the serving knee, beating even full
    # unroll at runtime (tools/scan_unroll_curve.py charts the curve).
    unroll: bool | int = False

    @staticmethod
    def stage_taps(num_blocks: int) -> tuple[int, ...]:
        """V2: output after each quarter of the blocks (image_encoder_model.py:68-76)."""
        per = num_blocks // 4
        return tuple(per * (i + 1) - 1 for i in range(4))

    @staticmethod
    def last4_taps(num_blocks: int) -> tuple[int, ...]:
        """V1: outputs of the last 4 consecutive blocks (v1 image_encoder_model.py:92-104)."""
        return tuple(range(num_blocks - 4, num_blocks))


def block_forward(tokens, bp, cfg: DinoV2Config, capture: bool = False):
    """One pre-norm transformer block with LayerScale (transformer_block.py:53-65)."""
    h = layer_norm(tokens, bp["norm1_scale"], bp["norm1_bias"])
    if capture:
        h, attn_weights = self_attention(h, bp, cfg.num_heads, impl=cfg.attn_impl, capture=True)
    else:
        h = self_attention(h, bp, cfg.num_heads, impl=cfg.attn_impl)
        attn_weights = None
    tokens = tokens + bp["ls1"].astype(tokens.dtype) * h

    h = layer_norm(tokens, bp["norm2_scale"], bp["norm2_bias"])
    h = mlp_swiglu(h, bp) if cfg.is_giant else mlp_gelu(h, bp)
    tokens = tokens + bp["ls2"].astype(tokens.dtype) * h
    return (tokens, attn_weights) if capture else tokens


def resize_pos_embed(pos_embed_1nf, base_grid_hw, target_grid_hw):
    """f32 bicubic (antialias=False) resize of the learned patch position
    embedding (position_encoder.py:108-143). Trace-time-constant shapes."""
    bh, bw = base_grid_hw
    th, tw = target_grid_hw
    c = pos_embed_1nf.shape[-1]
    orig_dtype = pos_embed_1nf.dtype
    grid = pos_embed_1nf.astype(jnp.float32).reshape(1, bh, bw, c)
    if (th, tw) != (bh, bw):
        grid = resize_2d(grid, (th, tw), mode="bicubic", align_corners=False, antialias=False)
    return grid.reshape(1, th * tw, c).astype(orig_dtype)


def encoder_forward(params, patch_tokens, patch_grid_hw, cfg: DinoV2Config, capture: bool = False):
    """DINOv2 4-output encoder (image_encoder_model.py:80-94).

    patch_tokens: (B, N, F). Returns 4 token tensors (B, 1+N, F), each passed
    through the shared output LayerNorm. With capture=True also returns a dict
    of per-block internals (functional replacement for torch forward hooks).
    """
    b = patch_tokens.shape[0]
    # Positional embedding + cls token (position_encoder.py:55-92)
    pos = resize_pos_embed(params["pos_embed"], cfg.base_grid_hw, patch_grid_hw)
    patch_tokens = patch_tokens + pos.astype(patch_tokens.dtype)
    cls_tok = (params["cls_token"] + params["cls_embed"]).astype(patch_tokens.dtype)
    tokens = jnp.concatenate([jnp.broadcast_to(cls_tok, (b, 1, cfg.features)), patch_tokens], axis=1)

    stacked = params["blocks"]
    taps = cfg.taps or DinoV2Config.stage_taps(cfg.num_blocks)

    if not capture:
        outputs = []
        if cfg.unroll is True:
            for i in range(cfg.num_blocks):
                bp = jax.tree_util.tree_map(lambda a: a[i], stacked)
                tokens = block_forward(tokens, bp, cfg)
                if i in taps:
                    outputs.append(tokens)
        else:
            # int unroll >= 2: partial scan unrolling — XLA fuses across k
            # adjacent blocks while the loop structure keeps compile bounded
            k = int(cfg.unroll) if cfg.unroll else 1
            start = 0

            def body(tok, bp):
                return block_forward(tok, bp, cfg), None

            for t in taps:
                seg = jax.tree_util.tree_map(lambda a: a[start : t + 1], stacked)
                tokens = lax.scan(body, tokens, seg, unroll=k)[0]
                outputs.append(tokens)
                start = t + 1
        outnorm = lambda x: layer_norm(x, params["outnorm_scale"], params["outnorm_bias"])
        return tuple(outnorm(o) for o in outputs)

    # Introspection mode: unrolled loop, exposes per-block tokens & softmax maps
    internals = {"block_tokens": [], "attention": []}
    outputs = []
    for i in range(cfg.num_blocks):
        bp = jax.tree_util.tree_map(lambda a: a[i], stacked)
        tokens, attn = block_forward(tokens, bp, cfg, capture=True)
        internals["block_tokens"].append(tokens)
        internals["attention"].append(attn)
        if i in taps:
            outputs.append(tokens)
    outnorm = lambda x: layer_norm(x, params["outnorm_scale"], params["outnorm_bias"])
    return tuple(outnorm(o) for o in outputs), internals
