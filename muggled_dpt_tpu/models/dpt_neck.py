"""Shared DPT neck: reassembly -> fusion -> monocular depth head.

All four model families share this structure (SURVEY.md §1 data flow); family
differences are parameterized:
* readout handling: 'ignore' (Depth-Anything, reassembly_model.py:142),
  'project' (BEiT readout projection, v31_beit/components/readout_projection.py:19-83),
  'none' (SwinV2 — no cls token, v31_swinv2/reassembly_model.py:49-52)
* per-stage resampling: x4/x2/x1/x0.5 (DA & BEiT) or none (SwinV2 stages are
  already multi-scale)
* head upsample factor: patch_px/8 for DA (head_model.py:38-51), 2 for MiDaS
* metric heads end in sigmoid instead of relu (v2 head_model.py:84)

Everything is NHWC; upsampling uses the torch-parity bilinear align_corners=True
resize (misc_helpers.py:39-42) expressed as MXU matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.nn import conv2d, conv3x3_shiftsum, conv_transpose_blocky, conv_transpose_fuse_phase, gelu, linear
from ..ops.resize import resize_2d, resize_output_size
import jax


def readout_project(tokens_bnc, cls_bc, p):
    """DPT 'readout: project': concat cls onto every patch token -> Linear -> GELU
    (v31_beit/components/readout_projection.py:55-83)."""
    b, n, c = tokens_bnc.shape
    cls_expand = jnp.broadcast_to(cls_bc[:, None, :], (b, n, c))
    merged = jnp.concatenate([tokens_bnc, cls_expand], axis=-1)
    if "kernel_q8" in p:  # int8 tier (ops/quant.quantize_reassembly_params)
        from ..ops.quant import linear_w8a8

        h = linear_w8a8(merged, p["kernel_q8"], p["kernel_scale"], p["bias"])
    else:
        h = linear(merged, p["kernel"], p["bias"])
    return gelu(h)


def reassemble_stage(tokens, patch_grid_hw, p, scale, readout: str):
    """One reassembly block (reassembly_model.py:103-150): strip/merge readout
    token, unflatten to image-like NHWC, project+resample, fuse-projection."""
    gh, gw = patch_grid_hw
    if readout == "project":
        tokens = readout_project(tokens[:, 1:, :], tokens[:, 0, :], p["readout"])
    elif readout == "ignore":
        tokens = tokens[:, 1:, :]
    b, n, c = tokens.shape
    x = tokens.reshape(b, gh, gw, c)

    # projection (1x1 conv == linear over channels) then spatial resample;
    # int8 tier stores the projection as q8+scale (ops/quant.py)
    if "proj_kernel_q8" in p:
        from ..ops.quant import linear_w8a8

        x = linear_w8a8(x, p["proj_kernel_q8"], p["proj_kernel_scale"], p["proj_bias"])
    else:
        x = linear(x, p["proj_kernel"], p["proj_bias"])
    if scale in (2, 4):
        if "fused" in p and x.dtype == jnp.bfloat16:
            # bf16 serving: the conv-transpose + 3x3 fuse pair collapses into
            # phase-decomposed matmuls at input resolution (ops/nn.py:
            # fuse_transpose_conv3x3_weights) — same math, ~3-6x fewer FLOPs.
            # f32 parity mode keeps the dense ops (bit-faithful summation order).
            return conv_transpose_fuse_phase(x, p["fused"], int(scale))
        x = conv_transpose_blocky(x, p["resample_kernel"], p["resample_bias"])
    elif scale == 0.5:
        x = conv2d(x, p["resample_kernel"], p["resample_bias"], stride=2, padding=1)
    # scale == 1 or None: projection only

    # fuse projection: 3x3 conv, no bias (reassembly_model.py:135)
    return conv2d(x, p["fuse_kernel"], None, stride=1, padding=1)


def reassemble_forward(stage_tokens, patch_grid_hw, params_list, scales, readout: str):
    """4-stage reassembly (reassembly_model.py:54-93). scales e.g. (4,2,1,0.5)."""
    return tuple(
        reassemble_stage(t, patch_grid_hw, p, s, readout)
        for t, p, s in zip(stage_tokens, params_list, scales)
    )


def residual_conv_unit(x, p):
    """ReLU-Conv3x3-ReLU-Conv3x3 + skip (fusion_model.py:187-222). The int8
    tier stores the convs in shiftsum-GEMM q8 form (ops/quant.py)."""
    h = jax.nn.relu(x)
    if "conv1_kernel9_q8" in p:
        from ..ops.quant import conv3x3_shiftsum_w8a8

        h = conv3x3_shiftsum_w8a8(h, p["conv1_kernel9_q8"], p["conv1_kernel9_scale"], p["conv1_bias"])
        h = jax.nn.relu(h)
        h = conv3x3_shiftsum_w8a8(h, p["conv2_kernel9_q8"], p["conv2_kernel9_scale"], p["conv2_bias"])
        return h + x
    h = conv2d(h, p["conv1_kernel"], p["conv1_bias"], padding=1)
    h = jax.nn.relu(h)
    h = conv2d(h, p["conv2_kernel"], p["conv2_bias"], padding=1)
    return h + x


def _upsample_projection(x, p):
    """ResidualConv -> 2x bilinear (align_corners=True) -> 1x1 conv
    (fusion_model.py:159-184)."""
    x = residual_conv_unit(x, p["res2"])
    x = resize_2d(x, resize_output_size(x.shape[1:3], 2.0), mode="bilinear", align_corners=True)
    if "out_kernel_q8" in p:
        from ..ops.quant import linear_w8a8

        return linear_w8a8(x, p["out_kernel_q8"], p["out_kernel_scale"], p["out_bias"])
    return linear(x, p["out_kernel"], p["out_bias"])


def fusion_forward(reassembly_maps, params_blocks, input_scales=None):
    """RefineNet-style top-down fusion (fusion_model.py:55-80).

    params_blocks[i] corresponds to reference blocks[i]; blocks[3] is the
    top-most block (no reassembly conv / residual add, fusion_model.py:89-114).
    Returns a map at 8x the patch grid.

    input_scales: optional (f1, f2, f3, f4) per-block scaling of the top-most
    input / prior-fusion maps — the hook the fusion-scaling experiment drives
    (reference experiments/fusion_scaling.py:330-333).
    """
    f1, f2, f3, f4 = input_scales if input_scales is not None else (1.0, 1.0, 1.0, 1.0)
    upx4, upx2, noscale, downx2 = reassembly_maps
    x = _upsample_projection(downx2 * f4, params_blocks[3])
    for fmap, p, s in ((noscale, params_blocks[2], f3), (upx2, params_blocks[1], f2), (upx4, params_blocks[0], f1)):
        x = residual_conv_unit(fmap, p["res1"]) + x * s
        x = _upsample_projection(x, p)
    return x


def head_forward(fused_nhwc, p, upsample_factor: float, is_metric: bool):
    """Monocular depth head (head_model.py:61-106): Conv3x3 C->C/2 -> upsample
    -> Conv3x3->32 -> ReLU -> Conv1x1->1 -> ReLU (or Sigmoid for metric)."""
    if "conv_in_kernel9_q8" in p:
        from ..ops.quant import conv3x3_shiftsum_w8a8

        x = conv3x3_shiftsum_w8a8(fused_nhwc, p["conv_in_kernel9_q8"], p["conv_in_kernel9_scale"], p["conv_in_bias"])
    else:
        x = conv2d(fused_nhwc, p["conv_in_kernel"], p["conv_in_bias"], padding=1)
    out_hw = resize_output_size(x.shape[1:3], upsample_factor)
    x = resize_2d(x, out_hw, mode="bilinear", align_corners=True)
    # ->32 channels wastes MXU lanes in a direct conv; see conv3x3_shiftsum
    if "conv_mid_kernel9_q8" in p:
        from ..ops.quant import conv3x3_shiftsum_w8a8

        x = conv3x3_shiftsum_w8a8(x, p["conv_mid_kernel9_q8"], p["conv_mid_kernel9_scale"], p["conv_mid_bias"])
    else:
        x = conv3x3_shiftsum(x, p["conv_mid_kernel"], p["conv_mid_bias"])
    x = jax.nn.relu(x)
    x = linear(x, p["proj_kernel"], p["proj_bias"])
    x = jax.nn.sigmoid(x) if is_metric else jax.nn.relu(x)
    return x[..., 0]  # (B, H, W)
