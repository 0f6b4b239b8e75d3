"""Emit DPT forwards as fixed-shape ONNX graphs.

The artifact analog of the reference's `experiments/export_onnx.py`
(muggled_dpt reference, export_onnx.py:117-211): users with onnxruntime
pipelines get a runnable `.onnx` of the depth model. The reference gets this
via torch tracing; here the graph is emitted directly from this repo's
functional params pytree — every node mirrors the corresponding op in
`models/{depth_anything,dinov2,beit,swinv2}.py` / `models/dpt_neck.py` /
`ops/nn.py`, and CI executes the emitted graph with the in-repo numpy
evaluator against the JAX f32 forward (tests/test_onnx_export.py).

Scope: the Depth-Anything families (V1 / V2 / V2-metric / SwiGLU giant),
MiDaS-v3.1 BEiT, and MiDaS-v3.1 SwinV2. Input is the model's normalized
(1, 3, H, W) f32 tensor
(the `DPTModel.forward` contract); output is depth (1, H', W'). Shapes are
fixed at export time, matching this repo's jit-per-shape execution model (use
`DPTModel.prepare_image_bgr` or replicate the family normalization for
preprocessing). BEiT's per-layer relative-position bias is baked per grid as
initializers — mind the artifact size at large grids (calculate_bias_bytes,
models/beit.py:81).
"""

from __future__ import annotations

import math

import numpy as np

from ..models.dinov2 import DinoV2Config, resize_pos_embed
from ..checkpoints.depth_anything import REASSEMBLY_SCALES
from ..ops.resize import resize_output_size
from .builder import GraphBuilder


def _np(a) -> np.ndarray:
    return np.asarray(a, np.float32)


def _gelu_erf(g: GraphBuilder, x: str) -> str:
    """0.5 * x * (1 + erf(x / sqrt(2))) — the exact (f32-parity) GELU form
    (ops/nn.py:gelu)."""
    inv_sqrt2 = g.init("inv_sqrt2", np.float32(1.0 / math.sqrt(2.0)))
    one = g.init("one", np.float32(1.0))
    half = g.init("half", np.float32(0.5))
    e = g.op("Erf", [g.op("Mul", [x, inv_sqrt2])])
    return g.op("Mul", [g.op("Mul", [x, g.op("Add", [e, one])]), half])


def _linear(g: GraphBuilder, x: str, kernel: np.ndarray, bias: np.ndarray | None, hint: str) -> str:
    y = g.op("MatMul", [x, g.init(hint + "_w", kernel)])
    if bias is not None:
        y = g.op("Add", [y, g.init(hint + "_b", bias)])
    return y


def _conv(g: GraphBuilder, x: str, kernel_hwio: np.ndarray, bias, hint: str, stride=1, pad=0) -> str:
    """NCHW Conv from an HWIO kernel (ops/nn.py:conv2d layout)."""
    w = g.init(hint + "_w", kernel_hwio.transpose(3, 2, 0, 1))  # HWIO -> OIHW
    ins = [x, w]
    if bias is not None:
        ins.append(g.init(hint + "_b", bias))
    kh, kw = kernel_hwio.shape[:2]
    return g.op(
        "Conv", ins, strides=[stride, stride], pads=[pad, pad, pad, pad],
        kernel_shape=[kh, kw], dilations=[1, 1], group=1,
    )


def _conv1x1_from_linear(g: GraphBuilder, x: str, kernel_io: np.ndarray, bias, hint: str) -> str:
    """1x1 NCHW Conv from an (in, out) linear kernel (ops/nn.py:linear on NHWC)."""
    w = g.init(hint + "_w", kernel_io.T[:, :, None, None])  # (out, in, 1, 1)
    ins = [x, w]
    if bias is not None:
        ins.append(g.init(hint + "_b", bias))
    return g.op("Conv", ins, strides=[1, 1], pads=[0, 0, 0, 0], kernel_shape=[1, 1], dilations=[1, 1], group=1)


def _resize(g: GraphBuilder, x: str, out_hw: tuple[int, int], in_chw: tuple[int, int, int]) -> str:
    """Bilinear align_corners resize (ops/resize.py torch-parity mode used by
    the fusion/head upsamples, dpt_neck.py:80,109)."""
    sizes = g.init("sizes", np.asarray([1, in_chw[0], out_hw[0], out_hw[1]], np.int64))
    return g.op(
        "Resize", [x, "", "", sizes], mode="linear",
        coordinate_transformation_mode="align_corners",
    )


def _resize_scale(g: GraphBuilder, x: str, scale: float) -> str:
    """Scale-driven bilinear align_corners resize for the dynamic-axes graphs:
    ONNX computes output = floor(in * scale), the same rule as
    ops/resize.py:resize_output_size (torch's interpolate(scale_factor=s))."""
    scales = g.init("scales", np.asarray([1.0, 1.0, scale, scale], np.float32))
    return g.op(
        "Resize", [x, "", scales], mode="linear",
        coordinate_transformation_mode="align_corners",
    )


def _slice(g: GraphBuilder, x: str, starts, ends, axes) -> str:
    i64 = lambda hint, v: g.init(hint, np.asarray(v, np.int64))
    return g.op("Slice", [x, i64("starts", starts), i64("ends", ends), i64("axes", axes)])


def _reshape(g: GraphBuilder, x: str, shape) -> str:
    return g.op("Reshape", [x, g.init("shape", np.asarray(shape, np.int64))])


_I32MAX = 2**31 - 1


def _squeeze(g: GraphBuilder, x: str, axis: int) -> str:
    return g.op("Squeeze", [x, g.init("sq_axes", np.asarray([axis], np.int64))])


def _attention(g: GraphBuilder, x: str, bp: dict, heads: int, c: int, bias=None) -> str:
    """Fused-QKV self-attention with the head-major column layout
    (ops/nn.py:self_attention; checkpoints/convert_common.py:qkv_head_major).
    bias: optional (1, H, N, N) additive logit bias — a numpy array baked as
    an initializer (BEiT fixed-shape export, ops/nn.py:sdpa) or the NAME of a
    graph tensor computed at runtime (BEiT dynamic export). Shape-agnostic
    over batch and token count (0/-1 Reshapes + Squeeze), so the same emitter
    serves the fixed-shape and dynamic-axes graphs."""
    d = c // heads
    qkv = _linear(g, x, _np(bp["qkv_kernel"]), _np(bp["qkv_bias"]), "qkv")
    qkv = _reshape(g, qkv, [0, -1, heads, 3, d])
    qkv = g.op("Transpose", [qkv], perm=[3, 0, 2, 1, 4])  # (3, B, H, N, D)
    parts = []
    for i in range(3):
        p = _slice(g, qkv, [i], [i + 1], [0])
        parts.append(_squeeze(g, p, 0))  # (B, H, N, D)
    q, k, v = parts
    scale = g.init("attn_scale", np.float32(d ** -0.5))
    q = g.op("Mul", [q, scale])  # q pre-scaled, as in ops/nn.py:sdpa
    kt = g.op("Transpose", [k], perm=[0, 1, 3, 2])  # (B, H, D, N)
    logits = g.op("MatMul", [q, kt])  # (B, H, N, N)
    if bias is not None:
        bias_name = bias if isinstance(bias, str) else g.init("attn_bias", np.asarray(bias, np.float32))
        logits = g.op("Add", [logits, bias_name])
    weights = g.op("Softmax", [logits], axis=-1)
    out = g.op("MatMul", [weights, v])  # (B, H, N, D)
    out = g.op("Transpose", [out], perm=[0, 2, 1, 3])
    out = _reshape(g, out, [0, 0, -1])  # (B, N, C)
    return _linear(g, out, _np(bp["proj_kernel"]), _np(bp["proj_bias"]), "attn_proj")


def _mlp(g: GraphBuilder, x: str, bp: dict, is_giant: bool) -> str:
    if is_giant:  # SwiGLU (ops/nn.py:mlp_swiglu): w3(silu(a) * b), [a|b] = w12 x
        h = _linear(g, x, _np(bp["w12_kernel"]), _np(bp["w12_bias"]), "w12")
        hidden = int(_np(bp["w12_kernel"]).shape[-1]) // 2
        a = _slice(g, h, [0], [hidden], [-1])
        b = _slice(g, h, [hidden], [_I32MAX], [-1])
        silu = g.op("Mul", [a, g.op("Sigmoid", [a])])
        return _linear(g, g.op("Mul", [silu, b]), _np(bp["w3_kernel"]), _np(bp["w3_bias"]), "w3")
    h = _linear(g, x, _np(bp["fc1_kernel"]), _np(bp["fc1_bias"]), "fc1")
    return _linear(g, _gelu_erf(g, h), _np(bp["fc2_kernel"]), _np(bp["fc2_bias"]), "fc2")


def _layer_norm(g: GraphBuilder, x: str, scale, bias, hint: str, eps: float = 1e-6) -> str:
    """eps defaults to the ViT families' 1e-6 (ops/nn.py:layer_norm); SwinV2
    passes torch's default 1e-5 (models/swinv2.py:SWIN_LN_EPS)."""
    return g.op(
        "LayerNormalization",
        [x, g.init(hint + "_s", _np(scale)), g.init(hint + "_b", _np(bias))],
        axis=-1, epsilon=float(eps),
    )


def _slice_step(g: GraphBuilder, x: str, starts, ends, axes, steps) -> str:
    i64 = lambda hint, v: g.init(hint, np.asarray(v, np.int64))
    return g.op(
        "Slice",
        [x, i64("starts", starts), i64("ends", ends), i64("axes", axes), i64("steps", steps)],
    )


def _roll_axis(g: GraphBuilder, x: str, shift: int, size: int, axis: int) -> str:
    """jnp.roll on one axis as Slice+Concat (ONNX has no Roll). Positive shift
    moves content toward higher indices, matching jnp.roll / torch.roll
    (models/swinv2.py:window_attention cyclic shifting)."""
    s = shift % size
    if s == 0:
        return x
    lead = _slice(g, x, [size - s], [_I32MAX], [axis])
    tail = _slice(g, x, [0], [size - s], [axis])
    return g.op("Concat", [lead, tail], axis=axis)


def _l2_normalize(g: GraphBuilder, x: str, hint: str) -> str:
    """x / sqrt(sum(x^2, -1) + 1e-12) — the cosine-attention q/k normalize
    (models/swinv2.py:209-212)."""
    sq = g.op("Mul", [x, x])
    ss = g.op("ReduceSum", [sq, g.init(hint + "_axes", np.asarray([-1], np.int64))], keepdims=1)
    denom = g.op("Sqrt", [g.op("Add", [ss, g.init(hint + "_eps", np.float32(1e-12))])])
    return g.op("Div", [x, denom])


def _rcu(g: GraphBuilder, x: str, p: dict, in_chw, hint: str) -> str:
    """ReLU-Conv3x3-ReLU-Conv3x3 + skip (dpt_neck.py:residual_conv_unit)."""
    h = g.op("Relu", [x])
    h = _conv(g, h, _np(p["conv1_kernel"]), _np(p["conv1_bias"]), hint + "_c1", pad=1)
    h = g.op("Relu", [h])
    h = _conv(g, h, _np(p["conv2_kernel"]), _np(p["conv2_bias"]), hint + "_c2", pad=1)
    return g.op("Add", [h, x])


def _upsample_projection(g: GraphBuilder, x: str, p: dict, in_chw, hint: str, dyn: bool = False) -> tuple[str, tuple | None]:
    """RCU -> 2x bilinear align_corners -> 1x1 conv (dpt_neck.py:76-81).
    dyn=True emits a scale-driven Resize and returns shape None."""
    x = _rcu(g, x, p["res2"], in_chw, hint + "_res2")
    if dyn:
        x = _resize_scale(g, x, 2.0)
        x = _conv1x1_from_linear(g, x, _np(p["out_kernel"]), _np(p["out_bias"]), hint + "_out")
        return x, None
    c, h, w = in_chw
    oh, ow = resize_output_size((h, w), 2.0)
    x = _resize(g, x, (oh, ow), in_chw)
    x = _conv1x1_from_linear(g, x, _np(p["out_kernel"]), _np(p["out_bias"]), hint + "_out")
    return x, (int(_np(p["out_kernel"]).shape[-1]), oh, ow)


def _emit_neck(g: GraphBuilder, model, stage_tokens, c: int, gh: int, gw: int, readout: str, grid_shape: str | None = None) -> tuple[str, tuple[int, int] | None]:
    """Reassembly -> fusion -> head, shared across families
    (models/dpt_neck.py). Returns (output name, depth (h, w)).

    grid_shape: name of a runtime int64 [B, C, gh, gw] tensor (the Shape of
    the patch-embed conv output). When given, the graph is emitted with
    dynamic batch/height/width: token->grid Reshapes use it and all fusion /
    head Resizes are scale-driven. gh/gw are then ignored and the returned
    depth shape is None."""
    params = model.params
    dyn = grid_shape is not None

    maps = []
    map_shapes = []
    for si, (tok, p, scale) in enumerate(zip(stage_tokens, params["reassemble"], REASSEMBLY_SCALES)):
        if readout == "project":
            # concat cls onto every patch token -> Linear -> GELU
            # (dpt_neck.py:readout_project; v31_beit readout_projection.py:55-83)
            patches = _slice(g, tok, [1], [_I32MAX], [1])
            cls = _slice(g, tok, [0], [1], [1])
            if dyn:
                # (B, A, C) target shape assembled at runtime from the patch
                # grid: B from the Shape tensor, A = gh*gw
                b1 = _slice(g, grid_shape, [0], [1], [0])
                gh1 = _slice(g, grid_shape, [2], [3], [0])
                gw1 = _slice(g, grid_shape, [3], [4], [0])
                a1 = g.op("Mul", [gh1, gw1])
                shape = g.op(
                    "Concat", [b1, a1, g.init(f"re{si}_cls_c", np.asarray([c], np.int64))], axis=0
                )
                cls_e = g.op("Expand", [cls, shape])
            else:
                cls_e = g.op("Expand", [cls, g.init(f"re{si}_cls_shape", np.asarray([1, gh * gw, c], np.int64))])
            merged = g.op("Concat", [patches, cls_e], axis=-1)
            ro = params["reassemble"][si]["readout"]
            t = _gelu_erf(g, _linear(g, merged, _np(ro["kernel"]), _np(ro["bias"]), f"re{si}_readout"))
        else:  # 'ignore': drop the cls token (dpt_neck.py:reassemble_stage)
            t = _slice(g, tok, [1], [_I32MAX], [1])
        t = g.op("Transpose", [t], perm=[0, 2, 1])  # (B, C, N)
        if dyn:
            t = g.op("Reshape", [t, grid_shape])  # (B, C, gh, gw) at runtime
        else:
            t = _reshape(g, t, [1, c, gh, gw])
        proj_k = _np(p["proj_kernel"])  # (C, C_out) linear == 1x1 conv
        t = _conv1x1_from_linear(g, t, proj_k, _np(p["proj_bias"]), f"re{si}_proj")
        h_, w_ = gh, gw
        if scale in (2, 4):
            rk = _np(p["resample_kernel"])  # (kh, kw, ci, co) blocky transpose
            w_onnx = g.init(f"re{si}_up_w", rk.transpose(2, 3, 0, 1))  # (ci, co, kh, kw)
            t = g.op(
                "ConvTranspose", [t, w_onnx, g.init(f"re{si}_up_b", _np(p["resample_bias"]))],
                strides=[rk.shape[0], rk.shape[1]], kernel_shape=[rk.shape[0], rk.shape[1]],
                pads=[0, 0, 0, 0], dilations=[1, 1], group=1,
            )
            h_, w_ = gh * rk.shape[0], gw * rk.shape[1]
        elif scale == 0.5:
            rk = _np(p["resample_kernel"])
            t = _conv(g, t, rk, _np(p["resample_bias"]), f"re{si}_down", stride=2, pad=1)
            h_, w_ = (gh + 2 - rk.shape[0]) // 2 + 1, (gw + 2 - rk.shape[1]) // 2 + 1
        fk = _np(p["fuse_kernel"])  # 3x3, no bias (reassembly_model.py:135)
        t = _conv(g, t, fk, None, f"re{si}_fuse", pad=1)
        maps.append(t)
        map_shapes.append((fk.shape[-1], h_, w_))

    return _emit_fusion_head(g, model, maps, map_shapes, dyn=dyn)


def _emit_fusion_head(g: GraphBuilder, model, maps, map_shapes, dyn: bool = False) -> tuple[str, tuple[int, int] | None]:
    """Top-down fusion + monocular head (dpt_neck.py:fusion_forward,
    head_forward). maps are NCHW reassembly outputs, finest first.
    dyn=True: scale-driven Resizes, Squeeze instead of a fixed final Reshape,
    returns depth shape None."""
    is_metric = bool(model.config.get("is_metric", False))
    fusion = model.params["fusion"]
    x, shp = _upsample_projection(g, maps[3], fusion[3], map_shapes[3], "fu3", dyn=dyn)
    for mi, bi in ((2, 2), (1, 1), (0, 0)):
        r = _rcu(g, maps[mi], fusion[bi]["res1"], map_shapes[mi], f"fu{bi}_res1")
        x = g.op("Add", [r, x])
        x, shp = _upsample_projection(g, x, fusion[bi], map_shapes[mi], f"fu{bi}", dyn=dyn)

    # Head (dpt_neck.py:head_forward)
    head = model.params["head"]
    cin_k = _np(head["conv_in_kernel"])
    x = _conv(g, x, cin_k, _np(head["conv_in_bias"]), "head_in", pad=1)
    if dyn:
        out_hw = None
        x = _resize_scale(g, x, float(model.spec["head_upsample"]))
    else:
        shp = (cin_k.shape[-1], shp[1], shp[2])
        out_hw = resize_output_size((shp[1], shp[2]), model.spec["head_upsample"])
        x = _resize(g, x, out_hw, shp)
    x = _conv(g, x, _np(head["conv_mid_kernel"]), _np(head["conv_mid_bias"]), "head_mid", pad=1)
    x = g.op("Relu", [x])
    x = _conv1x1_from_linear(g, x, _np(head["proj_kernel"]), _np(head["proj_bias"]), "head_proj")
    x = g.op("Sigmoid" if is_metric else "Relu", [x])
    if dyn:
        x = _squeeze(g, x, 1)  # (B, 1, H, W) -> (B, H, W)
    else:
        x = _reshape(g, x, [1, out_hw[0], out_hw[1]])
    return x, out_hw


def emit_depth_anything_onnx(model, image_hw: tuple[int, int] | None = None, dynamic: bool = False) -> bytes:
    """Build the ONNX ModelProto bytes for a Depth-Anything `DPTModel`.

    model: a DPTModel from make_depthanything{v1,v2}_dpt (any dtype — weights
    are exported in f32).

    Fixed-shape mode (default): image_hw must satisfy the model's tiling
    constraint (use model.compute_scaled_hw / verify_input); grid-dependent
    tensors (resized pos-embed) are baked at export time, matching this
    repo's jit-per-shape execution model.

    dynamic=True: the analog of the reference's dynamic-axes export
    (reference experiments/export_onnx.py:117-130, dynamic batch/height/
    width). The input is declared ("batch", 3, "height", "width") and every
    grid-dependent computation moves in-graph: the pos-embed bicubic resize
    becomes a runtime Resize (mode=cubic, A=-0.75, pytorch_half_pixel — the
    exact op torch's own exporter emits for F.interpolate bicubic,
    antialias=False, matching ops/resize.py's trace-time matrices), token->
    grid Reshapes are driven by the Shape of the patch-embed output, and the
    fusion/head upsamples use scale-driven Resizes (output = floor(in*s), the
    resize_output_size rule). image_hw is ignored. Feeds must still satisfy
    the family tiling constraint (H, W multiples of 2*patch = 28 px for DA —
    DPTModel.verify_input), which also keeps every internal grid even.
    Only the DA families support this: BEiT/SwinV2 bake grid-dependent bias/
    mask tensors, the same restriction the reference hits for SwinV2
    (reference experiments/README.md:87).
    """
    params = model.params
    cfg: DinoV2Config = model.spec["encoder_config"]
    p_px = model.patch_size_px
    c = cfg.features
    bh, bw = cfg.base_grid_hw

    g = GraphBuilder("depth_anything_dynamic" if dynamic else "depth_anything")
    grid_shape = None
    if dynamic:
        x = g.add_input("image", ("batch", 3, "height", "width"))
        gh = gw = 0  # static bookkeeping unused on the dynamic path
    else:
        ih, iw = int(image_hw[0]), int(image_hw[1])
        assert ih % p_px == 0 and iw % p_px == 0, "image_hw must be patch-aligned (compute_scaled_hw)"
        gh, gw = ih // p_px, iw // p_px
        x = g.add_input("image", (1, 3, ih, iw))

    # Patch embed: stride==kernel conv (ops/nn.py:patchify_embed as a conv)
    pe_k = _np(params["patch_embed"]["kernel"])  # (P, P, 3, F) HWIO
    x = _conv(g, x, pe_k, _np(params["patch_embed"]["bias"]), "patch_embed", stride=p_px)
    if dynamic:
        grid_shape = g.op("Shape", [x])  # int64 [B, C, gh, gw]
        x = _reshape(g, x, [0, c, -1])
    else:
        x = _reshape(g, x, [1, c, gh * gw])
    x = g.op("Transpose", [x], perm=[0, 2, 1])  # (B, N, C)

    if dynamic:
        # Position embedding resized in-graph per input grid
        # (models/dinov2.py:resize_pos_embed, done at trace time in JAX)
        pos4 = _np(params["encoder"]["pos_embed"]).reshape(1, bh, bw, c).transpose(0, 3, 1, 2)
        hw = _slice(g, grid_shape, [2], [4], [0])  # int64 [gh, gw]
        sizes = g.op("Concat", [g.init("pos_nc", np.asarray([1, c], np.int64)), hw], axis=0)
        pos_r = g.op(
            "Resize", [g.init("pos_embed_grid", pos4), "", "", sizes],
            mode="cubic", cubic_coeff_a=-0.75,
            coordinate_transformation_mode="pytorch_half_pixel",
        )
        pos_f = _reshape(g, pos_r, [0, 0, -1])  # (1, C, N)
        x = g.op("Add", [x, g.op("Transpose", [pos_f], perm=[0, 2, 1])])
    else:
        # resized for this grid at export time (baked, exactly as jit bakes
        # it at trace time — models/dinov2.py:resize_pos_embed)
        pos = np.asarray(
            resize_pos_embed(_np(params["encoder"]["pos_embed"]), cfg.base_grid_hw, (gh, gw)), np.float32
        )
        x = g.op("Add", [x, g.init("pos_embed", pos)])

    cls_tok = _np(params["encoder"]["cls_token"]) + _np(params["encoder"]["cls_embed"])
    cls_init = g.init("cls_token", cls_tok.reshape(1, 1, c))
    if dynamic:
        b1 = _slice(g, grid_shape, [0], [1], [0])  # int64 [B]
        cls_shape = g.op("Concat", [b1, g.init("cls_tail", np.asarray([1, c], np.int64))], axis=0)
        cls_init = g.op("Expand", [cls_init, cls_shape])
    x = g.op("Concat", [cls_init, x], axis=1)

    stacked = params["encoder"]["blocks"]
    taps = cfg.taps or DinoV2Config.stage_taps(cfg.num_blocks)
    stage_tokens = []
    for i in range(cfg.num_blocks):
        bp = {k: np.asarray(v)[i] for k, v in stacked.items()}
        h = _layer_norm(g, x, bp["norm1_scale"], bp["norm1_bias"], f"b{i}_ln1")
        h = _attention(g, h, bp, cfg.num_heads, c)
        h = g.op("Mul", [h, g.init(f"b{i}_ls1", _np(bp["ls1"]))])
        x = g.op("Add", [x, h])
        h = _layer_norm(g, x, bp["norm2_scale"], bp["norm2_bias"], f"b{i}_ln2")
        h = _mlp(g, h, bp, cfg.is_giant)
        h = g.op("Mul", [h, g.init(f"b{i}_ls2", _np(bp["ls2"]))])
        x = g.op("Add", [x, h])
        if i in taps:
            stage_tokens.append(
                _layer_norm(g, x, params["encoder"]["outnorm_scale"], params["encoder"]["outnorm_bias"], f"tap{i}_outnorm")
            )

    x, out_hw = _emit_neck(g, model, stage_tokens, c, gh, gw, readout="ignore", grid_shape=grid_shape)
    if dynamic:
        g.add_output(x, ("batch", "out_height", "out_width"))
        doc = (
            f"Depth-Anything DPT, dynamic input (batch,3,height,width), height/width "
            f"multiples of {2 * p_px}, normalized RGB; depth (batch,out_height,out_width)"
        )
    else:
        g.add_output(x, (1, out_hw[0], out_hw[1]))
        doc = f"Depth-Anything DPT, fixed input (1,3,{ih},{iw}), normalized RGB; depth (1,{out_hw[0]},{out_hw[1]})"
    return g.serialize(opset=17, doc=doc)


def _beit_dynamic_bias_setup(g: GraphBuilder, relpos_lut: np.ndarray, base_grid_hw, heads: int, grid_shape: str):
    """Emit the grid-dependent relative-position machinery IN-GRAPH for the
    dynamic BEiT export — the runtime analog of models/beit.py:
    compute_bias_stack (reference relative_positional_encoder.py:242-309):

    * the token LUT's bilinear rescale to (2gh-1, 2gw-1) becomes a runtime
      Resize (mode=linear, pytorch_half_pixel — torch-default bilinear,
      align_corners=False, the exact mode the reference uses at :290);
    * the deterministic (N-1, N-1) relative-index matrix
      (relative_positional_encoder.py:117-238) is built from Range/Sub/Mul
      over the runtime grid dims;
    * per block, the bias is assembled as Gather(LUT, index) for the
      token-token body plus the 3 special cls rows/columns concatenated as
      borders (same final state as the reference's index writes).

    Returns (full_lut, specials, idx_tok, a1) graph-tensor names:
    full_lut (L, H, R') resized+flattened LUT, specials (L, H, 3), idx_tok
    (A, A) int64, a1 the 1-element [A] tensor."""
    num_layers = relpos_lut.shape[0]
    bh, bw = base_grid_hw
    ref_h, ref_w = 2 * bh - 1, 2 * bw - 1
    # token part as an (L, H, ref_h, ref_w) image for Resize; specials kept
    # separate, unresized (compute_bias_stack concatenates them back after)
    lut = np.asarray(relpos_lut, np.float32)  # (L, R, H)
    token4 = lut[:, : ref_h * ref_w, :].reshape(num_layers, ref_h, ref_w, heads).transpose(0, 3, 1, 2)
    specials = lut[:, ref_h * ref_w :, :].transpose(0, 2, 1)  # (L, H, 3)
    token_init = g.init("relpos_lut_grid", np.ascontiguousarray(token4))
    specials_name = g.init("relpos_specials", np.ascontiguousarray(specials))

    i64 = lambda hint, v: g.init(hint, np.asarray(v, np.int64))
    gh1 = _slice(g, grid_shape, [2], [3], [0])
    gw1 = _slice(g, grid_shape, [3], [4], [0])
    two = i64("i64_two", [2])
    one = i64("i64_one", [1])
    new_h = g.op("Sub", [g.op("Mul", [gh1, two]), one])  # [2gh-1]
    new_w = g.op("Sub", [g.op("Mul", [gw1, two]), one])
    sizes = g.op("Concat", [i64("lut_lh", [num_layers, heads]), new_h, new_w], axis=0)
    lut_r = g.op(
        "Resize", [token_init, "", "", sizes], mode="linear",
        coordinate_transformation_mode="pytorch_half_pixel",
    )
    lut_flat = _reshape(g, lut_r, [0, 0, -1])  # (L, H, newR)
    full_lut = g.op("Concat", [lut_flat, specials_name], axis=2)  # (L, H, newR+3)

    # relative index over the A = gh*gw patch tokens:
    # idx[(yq,xq),(yk,xk)] = (yq-yk+gh-1)*(2gw-1) + (xq-xk+gw-1)
    zero_s = g.init("i64_zero_s", np.asarray(0, np.int64))
    one_s = g.init("i64_one_s", np.asarray(1, np.int64))
    ys = g.op("Range", [zero_s, _squeeze(g, gh1, 0), one_s])  # (gh,)
    xs = g.op("Range", [zero_s, _squeeze(g, gw1, 0), one_s])  # (gw,)
    y_col = _reshape(g, ys, [-1, 1])
    x_row = _reshape(g, xs, [1, -1])
    zero_like_row = g.op("Mul", [x_row, zero_s])
    zero_like_col = g.op("Mul", [y_col, zero_s])
    y_flat = _reshape(g, g.op("Add", [y_col, zero_like_row]), [-1])  # (A,)
    x_flat = _reshape(g, g.op("Add", [zero_like_col, x_row]), [-1])
    rel_y = g.op("Sub", [_reshape(g, y_flat, [-1, 1]), _reshape(g, y_flat, [1, -1])])
    rel_x = g.op("Sub", [_reshape(g, x_flat, [-1, 1]), _reshape(g, x_flat, [1, -1])])
    gh_m1 = g.op("Sub", [gh1, one])
    gw_m1 = g.op("Sub", [gw1, one])
    idx_tok = g.op(
        "Add",
        [g.op("Mul", [g.op("Add", [rel_y, gh_m1]), new_w]), g.op("Add", [rel_x, gw_m1])],
    )  # (A, A) int64
    a1 = g.op("Mul", [gh1, gw1])  # [A]
    return full_lut, specials_name, idx_tok, a1


def _beit_dynamic_bias_block(g: GraphBuilder, full_lut: str, specials: str, idx_tok: str, a1: str, layer: int, heads: int) -> str:
    """Assemble block `layer`'s (1, H, N, N) bias at runtime: Gather the
    token-token body by the relative index, then concatenate the cls borders
    from the 3 special LUT rows (cls->token row, token->cls column, cls->cls
    corner — relative_positional_encoder.py:117-238 writes the same values
    through index sentinels)."""
    i64 = lambda hint, v: g.init(hint, np.asarray(v, np.int64))
    lut_i = _slice(g, full_lut, [layer], [layer + 1], [0])  # (1, H, R')
    body = g.op("Gather", [lut_i, idx_tok], axis=2)  # (1, H, A, A)
    sp_i = _slice(g, specials, [layer], [layer + 1], [0])  # (1, H, 3)
    s_c2t = _reshape(g, _slice(g, sp_i, [0], [1], [2]), [1, heads, 1, 1])
    s_t2c = _reshape(g, _slice(g, sp_i, [1], [2], [2]), [1, heads, 1, 1])
    s_c2c = _reshape(g, _slice(g, sp_i, [2], [3], [2]), [1, heads, 1, 1])
    row_shape = g.op("Concat", [i64(f"b{layer}_row_lh", [1, heads, 1]), a1], axis=0)
    row0 = g.op("Concat", [s_c2c, g.op("Expand", [s_c2t, row_shape])], axis=3)  # (1, H, 1, N)
    col_shape = g.op("Concat", [i64(f"b{layer}_col_lh", [1, heads]), a1, i64(f"b{layer}_col_one", [1])], axis=0)
    col0 = g.op("Expand", [s_t2c, col_shape])  # (1, H, A, 1)
    rows = g.op("Concat", [col0, body], axis=3)  # (1, H, A, N)
    return g.op("Concat", [row0, rows], axis=2)  # (1, H, N, N)


def emit_beit_onnx(model, image_hw: tuple[int, int] | None = None, dynamic: bool = False) -> bytes:
    """Build the ONNX ModelProto bytes for a MiDaS-v3.1 BEiT `DPTModel`.

    Fixed-shape mode (default): the per-layer relative-position bias
    (models/beit.py:compute_bias_stack) is evaluated for this grid at export
    time and baked as one (1, H, N, N) initializer per block — exactly the
    tensor the enable_cache path caches, unpadded. Artifact size grows as
    L*H*N^2 floats (models/beit.py:81).

    dynamic=True: the analog of the reference's dynamic-axes BEiT export
    (reference experiments/export_onnx.py:117-130 covers BEiT; only SwinV2
    is fixed-size there, experiments/README.md:87). The input is declared
    ("batch", 3, "height", "width") and every grid-dependent computation
    moves in-graph — the LUT bilinear rescale becomes a runtime Resize, the
    relative-index matrix is built from Range ops, and each block's bias is
    a runtime Gather + cls-border Concat (see _beit_dynamic_bias_setup).
    image_hw is ignored; feeds must satisfy the BEiT tiling constraint
    (H, W multiples of 2*patch = 32 px — DPTModel.verify_input). The
    artifact stays small (the LUT is the only positional initializer) but
    the runtime pays the per-block gather the fixed-shape export bakes."""
    from ..models.beit import BEiTConfig, compute_bias_stack

    params = model.params
    cfg: BEiTConfig = model.spec["encoder_config"]
    p_px = model.patch_size_px
    c = cfg.features
    heads = cfg.num_heads
    d = c // heads

    g = GraphBuilder("beit_dpt_dynamic" if dynamic else "beit_dpt")
    grid_shape = None
    if dynamic:
        x = g.add_input("image", ("batch", 3, "height", "width"))
        gh = gw = 0  # static bookkeeping unused on the dynamic path
    else:
        ih, iw = int(image_hw[0]), int(image_hw[1])
        assert ih % p_px == 0 and iw % p_px == 0, "image_hw must be patch-aligned (compute_scaled_hw)"
        gh, gw = ih // p_px, iw // p_px
        bias_stack = np.asarray(
            compute_bias_stack(
                np.asarray(params["encoder"]["blocks"]["relpos_lut"], np.float32),
                cfg.base_grid_hw, (gh, gw),
            ),
            np.float32,
        )  # (L, H, N, N)
        x = g.add_input("image", (1, 3, ih, iw))

    x = _conv(g, x, _np(params["patch_embed"]["kernel"]), _np(params["patch_embed"]["bias"]), "patch_embed", stride=p_px)
    if dynamic:
        grid_shape = g.op("Shape", [x])  # int64 [B, C, gh, gw]
        x = _reshape(g, x, [0, c, -1])
    else:
        x = _reshape(g, x, [1, c, gh * gw])
    x = g.op("Transpose", [x], perm=[0, 2, 1])  # (B, N-1, C)

    cls_init = g.init("cls_token", _np(params["encoder"]["cls_token"]).reshape(1, 1, c))
    if dynamic:
        b1 = _slice(g, grid_shape, [0], [1], [0])
        cls_shape = g.op("Concat", [b1, g.init("cls_tail", np.asarray([1, c], np.int64))], axis=0)
        cls_init = g.op("Expand", [cls_init, cls_shape])
    x = g.op("Concat", [cls_init, x], axis=1)

    if dynamic:
        full_lut, specials, idx_tok, a1 = _beit_dynamic_bias_setup(
            g, np.asarray(params["encoder"]["blocks"]["relpos_lut"], np.float32),
            cfg.base_grid_hw, heads, grid_shape,
        )

    stacked = params["encoder"]["blocks"]
    taps = tuple((cfg.num_blocks // 4) * (i + 1) - 1 for i in range(4))
    stage_tokens = []
    for i in range(cfg.num_blocks):
        bp = {k: np.asarray(v)[i] for k, v in stacked.items() if k != "relpos_lut"}
        h = _layer_norm(g, x, bp["norm1_scale"], bp["norm1_bias"], f"b{i}_ln1")
        # head-major fused qkv bias with zero k slots (models/beit.py:141-154)
        qkv_bias = np.concatenate(
            [
                _np(bp["q_bias"]).reshape(heads, 1, d),
                np.zeros((heads, 1, d), np.float32),
                _np(bp["v_bias"]).reshape(heads, 1, d),
            ],
            axis=1,
        ).reshape(3 * c)
        bp_attn = dict(bp, qkv_bias=qkv_bias)
        if dynamic:
            bias_i = _beit_dynamic_bias_block(g, full_lut, specials, idx_tok, a1, i, heads)
        else:
            bias_i = bias_stack[i : i + 1]
        h = _attention(g, h, bp_attn, heads, c, bias=bias_i)
        h = g.op("Mul", [h, g.init(f"b{i}_ls1", _np(bp["ls1"]))])
        x = g.op("Add", [x, h])
        h = _layer_norm(g, x, bp["norm2_scale"], bp["norm2_bias"], f"b{i}_ln2")
        h = _mlp(g, h, bp, is_giant=False)
        h = g.op("Mul", [h, g.init(f"b{i}_ls2", _np(bp["ls2"]))])
        x = g.op("Add", [x, h])
        if i in taps:
            stage_tokens.append(x)  # no output norm (models/beit.py:183-186)

    x, out_hw = _emit_neck(g, model, stage_tokens, c, gh, gw, readout="project", grid_shape=grid_shape)
    if dynamic:
        g.add_output(x, ("batch", "out_height", "out_width"))
        doc = (
            f"MiDaS v3.1 BEiT DPT, dynamic input (batch,3,height,width), height/width "
            f"multiples of {2 * p_px}, normalized RGB; depth (batch,out_height,out_width)"
        )
    else:
        g.add_output(x, (1, out_hw[0], out_hw[1]))
        doc = f"MiDaS v3.1 BEiT DPT, fixed input (1,3,{ih},{iw}), normalized RGB; depth (1,{out_hw[0]},{out_hw[1]})"
    return g.serialize(opset=17, doc=doc)


def _swin_window_attention(g: GraphBuilder, x: str, bp: dict, heads: int, grid_hw, window_hw, shift_hw, shifting: bool, cpb: np.ndarray, mask, hint: str) -> str:
    """One windowed scaled-cosine attention op on a (1, gh, gw, C) grid tensor
    (models/swinv2.py:window_attention; reference
    v31_swinv2/components/windowed_attention.py:65-123). cpb is the block's
    (H, A, A) continuous position bias evaluated at export time; mask the
    (nW, A, A) 0/-100 shift mask (or None)."""
    gh, gw = grid_hw
    win_h, win_w = window_hw
    shift_h, shift_w = shift_hw
    c = int(np.asarray(bp["qkv_kernel"]).shape[0])
    d = c // heads
    nwy, nwx = gh // win_h, gw // win_w
    nw, area = nwy * nwx, win_h * win_w

    if shifting:
        x = _roll_axis(g, x, -shift_h, gh, 1)
        x = _roll_axis(g, x, -shift_w, gw, 2)

    # partition into (nW, A, C); batch is fixed at 1 so it folds into nW
    x = _reshape(g, x, [1, nwy, win_h, nwx, win_w, c])
    x = g.op("Transpose", [x], perm=[0, 1, 3, 2, 4, 5])
    x = _reshape(g, x, [nw, area, c])

    # fused qkv, (3, H, d)-major columns; q/v bias added post-split
    # (models/swinv2.py:201-204)
    qkv = _linear(g, x, _np(bp["qkv_kernel"]), None, hint + "_qkv")
    qkv = _reshape(g, qkv, [nw, area, 3, heads, d])
    qkv = g.op("Transpose", [qkv], perm=[2, 0, 3, 1, 4])  # (3, nW, H, A, d)
    parts = [_reshape(g, _slice(g, qkv, [i], [i + 1], [0]), [nw, heads, area, d]) for i in range(3)]
    q, k, v = parts
    q = g.op("Add", [q, g.init(hint + "_qb", _np(bp["q_bias"]).reshape(heads, 1, d))])
    v = g.op("Add", [v, g.init(hint + "_vb", _np(bp["v_bias"]).reshape(heads, 1, d))])

    # cosine attention: normalize(q) @ normalize(k)^T * logit_scale
    # (logit_scale pre-clamped+exp'd at load, checkpoints/swinv2.py:67-69)
    qn = _l2_normalize(g, q, hint + "_qn")
    kn = _l2_normalize(g, k, hint + "_kn")
    kt = g.op("Transpose", [kn], perm=[0, 1, 3, 2])
    logits = g.op("MatMul", [qn, kt])  # (nW, H, A, A)
    logits = g.op("Mul", [logits, g.init(hint + "_ls", _np(bp["logit_scale"]).reshape(heads, 1, 1))])
    logits = g.op("Add", [logits, g.init(hint + "_cpb", np.asarray(cpb, np.float32))])
    if mask is not None:
        logits = g.op("Add", [logits, g.init(hint + "_mask", np.asarray(mask, np.float32)[:, None])])
    weights = g.op("Softmax", [logits], axis=-1)
    out = g.op("MatMul", [weights, v])  # (nW, H, A, d)
    out = g.op("Transpose", [out], perm=[0, 2, 1, 3])
    out = _reshape(g, out, [nw, area, c])
    out = _linear(g, out, _np(bp["proj_kernel"]), _np(bp["proj_bias"]), hint + "_proj")

    # reverse partition (+ reverse shift)
    out = _reshape(g, out, [1, nwy, nwx, win_h, win_w, c])
    out = g.op("Transpose", [out], perm=[0, 1, 3, 2, 4, 5])
    out = _reshape(g, out, [1, gh, gw, c])
    if shifting:
        out = _roll_axis(g, out, shift_h, gh, 1)
        out = _roll_axis(g, out, shift_w, gw, 2)
    return out


def emit_swinv2_onnx(model, image_hw: tuple[int, int]) -> bytes:
    """Build the ONNX ModelProto bytes for a MiDaS-v3.1 SwinV2 `DPTModel`.

    Everything the JAX forward derives per grid at trace time — window plan,
    cyclic-shift masks, and each block's CPB relative-position bias
    (models/swinv2.py:window_plan/shift_mask_np/cpb_bias) — is evaluated for
    this grid at export time and baked as initializers, exactly the tensors
    the reference keeps in its GridCaches
    (v31_swinv2/components/relative_positional_encoder.py:49-51)."""
    from ..models.swinv2 import SWIN_LN_EPS, SwinV2Config, cpb_bias, shift_mask_np, window_plan

    params = model.params
    cfg: SwinV2Config = model.spec["encoder_config"]
    ih, iw = int(image_hw[0]), int(image_hw[1])
    p_px = model.patch_size_px
    tiling = 8 * p_px  # 3 internal 2x downscales (swinv2_family.py:81)
    assert ih % tiling == 0 and iw % tiling == 0, "image_hw must be tiling-aligned (compute_scaled_hw)"
    gh, gw = ih // p_px, iw // p_px

    g = GraphBuilder("swinv2_dpt")
    x = g.add_input("image", (1, 3, ih, iw))

    # patch embed: 4px conv + post-projection LayerNorm (swinv2_family.py:30-33)
    pe = params["patch_embed"]
    x = _conv(g, x, _np(pe["kernel"]), _np(pe["bias"]), "patch_embed", stride=p_px)
    x = g.op("Transpose", [x], perm=[0, 2, 3, 1])  # grid layout (1, gh, gw, C)
    x = _layer_norm(g, x, pe["norm_scale"], pe["norm_bias"], "pe_norm", eps=SWIN_LN_EPS)

    enc = params["encoder"]
    maps = []
    map_shapes = []
    for s in range(4):
        if s > 0:
            # patch merge: 2x2 TL/BL/TR/BR decimate-concat -> Linear (no bias)
            # -> LayerNorm (models/swinv2.py:patch_merge)
            mp = enc["merges"][s - 1]
            corners = [
                _slice_step(g, x, [hs, ws], [_I32MAX, _I32MAX], [1, 2], [2, 2])
                for hs, ws in ((0, 0), (1, 0), (0, 1), (1, 1))
            ]
            x = g.op("Concat", corners, axis=3)
            x = _linear(g, x, _np(mp["reduction_kernel"]), None, f"s{s}_merge")
            x = _layer_norm(g, x, mp["norm_scale"], mp["norm_bias"], f"s{s}_merge_norm", eps=SWIN_LN_EPS)
            gh, gw = gh // 2, gw // 2

        heads = cfg.heads_per_stage[s]
        pws = cfg.pretrained_window_sizes[s]
        window_hw, shift_hw = window_plan((gh, gw), cfg.window_size_hw)
        can_shift = shift_hw != (0, 0)
        mask = shift_mask_np((gh, gw), window_hw, shift_hw) if can_shift else None
        stage_pairs = enc["stages"][s]

        for i in range(cfg.layers_per_stage[s] // 2):
            for key, is_shift in (("b0", False), ("b1", True)):
                bp = {k: np.asarray(v)[i] for k, v in stage_pairs[key].items()}
                cpb = np.asarray(cpb_bias(bp, window_hw, pws), np.float32)
                hint = f"s{s}p{i}{key}"
                shifting = is_shift and can_shift
                h = _swin_window_attention(
                    g, x, bp, heads, (gh, gw), window_hw, shift_hw, shifting,
                    cpb, mask if shifting else None, hint,
                )
                # post-norm block (models/swinv2.py:block_forward)
                h = _layer_norm(g, h, bp["norm1_scale"], bp["norm1_bias"], hint + "_ln1", eps=SWIN_LN_EPS)
                x = g.op("Add", [x, h])
                h = _mlp(g, x, bp, is_giant=False)
                h = _layer_norm(g, h, bp["norm2_scale"], bp["norm2_bias"], hint + "_ln2", eps=SWIN_LN_EPS)
                x = g.op("Add", [x, h])

        # reassembly: unflatten + 3x3 fuse conv only, no readout/resample
        # (swinv2_family.py:_neck; reference v31_swinv2/reassembly_model.py:49-52)
        fk = _np(params["reassemble"][s]["fuse_kernel"])
        xm = g.op("Transpose", [x], perm=[0, 3, 1, 2])  # NCHW
        maps.append(_conv(g, xm, fk, None, f"s{s}_fuse", pad=1))
        map_shapes.append((fk.shape[-1], gh, gw))

    x, out_hw = _emit_fusion_head(g, model, maps, map_shapes)
    g.add_output(x, (1, out_hw[0], out_hw[1]))
    return g.serialize(
        opset=17,
        doc=f"MiDaS v3.1 SwinV2 DPT, fixed input (1,3,{ih},{iw}), normalized RGB; depth (1,{out_hw[0]},{out_hw[1]})",
    )
