"""Pallas TPU fused depth-head tail: conv3x3 (ci -> co) + bias + ReLU +
conv1x1 (co -> 1) + bias + ReLU/Sigmoid in ONE kernel.

STATUS: correct (interpret-mode tested) but a measured NEGATIVE result — NOT
wired into the model path, kept under experiments/. On v5e at the ViT-L head
shape (504^2, 128->32, bf16) it runs 999 us vs 332 us for XLA's
conv3x3_shiftsum + relu + 1x1 composite: the manual halo DMA serializes with
compute (no double buffering across the grid), and the per-tap realignment
slices at sublane offsets 1/2 lower to costly vector rotations, which
together more than cancel the HBM-traffic savings (~310 MB -> ~35 MB) the
kernel was built for. Lesson recorded: XLA already overlaps the tap-tensor
materialization with the MXU matmul well at these shapes.

Design (kept for reference): the reference head ends Conv3x3->32, ReLU,
Conv1x1->1, ReLU/Sigmoid at full output resolution
(v2_depthanything/head_model.py:61-106). Each program DMAs a (rows+2) halo
strip of the padded input from HBM, runs the single (ci -> 9*co) MXU matmul,
realigns the taps with in-VMEM shifted adds (f32), applies ReLU, contracts
the co axis with the 1x1 kernel on the VPU, applies the final activation and
writes only the (rows, W) result. Row-strip height adapts to a VMEM budget so
any resolution works.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# VMEM budget for the per-program strip state (x strip + f32 tap slab).
_VMEM_BUDGET_BYTES = 40 * 1024 * 1024


def _pick_rows(w_pad: int, ci: int, co: int, itemsize: int) -> int:
    """Largest strip height whose x-strip + f32 (9*co) tap slab fit the
    budget, rounded to the TPU sublane tile (multiple of 16, min 16)."""
    per_row = w_pad * (ci * itemsize + 9 * co * 4 + co * 4)
    rows = _VMEM_BUDGET_BYTES // per_row - 2
    return int(min(max(16, rows - rows % 16), 64))


def _kernel(xp_ref, w9_ref, cb_ref, pw_ref, pb_ref, out_ref, xb, sem, *, rows, w_out, co, is_metric):
    i = pl.program_id(0)
    # halo strip: rows [i*rows, i*rows + rows + 2) of the padded input
    dma = pltpu.make_async_copy(xp_ref.at[pl.ds(i * rows, rows + 2)], xb, sem)
    dma.start()
    dma.wait()

    # one MXU matmul folds all 9 taps into the output dim: (r+2, W+2, 9*co)
    y9 = jax.lax.dot_general(
        xb[:], w9_ref[:], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # realign taps with shifted slices, accumulate in f32 (in VMEM throughout)
    acc = None
    for tap in range(9):
        dy, dx = divmod(tap, 3)
        part = y9[dy : dy + rows, dx : dx + w_out, tap * co : (tap + 1) * co]
        acc = part if acc is None else acc + part
    acc = jnp.maximum(acc + cb_ref[0], 0.0)
    # 1x1 projection to a single channel on the VPU: (rows, W)
    o = jnp.sum(acc * pw_ref[0], axis=-1) + pb_ref[0, 0]
    o = jax.nn.sigmoid(o) if is_metric else jnp.maximum(o, 0.0)
    out_ref[:] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("is_metric", "interpret"))
def fused_head_tail(x, conv_kernel, conv_bias, proj_kernel, proj_bias, is_metric=False, interpret=False):
    """x: (1, H, W, ci) -> (1, H, W). conv_kernel: (3, 3, ci, co),
    proj_kernel: (co, 1). Matches conv3x3(pad=1) + bias + relu + 1x1 + bias +
    relu/sigmoid up to f32 tap-summation order."""
    _, h, w, ci = x.shape
    co = conv_kernel.shape[-1]
    dt = x.dtype
    w9 = conv_kernel.astype(dt).transpose(2, 0, 1, 3).reshape(ci, 9 * co)

    # sublane (W) dim of the strip must be a multiple of 8 for Mosaic
    w_pad = -(-(w + 2) // 8) * 8
    rows = _pick_rows(w_pad, ci, co, x.dtype.itemsize)
    n_strips = -(-h // rows)
    h_pad = n_strips * rows
    # +2 halo rows/cols (conv padding) plus fill to whole strips / lane tiles
    xp = jnp.pad(x[0], ((1, 1 + (h_pad - h)), (1, w_pad - w - 1), (0, 0)))

    kern = functools.partial(
        _kernel, rows=rows, w_out=w, co=co, is_metric=bool(is_metric)
    )
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 1024 * 1024
        )
    out = pl.pallas_call(
        kern,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; strips DMA'd manually
            pl.BlockSpec((ci, 9 * co), lambda i: (0, 0)),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((h_pad, w), dt),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, w_pad, ci), dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        **kwargs,
    )(
        xp,
        w9,
        conv_bias.astype(jnp.float32)[None, :],
        proj_kernel.astype(jnp.float32)[:, 0][None, :],
        proj_bias.astype(jnp.float32)[None, :],
    )
    return out[None, :h, :]


def head_tail_available(x) -> bool:
    """Kernel eligibility: single image, TPU-friendly dtype, real area."""
    return (
        _HAS_PLTPU
        and x.ndim == 4
        and x.shape[0] == 1
        and x.dtype == jnp.bfloat16
        and x.shape[1] * x.shape[2] >= 128 * 128
    )
