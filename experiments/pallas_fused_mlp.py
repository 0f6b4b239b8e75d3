"""Pallas TPU fused transformer-MLP block (SURVEY.md §7 kernel ④):
LayerNorm -> fc1 -> GELU -> fc2 -> LayerScale + residual in one kernel.

STATUS: correct (interpret-mode tested, tests/test_fused_mlp.py) but NOT
wired into the model path, so it lives under experiments/ not the package —
measured on v5e at ViT-L shapes (N=1298, F=1024, H=4096, bf16) it runs
1.78 ms vs 1.30 ms for the XLA-fused unfused ops: XLA already folds the
LayerNorm into the fc1 prologue and pipelines the hidden activations, and
its matmul tiling beats this kernel's slab schedule. Kept as a measured
reference point; revisit if XLA's fusion regresses or for multi-batch rows.

Eliminates the HBM round-trips of the LN output and the 4x-wide hidden
activations that the unfused path writes between kernels. Grid is
(row-tiles, hidden-tiles) with the hidden axis innermost: each step computes
a hidden slab (rows x BH) = gelu(ln(x) @ W1[:, slab]) and accumulates its
contribution slab @ W2[slab, :] into a VMEM scratch accumulator; the LN'd
rows are computed once per row-tile (first hidden step) and cached in VMEM.
Weights stream through VMEM one slab pair at a time, so arbitrary hidden
widths fit. GELU is the exact erf form (torch-parity)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def fused_mlp_available() -> bool:
    try:
        return _HAS_PLTPU and jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _gelu_erf(x):
    """Exact-form GELU with an in-kernel erf: Mosaic has no erf/erfc lowering,
    so use the Abramowitz-Stegun 7.1.26 rational approximation (~1.5e-7 max
    error in f32 — far below bf16 resolution)."""
    z = x * 0.7071067811865476
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * x * (1.0 + erf)


def _kernel(
    x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, o_ref, xn_ref, acc_ref, *, eps
):
    j = pl.program_id(1)
    num_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _prep():
        xf = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + eps)
        xn_ref[:] = (y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)).astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = lax.dot_general(
        xn_ref[:], w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[0].astype(jnp.float32)
    g = _gelu_erf(h).astype(xn_ref.dtype)
    acc_ref[:] = acc_ref[:] + lax.dot_general(
        g, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == num_j - 1)
    def _finish():
        out = acc_ref[:] + b2_ref[0].astype(jnp.float32)
        out = out * ls_ref[0].astype(jnp.float32)
        o_ref[0] = (x_ref[0].astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "block_hidden", "interpret"))
def fused_ln_mlp_residual(
    x, ln_scale, ln_bias, w1, b1, w2, b2, layerscale, eps=1e-6, block_rows=256, block_hidden=512, interpret=False
):
    """out = x + layerscale * fc2(gelu(fc1(layernorm(x)))).

    x: (B, N, F). w1: (F, H). w2: (H, F)."""
    if not _HAS_PLTPU:
        raise RuntimeError(
            "fused_ln_mlp_residual needs jax.experimental.pallas.tpu "
            "(pltpu VMEM scratch) — unavailable in this jax build, even for interpret mode"
        )
    bsz, n, f = x.shape
    hidden = w1.shape[1]
    rows = bsz * n
    xr = x.reshape(rows, f)
    rows_pad = ((rows + block_rows - 1) // block_rows) * block_rows
    hid_pad = ((hidden + block_hidden - 1) // block_hidden) * block_hidden
    xr = jnp.pad(xr, ((0, rows_pad - rows), (0, 0)))
    w1p = jnp.pad(w1, ((0, 0), (0, hid_pad - hidden)))
    b1p = jnp.pad(b1, ((0, hid_pad - hidden),))
    w2p = jnp.pad(w2, ((0, hid_pad - hidden), (0, 0)))

    grid = (rows_pad // block_rows, hid_pad // block_hidden)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_rows, f), lambda i, j: (0, i, 0)),
            pl.BlockSpec((1, f), lambda i, j: (0, 0)),
            pl.BlockSpec((1, f), lambda i, j: (0, 0)),
            pl.BlockSpec((f, block_hidden), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_hidden), lambda i, j: (0, j)),
            pl.BlockSpec((block_hidden, f), lambda i, j: (j, 0)),
            pl.BlockSpec((1, f), lambda i, j: (0, 0)),
            pl.BlockSpec((1, f), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, f), lambda i, j: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((1, rows_pad, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_rows, f), x.dtype),  # LN'd rows
            pltpu.VMEM((block_rows, f), jnp.float32),  # fc2 accumulator
        ],
        interpret=interpret,
    )(
        xr[None],
        ln_scale[None],
        ln_bias[None],
        w1p,
        b1p[None],
        w2p,
        b2[None],
        layerscale[None],
    )
    return out[0, :rows].reshape(bsz, n, f)
