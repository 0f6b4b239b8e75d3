"""Experimental staged (k-panel) fused-qkv one-pass flash attention.

Why: at 1428²/1904² (N=10405/18497) the serving q-blocked fused-qkv kernel
(muggled_dpt_tpu/ops/pallas/flash_attention.py:_onepass_qkv_kernel) measures
5.3/16.1 ms per 16-head op vs a ~2.3 ms MXU MAC floor — the residual is the
softmax's full-logit-tile VPU passes running serially against the two dots.
The kernel already unrolls `hpp` per-program head chains so Mosaic can
overlap one head's softmax with another head's matmul, but at D=64 the lane
rule pins hpp=2 and the measured overlap is partial.

Two hypotheses, both measured by `tools/flash_tune.py --staged`:

1. **hpp override**: more unrolled head chains per program (hpp=4/8 instead
   of the minimal legal 2) gives the scheduler more independent MXU work to
   slot under VPU passes, at the cost of hpp× the live logit-tile VMEM.
2. **k-panel staging**: split each head's key range into P static panels and
   run two phases — phase 1 computes every panel's (BQ, PK) logit dot and
   folds its row-max into the running max (panel c's max read overlaps panel
   c+1's dot); phase 2 does exp2 + PV per panel (panel c's exp overlaps
   panel c-1's PV dot). Same total op count and VMEM as the whole-row
   kernel, but the MXU/VPU interleave happens at panel grain *within* one
   head instead of only across heads. A bonus: the pad-column mask touches
   only the final panel's tile instead of a full-width broadcast add.

Numerics are identical to the production kernel: exp2 domain with the
softmax scale and log2(e) pre-folded into q, f32 logits/softmax, fused-l
ones column when D % 128 != 0, additive -1e30 pad mask applied before the
max (so the all-logits-negative case stays exact — see
tests/test_flash_attention.py::test_flash_all_logits_negative).

Status: EXPERIMENT. Wire the winning configuration into ops/ only if the
on-chip sweep shows a real win at the serving shapes; per repo convention a
losing variant stays here as a measured negative result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from muggled_dpt_tpu.ops.pallas._common import (
    _HAS_PLTPU,
    NEG_INF,
    pltpu,
    round_up as _round_up,
)
from muggled_dpt_tpu.ops.pallas.flash_attention import (
    LOG2E,
    ONE_PASS_LOGIT_BYTES,
    ONE_PASS_MIN_BLOCK_Q,
    _FUSED_VMEM_BUDGET,
    _heads_per_program,
)


def _panel_bounds(n_pad: int, panels: int) -> tuple[int, ...]:
    """Static panel boundaries over the padded key axis: `panels` slices of
    128-multiple width (the last takes the remainder, which is a 128-multiple
    because n_pad is)."""
    if panels <= 1:
        return (0, n_pad)
    pk = _round_up(-(-n_pad // panels), 128)
    bounds = list(range(0, n_pad, pk)) + [n_pad]
    # collapse a degenerate final step (n_pad a multiple of pk)
    if len(bounds) >= 2 and bounds[-1] == bounds[-2]:
        bounds.pop()
    return tuple(bounds)


def _staged_qkv_kernel(qkv_ref, o_ref, *, kv_len, scale, d, hpp, bounds, block_q=None):
    """One-pass attention over `hpp` heads' fused (N_pad, hpp*3D) slab with
    the key axis split into static panels (see module docstring). block_q,
    slab layout, and output layout match _onepass_qkv_kernel exactly."""
    slab = qkv_ref[0]
    qscale = scale * LOG2E  # exp2 domain (unbiased only)
    qsrc = slab
    if block_q is not None:
        # ref slice (Mosaic has no dynamic_slice-on-values lowering)
        qsrc = qkv_ref[0, pl.ds(pl.program_id(2) * block_q, block_q), :]
    num_panels = len(bounds) - 1
    for j in range(hpp):
        base = j * 3 * d
        q = (qsrc[:, base : base + d].astype(jnp.float32) * qscale).astype(slab.dtype)
        # ---- phase 1: panel dots (MXU) + running row-max (VPU) ----
        ss = []
        m = None
        for c in range(num_panels):
            lo, hi = bounds[c], bounds[c + 1]
            k_c = slab[lo:hi, base + d : base + 2 * d]
            s_c = lax.dot_general(
                q, k_c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if hi > kv_len:
                # pad columns live only in the final panel — mask before the
                # max so the all-logits-negative case stays exact, touching
                # 1/num_panels of the logit row instead of a full-width add
                col = lax.broadcasted_iota(jnp.int32, (1, hi - lo), 1) + lo
                s_c = s_c + jnp.where(col < kv_len, 0.0, NEG_INF).astype(jnp.float32)
            ss.append(s_c)
            mc = jnp.max(s_c, axis=1, keepdims=True)
            m = mc if m is None else jnp.maximum(m, mc)
        # ---- phase 2: per-panel exp2 (VPU) + PV accumulation (MXU) ----
        if d % 128 != 0:
            ext = _round_up(d + 1, 128)  # fused-l ones column rides in PV
            acc = None
            for c in range(num_panels):
                lo, hi = bounds[c], bounds[c + 1]
                p = jnp.exp2(ss[c] - m)
                v_c = slab[lo:hi, base + 2 * d : base + 3 * d]
                v_ext = jnp.concatenate(
                    [v_c, jnp.ones((hi - lo, ext - d), v_c.dtype)], axis=1
                )
                pv = lax.dot_general(
                    p.astype(v_c.dtype), v_ext, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = pv if acc is None else acc + pv
            o = acc[:, :d] / jnp.maximum(acc[:, d : d + 1], 1e-30)
        else:
            acc = None
            l = None
            for c in range(num_panels):
                lo, hi = bounds[c], bounds[c + 1]
                p = jnp.exp2(ss[c] - m)
                l_c = jnp.sum(p, axis=1, keepdims=True)
                v_c = slab[lo:hi, base + 2 * d : base + 3 * d]
                pv = lax.dot_general(
                    p.astype(v_c.dtype), v_c, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = pv if acc is None else acc + pv
                l = l_c if l is None else l + l_c
            o = acc / jnp.maximum(l, 1e-30)
        o_ref[0, :, j * d : (j + 1) * d] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_q", "hpp", "panels", "interpret")
)
def flash_attention_fused_qkv_staged(
    qkv, num_heads, scale=None, block_q=None, hpp=None, panels=2, interpret=False
):
    """Staged fused-qkv one-pass attention (UNBIASED only — the DA serving
    path). qkv: (B, N, 3C) head-major [head][q|k|v][dim]; returns (B, N, C).

    hpp: heads per program. None picks the minimal lane-legal grouping (the
    production kernel's policy); larger legal values trade live-tile VMEM for
    more schedulable MXU/VPU overlap. panels: static key-axis split (1 =
    whole-row, the production kernel's structure)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    scale = (d ** -0.5) if scale is None else scale
    n_pad = _round_up(n, 128)
    if hpp is None:
        hpp = _heads_per_program(num_heads, d)
        assert hpp is not None, "no lane-legal head grouping; use flash_attention"
    else:
        assert (
            num_heads % hpp == 0 and (3 * d * hpp) % 128 == 0 and (d * hpp) % 128 == 0
        ), f"hpp={hpp} violates the 128-lane rule at d={d}"

    # q-block exactly like the production kernel: whole-N while the hpp f32
    # logit tiles fit, else the largest 128-multiple under ~2x the per-tile
    # budget, preferring candidates that minimize dead padded q rows
    whole_n_bytes = hpp * n_pad * n_pad * 4 + 16 * 1024 * 1024
    q_blocked = block_q is not None or whole_n_bytes > _FUSED_VMEM_BUDGET
    n_pad_q = n_pad
    if q_blocked:
        if block_q is None:
            cap = max(
                ONE_PASS_MIN_BLOCK_Q,
                2 * ONE_PASS_LOGIT_BYTES // (hpp * n_pad * 4) // 128 * 128,
            )
            cap = min(cap, n_pad)
            block_q, best_pad = cap, _round_up(n_pad, cap)
            for cand in range(cap, 511, -128):
                padded = _round_up(n_pad, cand)
                if padded < best_pad:
                    block_q, best_pad = cand, padded
        block_q = min(block_q, n_pad)
        n_pad_q = _round_up(n_pad, block_q)
    logit_bytes = hpp * (block_q if q_blocked else n_pad_q) * n_pad_q * 4
    assert logit_bytes + 16 * 1024 * 1024 <= _FUSED_VMEM_BUDGET, (
        f"staged fused-qkv needs ~{(logit_bytes >> 20) + 16} MB VMEM at "
        f"n_pad={n_pad}, hpp={hpp}, block_q={block_q if q_blocked else n_pad_q}"
    )

    bounds = _panel_bounds(n_pad_q, panels)
    qkvp = jnp.pad(qkv, ((0, 0), (0, n_pad_q - n), (0, 0)))
    grid = (b, num_heads // hpp) + ((n_pad_q // block_q,) if q_blocked else ())
    qkv_spec = pl.BlockSpec((1, n_pad_q, 3 * d * hpp), lambda bi, gi, *_: (bi, 0, gi))
    if q_blocked:
        out_spec = pl.BlockSpec((1, block_q, d * hpp), lambda bi, gi, qi: (bi, qi, gi))
    else:
        out_spec = pl.BlockSpec((1, n_pad_q, d * hpp), lambda bi, gi, *_: (bi, 0, gi))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=max(100 * 1024 * 1024, logit_bytes + 16 * 1024 * 1024)
        )
    kernel = functools.partial(
        _staged_qkv_kernel,
        kv_len=n,
        scale=scale,
        d=d,
        hpp=hpp,
        bounds=bounds,
        block_q=block_q if q_blocked else None,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad_q, c), qkv.dtype),
        interpret=interpret,
        **kwargs,
    )(qkvp)
    return out[:, :n, :]
