"""Experimental XL-N (1428²/1904²-class) fused-qkv one-pass variants.

Why: at N=18497 (1904²) the serving q-blocked fused-qkv kernel costs
16.16 ms per 16-head D=64 op against a ~7.2 ms MXU MAC floor (round-4c
chain-slope probes, docs/performance.md). The residual is VPU softmax passes
over the (block_q, N_pad) f32 logit tiles plus whatever QK→softmax→PV
serialization Mosaic's scheduler fails to hide. Round-4 already measured
and rejected: k-panel staging (panels≥2 lose 7-20%), an int8-QK^T kernel,
packed-bf16 exp2, and hpp=4 via the staged wrapper (~2%, not reproducible).

What is left — and what this experiment isolates:

1. **Cross-chain software pipelining** (`pipelined=True`): the production
   kernel interleaves per-head chains as QK(0)→softmax(0)→PV(0)→QK(1)→…;
   this variant issues EVERY chain's QK dot first, then runs the
   softmax+PV tails. All of chain 1's MXU work becomes schedulable under
   chain 0's VPU softmax without any dependence analysis across the
   serialized chain bodies. Live-VMEM cost: identical (the production
   kernel's hpp logit tiles are all live across its loop too, since Mosaic
   allocates per-value).

2. **More independent chains per program** (`qp>1`): process qp q-sub-blocks
   per program, giving hpp*qp independent chains at the same per-chain tile
   size — deeper MXU/VPU interleave than hpp alone can reach at D=64 (the
   lane rule pins hpp=2; qp=2 gives 4 chains at ~76 MB live f32 tiles).

3. **No-softmax ablation** (`ablate_softmax=True`): replaces max/exp/sum with
   a single cheap scale+cast, keeping the exact same dots, slab residency
   and output writes. Its time is the kernel-structure floor on this chip;
   (variant − ablation) is the softmax's true marginal cost. If no variant
   beats the anchor and the ablation sits near the anchor's time, the kernel
   is DMA/MXU-bound and the VERDICT "VPU-bound proof" is refuted; if the
   ablation is far below, the gap IS the VPU bill. NOT numerically valid —
   timing only.

Numerics of variants 1-2 are identical to the production kernel: exp2
domain, f32 logits, fused-l ones column at D%128!=0, additive -1e30 pad
mask before the max. Parity-pinned in tests/test_flash_attention_xl.py.

Status: EXPERIMENT. The on-chip sweep is `tools/flash_tune.py --xl`; a
winner gets folded into ops/pallas/flash_attention.py, losers stay here as
measured negative results per repo convention.
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


def _xl_qkv_kernel(
    qkv_ref, o_ref, *, kv_len, scale, d, hpp, block_q, qp,
    pipelined, ablate_softmax,
):
    """q-blocked fused-qkv one-pass over hpp heads × qp q-sub-blocks.

    Chain layout matches _onepass_qkv_kernel (flash_attention.py:125) with
    grid axis 2 striding by qp sub-blocks; qp=1, pipelined=False is the
    production kernel's exact op sequence (the sweep's anchor)."""
    slab = qkv_ref[0]
    kv_pad = slab.shape[0]
    qscale = scale * LOG2E  # exp2 domain (unbiased only)
    mask_row = None
    if kv_len < kv_pad:
        col = lax.broadcasted_iota(jnp.int32, (1, kv_pad), 1)
        mask_row = jnp.where(col < kv_len, 0.0, NEG_INF).astype(jnp.float32)

    def qk(j, qi):
        base = j * 3 * d
        # ref slice, not value slice (Mosaic dynamic_slice-on-values gap —
        # see the round-4d note at _onepass_qkv_kernel)
        row0 = (pl.program_id(2) * qp + qi) * block_q
        qsrc = qkv_ref[0, pl.ds(row0, block_q), :]
        q = (qsrc[:, base : base + d].astype(jnp.float32) * qscale).astype(slab.dtype)
        k = slab[:, base + d : base + 2 * d]
        s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if mask_row is not None:
            s = s + mask_row
        return s

    def tail(j, qi, s):
        base = j * 3 * d
        v = slab[:, base + 2 * d : base + 3 * d]
        if ablate_softmax:
            # timing floor only: same dots + one elementwise pass, no max/sum
            p = (s * 1e-6).astype(v.dtype)
            o = lax.dot_general(p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        else:
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            if d % 128 != 0:
                ext = _round_up(d + 1, 128)  # fused-l ones column rides in PV
                v_ext = jnp.concatenate([v, jnp.ones((v.shape[0], ext - d), v.dtype)], axis=1)
                of = lax.dot_general(
                    p.astype(v.dtype), v_ext, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o = of[:, :d] / jnp.maximum(of[:, d : d + 1], 1e-30)
            else:
                l = jnp.sum(p, axis=1, keepdims=True)
                o = lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) / jnp.maximum(l, 1e-30)
        o_ref[0, pl.ds(qi * block_q, block_q), j * d : (j + 1) * d] = o.astype(o_ref.dtype)

    chains = [(j, qi) for qi in range(qp) for j in range(hpp)]
    if pipelined:
        ss = {c: qk(*c) for c in chains}
        for c in chains:
            tail(*c, ss[c])
    else:
        for c in chains:
            tail(*c, qk(*c))


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "block_q", "hpp", "qp", "pipelined",
                     "ablate_softmax", "interpret"),
)
def flash_attention_fused_qkv_xl(
    qkv, num_heads, scale=None, block_q=None, hpp=None, qp=1,
    pipelined=True, ablate_softmax=False, interpret=False,
):
    """XL-variant fused-qkv one-pass attention (UNBIASED only — the DA
    serving path). qkv: (B, N, 3C) head-major [head][q|k|v][dim]; returns
    (B, N, C). Always q-blocked (it targets the large-N regime; small N
    callers should use the production kernel)."""
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

    if block_q is None:
        # production picker (flash_attention.py:flash_attention_fused_qkv),
        # with the chain count hpp*qp in place of hpp so qp>1 doesn't blow
        # the live-tile budget
        cap = max(
            ONE_PASS_MIN_BLOCK_Q,
            2 * ONE_PASS_LOGIT_BYTES // (hpp * qp * n_pad * 4) // 128 * 128,
        )
        cap = min(cap, n_pad)
        block_q, best_pad = cap, _round_up(n_pad, cap)
        for cand in range(cap, 511, -128):
            padded = _round_up(n_pad, cand)
            if padded < best_pad:
                block_q, best_pad = cand, padded
    block_q = min(block_q, n_pad)
    step = block_q * qp
    n_pad_q = _round_up(n_pad, step)
    logit_bytes = hpp * qp * block_q * n_pad_q * 4
    assert logit_bytes + 16 * 1024 * 1024 <= _FUSED_VMEM_BUDGET, (
        f"xl fused-qkv needs ~{(logit_bytes >> 20) + 16} MB VMEM at "
        f"n_pad={n_pad}, hpp={hpp}, qp={qp}, block_q={block_q}"
    )

    qkvp = jnp.pad(qkv, ((0, 0), (0, n_pad_q - n), (0, 0)))
    grid = (b, num_heads // hpp, n_pad_q // step)
    qkv_spec = pl.BlockSpec((1, n_pad_q, 3 * d * hpp), lambda bi, gi, qi: (bi, 0, gi))
    out_spec = pl.BlockSpec((1, step, d * hpp), lambda bi, gi, qi: (bi, qi, gi))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=max(100 * 1024 * 1024, logit_bytes + 16 * 1024 * 1024)
        )
    kernel = functools.partial(
        _xl_qkv_kernel,
        kv_len=n, scale=scale, d=d, hpp=hpp, block_q=block_q, qp=qp,
        pipelined=pipelined, ablate_softmax=ablate_softmax,
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
