"""Pallas TPU flash attention with optional additive bias.

Serves the attention flavors in this framework (SURVEY.md §7 kernel ①/③):
* DINOv2 full self-attention (Depth-Anything V1/V2) — no bias
* BEiT self-attention — additive relative-position bias per (head, q, k)
* (SwinV2 windows run their own batched kernel, window_attention.py, with
  the CPB bias + shift mask folded into one additive term.)

Two kernels:

ONE-PASS (the serving default at every DPT sequence length — see the round-4
note at ONE_PASS_MAX_KV): the whole key range is resident per program (K/V
cost only 2*N_pad*D*2B VMEM), so there is no online-softmax state at all —
plain max/exp/sum over the full logit row, no scratch, no correction passes;
the q-block shrinks with N to bound the f32 logit tile. Padded key columns
get a -inf iota mask (an analytic pad-count correction was measured ~2 us
faster but cancels catastrophically when every real logit is far below 0 —
e.g. strongly negative additive biases — so the robust mask stays; the
failure is pinned by tests/test_flash_attention.py::
test_flash_all_logits_negative).

ONLINE (one_pass=False, or N past the 32768 ceiling): FlashAttention-2 work
partitioning (arXiv:2307.08691), grid over (batch*head, query-block,
key-block), running (max, sum, acc) in VMEM scratch persisting across the
key axis — the N x N logit matrix never exists in HBM and VMEM use is
independent of N. Measured 19-32% slower than one-pass at N=2917..18497
(round-4 sweep) — the per-k-step correction passes and the re-streamed K/V
cost more than the one-pass logit tile's extra VMEM pressure.

Both kernels take q PRE-SCALED by the softmax scale (folded into XLA's
preceding ops), so the kernel never multiplies the (BQ, BK) logit tile by a
scalar. Bias-free paths additionally fold log2(e) into that pre-scale and
exponentiate with native exp2 (biased paths keep natural exp so cached bias
stacks shared with non-kernel fallbacks stay in logit units; the online
kernel instead rescales the bias once in XLA). Matmuls run in the storage
dtype (bf16 hits the MXU at full rate) with f32 accumulation; softmax math
is f32 on the VPU.

Measured (v5e, N=1297, H=16, D=64, bf16, per 16-head op, in-graph):
one-pass 113 us vs 139 us for the round-1 online kernel vs 332 us for XLA's
dot_product_attention; the bare matmul pair costs ~100 us, so the one-pass
kernel is within ~12% of the MXU floor for this shape (tools/attn_variants.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from ._common import _HAS_PLTPU, NEG_INF, pltpu, round_up as _round_up, tpu_kernels_available


LOG2E = 1.4426950408889634  # the online kernel works in exp2 domain (see below)

# One-pass cutoff. Rounds 1-3 served one-pass only to 2048 keys (where a
# whole-N q-block's f32 logit tile stays <= 16.8 MB); the round-4 on-chip
# sweep with the fixed adaptive-chain timer (tools/flash_tune.py, /tmp/
# hw_round4) showed one-pass beats the online kernel at EVERY serving N once
# block_q shrinks with N — 0.45 vs 0.50 ms at N=2917, 1.51 vs 1.99 at 5477,
# 5.41 vs 7.04 at 10405, 16.16 vs 19.89 at 18497 (per 16-head D=64 op) — so
# the cutoff now covers every DPT grid through ~2500^2-px inputs. VMEM stays
# bounded: the q-block cap keeps the logit tile ~16-34 MB and the resident
# K/V cost 2*N_pad*D*2B (8.4 MB at the 32768 ceiling). The online kernel
# remains for forced use (one_pass=False) and N past the ceiling.
ONE_PASS_MAX_KV = 32768
# Cap the one-pass q-block so the logit tile stays <= ~16 MB (floored at a
# 256-row block: at N=18497 the 256-row tile is 19 MB and measured 2% faster
# than the 128-row cap the strict budget would pick).
ONE_PASS_LOGIT_BYTES = 16 * 1024 * 1024
ONE_PASS_MIN_BLOCK_Q = 256


def flash_attention_available() -> bool:
    return tpu_kernels_available()


# ---------------------------------------------------------------------------
# one-pass kernel (whole key range in one block)
# ---------------------------------------------------------------------------


def _onepass_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len, exp2_domain=False, bias_ref=None):
    q = q_ref[0]  # (BQ, D), pre-scaled (by scale*log2(e) when exp2_domain)
    k = k_ref[0]  # (KV_pad, D), zero-padded
    v = v_ref[0]
    s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)
    kv_pad = s.shape[1]
    if kv_len < kv_pad:
        # additive (1, KV_pad) row mask instead of a full-tile iota/where:
        # the row-shaped iota+select are near-free on the VPU and the
        # broadcast add is ONE full-tile pass (vs ~3 for iota+cmp+select
        # at tile size) — numerically identical since |s| stays far from
        # the -1e30 sentinel
        col = lax.broadcasted_iota(jnp.int32, (1, kv_pad), 1)
        s = s + jnp.where(col < kv_len, 0.0, NEG_INF).astype(jnp.float32)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m) if exp2_domain else jnp.exp(s - m)
    d = v.shape[1]
    if d % 128 != 0:
        # fused l: the PV output group pads d up to 128 lanes anyway, so a
        # ones column rides along and the row-sum accumulates inside the
        # matmul — drops the full-tile jnp.sum VPU pass (padded kv rows
        # contribute nothing: their p is already 0). Same trick as the
        # online kernel; see _online_kernel docstring.
        ext = _round_up(d + 1, 128)
        v_ext = jnp.concatenate([v, jnp.ones((v.shape[0], ext - d), v.dtype)], axis=1)
        of = lax.dot_general(
            p.astype(v.dtype), v_ext, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0] = (of[:, :d] / jnp.maximum(of[:, d : d + 1], 1e-30)).astype(o_ref.dtype)
    else:
        l = jnp.sum(p, axis=1, keepdims=True)
        o = lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _onepass_qkv_kernel(
    qkv_ref, o_ref, *, kv_len, scale, d, hpp, bias_ref=None, block_q=None, qk_first=False
):
    """One-pass attention reading `hpp` heads' fused (N_pad, hpp*3D) q|k|v
    slab directly from the projection output — no host-side transposes. The
    unrolled per-head chains are independent, so Mosaic can overlap one
    head's softmax (VPU) with the next head's logit matmul (MXU) — the plain
    _onepass_kernel serializes QK (MXU) -> softmax (VPU) -> PV (MXU) within
    each program, so this overlap is the fused path's second win beyond the
    transpose removal.

    block_q: when set, the kernel is q-blocked — grid axis 2 picks a
    block_q-row q slice out of the (whole-N) resident slab, bounding the f32
    logit tiles at hpp*block_q*N_pad*4 B so the fused path serves every
    one-pass N instead of stopping at the whole-N VMEM ceiling (~n_pad 3600).
    The slab's BlockSpec ignores the q-grid index, so Mosaic keeps it
    resident across consecutive q-programs (revisit caching).

    qk_first: issue EVERY chain's QK logit matmul before any softmax+PV
    tail (cross-chain software pipelining — all of chain j+1's MXU work is
    schedulable under chain j's VPU softmax with no dependence analysis
    across chain bodies). Numerics identical; live-VMEM identical (Mosaic
    allocates per-value, so the hpp logit tiles are all live across the
    sequential loop too). Measured on-chip as part of the hpp=4 XL regime
    (see _hpp4_upgrade); promoted from experiments/flash_attention_xl.py."""
    slab = qkv_ref[0]
    kv_pad = slab.shape[0]
    # bias-free heads run in exp2 domain (log2(e) folds into the q scale for
    # free); biased heads keep natural exp so cached bias stacks — shared
    # with the non-kernel fallback paths — stay in logit units
    exp2_domain = bias_ref is None
    qscale = scale * LOG2E if exp2_domain else scale
    mask_row = None
    if kv_len < kv_pad:
        # (1, KV_pad) additive pad mask, built once for all heads — each
        # head's masking is then a single broadcast add instead of a
        # full-tile compare+select (see _onepass_kernel)
        col = lax.broadcasted_iota(jnp.int32, (1, kv_pad), 1)
        mask_row = jnp.where(col < kv_len, 0.0, NEG_INF).astype(jnp.float32)
    qsrc = slab
    if block_q is not None:
        assert bias_ref is None, "q-blocked fused path is unbiased-only (see fused_qkv_supported)"
        # slice the REF, not the loaded value: Mosaic has no lowering for
        # dynamic_slice on values (the round-4d hardware run failed with
        # "Unimplemented primitive ... dynamic_slice" — interpret-mode CPU
        # tests can't see this; tests/test_tpu_lowering.py now can, via
        # jax.export platforms=['tpu']). A pl.ds ref load with a 128-multiple
        # sublane offset lowers fine and reads only block_q rows from VMEM.
        qsrc = qkv_ref[0, pl.ds(pl.program_id(2) * block_q, block_q), :]
    def chain_logits(j):
        base = j * 3 * d
        q = (qsrc[:, base : base + d].astype(jnp.float32) * qscale).astype(slab.dtype)
        k = slab[:, base + d : base + 2 * d]
        s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + bias_ref[0, j].astype(jnp.float32)
        if mask_row is not None:
            s = s + mask_row
        return s

    def chain_tail(j, s):
        base = j * 3 * d
        v = slab[:, base + 2 * d : base + 3 * d]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m) if exp2_domain else jnp.exp(s - m)
        if d % 128 != 0:
            # fused l in the PV matmul's padded output lanes (see
            # _onepass_kernel) — one fewer full-tile VPU pass per head
            ext = _round_up(d + 1, 128)
            v_ext = jnp.concatenate([v, jnp.ones((v.shape[0], ext - d), v.dtype)], axis=1)
            of = lax.dot_general(
                p.astype(v.dtype), v_ext, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            o = of[:, :d] / jnp.maximum(of[:, d : d + 1], 1e-30)
        else:
            l = jnp.sum(p, axis=1, keepdims=True)
            o = lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) / jnp.maximum(l, 1e-30)
        o_ref[0, :, j * d : (j + 1) * d] = o.astype(o_ref.dtype)

    if qk_first:
        logits = [chain_logits(j) for j in range(hpp)]
        for j in range(hpp):
            chain_tail(j, logits[j])
    else:
        for j in range(hpp):
            chain_tail(j, chain_logits(j))


def _heads_per_program(num_heads: int, d: int) -> int | None:
    """Smallest head-group width whose qkv slab (hpp*3D) and output (hpp*D)
    blocks satisfy the TPU 128-lane divisibility rule."""
    for hpp in (1, 2, 4, 8):
        if num_heads % hpp == 0 and (3 * d * hpp) % 128 == 0 and (d * hpp) % 128 == 0:
            return hpp
    return None


# hpp=4 XL dispatch window (unbiased q-blocked path only). At D=64 the lane
# rule pins the minimum grouping to hpp=2; grouping 4 heads per program
# halves the program count, so each program's resident (N_pad, hpp*3D) slab
# DMA amortizes over twice the chain work — attacking exactly the "fixed
# per-op cost + slab DMA" residual the round-5 XL ablation isolated
# (docs/performance.md "structure-bound, not VPU-bound"). Measured on-chip
# at N=10405 (1428^2 ViT-L) in two independent sessions: 5.22 vs 5.51 ms
# anchor (2026-08-19) and 5.23 vs 5.50 ms (2026-08-20), -5% per op; third
# session live confirmation 5.20 vs 5.43-5.47 (round-5d). The bounds are
# chip-proven (tools/hpp4_probe.py): every n_pad in [8192, 13568] compiles
# and executes, 13824+ fails DEVICE compilation despite fitting the static
# budget. The window ceiling stays at 12288 rather than the compile
# boundary because the measured win decays toward it — -5% @10405 but only
# -1.0% @13056 / -2.8% @13568 (single session, round-5d), under the
# two-session >=5% promotion bar this repo holds kernel dispatch changes
# to (round-4e precedent). Below 8k the win is a measured wash (round-5d
# N=5477: all variants 1.60-1.62 ms) and the window stays closed.
HPP4_MIN_NPAD = 8 * 1024
HPP4_MAX_NPAD = 12 * 1024


def _hpp4_upgrade(n_pad: int, num_heads: int, d: int, hpp_min: int) -> bool:
    """True when the unbiased q-blocked call should group 4 heads per
    program instead of the lane-rule minimum (see HPP4_MIN_NPAD note)."""
    if hpp_min >= 4 or num_heads % 4 != 0:
        return False
    if not (HPP4_MIN_NPAD <= n_pad <= HPP4_MAX_NPAD):
        return False
    if (3 * d * 4) % 128 != 0 or (d * 4) % 128 != 0:
        return False
    # mirror the kernel's VMEM assert at the 256-row block floor the picker
    # lands on in this regime
    tile = 4 * ONE_PASS_MIN_BLOCK_Q * _round_up(n_pad, ONE_PASS_MIN_BLOCK_Q) * 4
    return tile + 16 * 1024 * 1024 <= _FUSED_VMEM_BUDGET


def _fused_vmem_need_bytes(n_pad: int, hpp: int, biased: bool) -> int:
    """VMEM bytes the fused-qkv one-pass kernel needs at (n_pad, hpp): the hpp
    unrolled f32 logit tiles, plus (biased) double-buffered bias blocks at the
    bf16 the kernel downcasts to when over budget, plus qkv/out slabs+margin.
    Single source of truth for the gate below and the kernel's asserts."""
    logit = hpp * n_pad * n_pad * 4
    bias_db = 2 * hpp * n_pad * n_pad * 2 if biased else 0
    return logit + bias_db + (8 if biased else 16) * 1024 * 1024


_FUSED_VMEM_BUDGET = 120 * 1024 * 1024  # under the ~128 MB physical VMEM


def fused_qkv_supported(
    n: int, num_heads: int, d: int, max_kv: int | None = None, biased: bool = False
) -> bool:
    """One-pass regime + a head grouping that satisfies lane alignment (+ for
    BIASED callers, the whole-N VMEM budget — the biased kernel is not
    q-blocked because per-q-block bias DMA from a cached stack would need
    block_q | n_pad, which BEiT grids don't satisfy).

    Unbiased callers are VMEM-feasible at EVERY one-pass N: past the whole-N
    logit ceiling (~n_pad 3600) the kernel q-blocks itself, bounding the f32
    logit tiles while the qkv slab stays resident across q-programs.

    max_kv overrides the serving cutoff (ONE_PASS_MAX_KV) — the kernel itself
    is VMEM-feasible somewhat past it (see flash_attention_fused_qkv's budget
    assert); tools/flash_tune.py measures where the cutover actually pays."""
    limit = ONE_PASS_MAX_KV if max_kv is None else max_kv
    n_pad = _round_up(n, 128)
    if n_pad > limit:
        return False
    hpp = _heads_per_program(num_heads, d)
    if hpp is None:
        return False
    if biased:
        return _fused_vmem_need_bytes(n_pad, hpp, True) <= _FUSED_VMEM_BUDGET
    # unbiased q-blocked feasibility at the 256-row block FLOOR: small head
    # dims force large hpp (e.g. d=16 -> hpp=8), whose floored logit tiles
    # can exceed physical VMEM at large N — refuse so the serving dispatch
    # falls back to the (B,N,H,D) wrapper instead of a Mosaic compile error.
    # Worst-case tile matches the kernel's assert: the logit tile spans
    # n_pad_q = round_up(n_pad, block_q) columns, not n_pad — without the
    # round_up a config within ~2 MB of the budget could pass the gate yet
    # trip the runtime assert instead of falling back.
    min_tile = hpp * ONE_PASS_MIN_BLOCK_Q * _round_up(n_pad, ONE_PASS_MIN_BLOCK_Q) * 4
    return min_tile + 16 * 1024 * 1024 <= _FUSED_VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret", "block_q"))
def flash_attention_fused_qkv(qkv, num_heads, bias=None, scale=None, interpret=False, bias_stack=None, layer=None, block_q=None):
    """Flash attention straight off the fused qkv projection output.

    qkv: (B, N, 3C) with columns in head-major [head][q|k|v][dim] order
    (checkpoints/convert_common.py:qkv_head_major). Each (batch, head-group)
    grid program DMAs one dense (N_pad, hpp*3D) slab — q, k and v arrive in a
    single contiguous read, eliminating the 3 input transposes + 1 output
    transpose the (B, N, H, D) wrapper needs (~50 us/block at ViT-L @ 504^2
    on v5e). bias: optional, broadcastable to (B, H, N, N). Returns (B, N, C).

    bias_stack + layer: alternative bias source for scanned per-layer biases
    (BEiT's cached relpos stack). bias_stack is the FULL pre-padded
    (L, H, n_pad, n_pad) array and layer an i32 scalar; the kernel uses a
    scalar-prefetch index_map to DMA its (hpp, n_pad, n_pad) bias blocks
    straight from the stack at the layer offset — no per-layer dynamic-slice
    copy on the scan path (which costs ~42 MB of extra HBM round-trip per
    layer at L-512).

    block_q: optional q-block rows for the UNBIASED path (multiple of 128).
    None auto-picks: whole-N while the hpp f32 logit tiles fit VMEM, else
    q-blocked (see _onepass_qkv_kernel) — which extends the fused path to
    every one-pass N. Biased calls are whole-N only (fused_qkv_supported
    gates them)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    scale = (d ** -0.5) if scale is None else scale
    n_pad = _round_up(n, 128)
    hpp = _heads_per_program(num_heads, d)
    assert hpp is not None, (
        "fused-qkv path needs a head grouping satisfying the 128-lane rule; use flash_attention"
    )
    # Feasibility here is a VMEM question, not the serving cutoff: the hpp
    # unrolled (BQ, n_pad) f32 logit tiles (plus qkv/out slabs) must fit the
    # ~128 MB physical VMEM. Whole-N q-blocks (BQ = n_pad) are fastest while
    # they fit; past that ceiling the UNBIASED kernel q-blocks itself (the
    # slab stays whole-N resident — only the q slice and logit tiles shrink).
    # ops/nn.py gates the serving dispatch at ONE_PASS_MAX_KV; direct callers
    # past it (the cutover sweep) are fine as long as this budget holds.
    biased_call = bias is not None or bias_stack is not None
    qk_first = False
    if not biased_call and _hpp4_upgrade(n_pad, num_heads, d, hpp):
        # XL regime: 4 heads per program + cross-chain QK-first pipelining,
        # the configuration measured -5% per op at N=10405 in two sessions
        # (see HPP4_MIN_NPAD). Promoted from experiments/flash_attention_xl.
        hpp = 4
        qk_first = True
    q_blocked = not biased_call and (
        block_q is not None or _fused_vmem_need_bytes(n_pad, hpp, False) > _FUSED_VMEM_BUDGET
    )
    n_pad_q = n_pad
    if q_blocked:
        if block_q is None:
            # largest 128-multiple whose hpp logit tiles stay ~2x the plain
            # kernel's per-tile budget (the hpp chains pipeline MXU/VPU, so
            # the doubled tile budget buys overlap, not waste), floored like
            # the plain kernel; prefer candidates minimizing dead padded rows
            cap = max(
                ONE_PASS_MIN_BLOCK_Q,
                2 * ONE_PASS_LOGIT_BYTES // (hpp * n_pad * 4) // 128 * 128,
            )
            cap = min(cap, n_pad)
            # prefer less dead q padding among candidates >= 512 rows (the
            # plain one-pass picker's rule: below 512 the per-dot fixed cost
            # dominates; the 256 floor is reached only via the cap itself)
            block_q, best_pad = cap, _round_up(n_pad, cap)
            for cand in range(cap, 511, -128):
                padded = _round_up(n_pad, cand)
                if padded < best_pad:
                    block_q, best_pad = cand, padded
        block_q = min(block_q, n_pad)
        n_pad_q = _round_up(n_pad, block_q)
    base_logit_bytes = hpp * (block_q if q_blocked else n_pad_q) * n_pad_q * 4
    assert base_logit_bytes + 16 * 1024 * 1024 <= _FUSED_VMEM_BUDGET, (
        f"fused-qkv one-pass needs ~{(base_logit_bytes >> 20) + 16} MB VMEM at "
        f"n_pad={n_pad}, hpp={hpp}, block_q={block_q if q_blocked else n_pad_q} "
        "(over the 128 MB physical budget); use flash_attention "
        "(fused_qkv_supported gates exactly this)"
    )

    qkvp = jnp.pad(qkv, ((0, 0), (0, n_pad_q - n), (0, 0)))
    grid = (b, num_heads // hpp) + ((n_pad_q // block_q,) if q_blocked else ())
    qkv_spec = pl.BlockSpec((1, n_pad_q, 3 * d * hpp), lambda bi, gi, *_: (bi, 0, gi))
    if q_blocked:
        out_spec = pl.BlockSpec((1, block_q, d * hpp), lambda bi, gi, qi: (bi, qi, gi))
    else:
        out_spec = pl.BlockSpec((1, n_pad_q, d * hpp), lambda bi, gi, *_: (bi, 0, gi))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        # the hpp unrolled logit tiles exceed the default 16 MB scoped-vmem
        # budget; scale the limit with the actual tile need (whole-N
        # past-cutoff callers reach ~90 MB) while staying under the 128 MB
        # physical VMEM
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=max(100 * 1024 * 1024, base_logit_bytes + 16 * 1024 * 1024)
        )

    if bias is not None or bias_stack is not None:
        # Biased-path VMEM budget: the hpp unrolled f32 logit tiles PLUS the
        # double-buffered (hpp, n_pad, n_pad) bias blocks must fit the scoped
        # limit. Near the n_pad=2048 one-pass boundary an f32 bias does not —
        # carry over-budget biases in bf16 instead (the serving aux caches
        # are bf16 already; the logit change is below bf16 rounding of the
        # bias itself).
        logit_bytes = hpp * n_pad * n_pad * 4
        bsrc = bias_stack if bias_stack is not None else bias
        bias_db_bytes = 2 * hpp * n_pad * n_pad * bsrc.dtype.itemsize
        if bsrc.dtype.itemsize > 2 and logit_bytes + bias_db_bytes > 80 * 1024 * 1024:
            bsrc = bsrc.astype(jnp.bfloat16)
            bias_db_bytes //= 2
            if bias_stack is not None:
                bias_stack = bsrc
            else:
                bias = bsrc
        need = logit_bytes + bias_db_bytes + 8 * 1024 * 1024  # qkv/out slabs + margin
        assert need <= _FUSED_VMEM_BUDGET, (
            f"fused-qkv biased path needs ~{need >> 20} MB VMEM at n_pad={n_pad}, hpp={hpp} "
            "(over the 128 MB physical budget); use flash_attention's (B,N,H,D) wrapper instead"
        )
        if _HAS_PLTPU and not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=max(100 * 1024 * 1024, need)
            )

    if bias_stack is not None:
        assert pltpu is not None, (
            "bias_stack path needs pallas-TPU (PrefetchScalarGridSpec); pltpu import failed"
        )
        assert bias is None and layer is not None
        assert bias_stack.ndim == 4 and bias_stack.shape[1] == num_heads
        assert bias_stack.shape[-2:] == (n_pad, n_pad), (
            "bias_stack must be pre-padded to the 128-lane tile size "
            f"{(n_pad, n_pad)}, got {bias_stack.shape[-2:]}"
        )

        def kernel_idx(idx_ref, qkv_ref, b_ref, o_ref):
            _onepass_qkv_kernel(qkv_ref, o_ref, kv_len=n, scale=scale, d=d, hpp=hpp, bias_ref=b_ref)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                qkv_spec,
                pl.BlockSpec((1, hpp, n_pad, n_pad), lambda bi, gi, idx_ref: (idx_ref[0], gi, 0, 0)),
            ],
            out_specs=out_spec,
        )
        out = pl.pallas_call(
            kernel_idx,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, n_pad, c), qkv.dtype),
            interpret=interpret,
            **kwargs,
        )(jnp.asarray(layer, jnp.int32).reshape(1), qkvp, bias_stack)
        return out[:, :n, :]

    in_specs = [qkv_spec]
    args = [qkvp]
    kernel = functools.partial(
        _onepass_qkv_kernel, kv_len=n, scale=scale, d=d, hpp=hpp,
        block_q=block_q if q_blocked else None, qk_first=qk_first,
    )
    if bias is not None:
        bp = jnp.broadcast_to(_fit_bias(bias, n_pad, n_pad, n, n), (b, num_heads, n_pad, n_pad))
        in_specs.append(pl.BlockSpec((1, hpp, n_pad, n_pad), lambda bi, gi: (bi, gi, 0, 0)))
        args.append(bp)

        def kernel(qkv_ref, b_ref, o_ref):
            _onepass_qkv_kernel(qkv_ref, o_ref, kv_len=n, scale=scale, d=d, hpp=hpp, bias_ref=b_ref)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), qkv.dtype),
        interpret=interpret,
        **kwargs,
    )(*args)
    return out[:, :n, :]


# ---------------------------------------------------------------------------
# online-softmax kernel (keys streamed in blocks)
# ---------------------------------------------------------------------------


def _online_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, *, kv_len, block_k, d, l_ref=None, bias_ref=None):
    """FlashAttention-2 inner step, VPU-minimized for the large-N regime.

    The per-step work is VPU-bound at D=64 (the two matmuls cost ~2.7 us on
    the MXU vs ~4.3 us measured per step for the round-2 kernel), so the
    softmax path is restructured to shed full-tile VPU passes:

    * exp2 domain — q arrives pre-scaled by softmax_scale*log2(e) and bias by
      log2(e) (folded into XLA ops outside), so `p = exp2(s - m)`: the VPU's
      native exponential-base-2 without the per-element ln2 multiply that
      lowering exp() inserts.
    * fused l column — when D is not a multiple of 128 the PV matmul's output
      group is padded to 128 lanes anyway, so v is extended with ones columns
      and the softmax row-sum accumulates INSIDE the acc matmul for free
      (same correction factor applies to o and l); the jnp.sum VPU pass and
      the separate l scratch disappear. l is read from acc column D at the
      end. When D % 128 == 0 the extension would cost a whole extra MXU
      column group, so the classic separate-l variant runs instead
      (l_ref is passed only in that case).
    """
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)
    fuse_l = l_ref is None

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if not fuse_l:
            l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (BQ, D), pre-scaled by scale*log2(e)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]
    block_q = q.shape[0]

    s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)
    # padding mask is only relevant in the final key block (static shapes);
    # build it as a (1, BK) row (near-free on the VPU) and apply with ONE
    # broadcast add — the full-tile iota+cmp+or+select this replaces cost
    # ~3 extra VPU passes per k-step, a measurable slice of the large-N
    # regime where the kernel is VPU-bound (see module docstring)
    if kv_len % block_k != 0:
        boundary_block = kv_len // block_k
        col = lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        keep = jnp.logical_or(ki != boundary_block, col < kv_len % block_k)
        s = s + jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    # (a packed-bf16 exp2 variant — exp on (s-m).astype(bf16) — measured
    # identical-to-slower on v5e at N=10k..18.5k, so the f32 path stays)
    p = jnp.exp2(s - m_new)
    correction = jnp.exp2(m_prev - m_new)
    m_ref[:, :1] = m_new
    if fuse_l:
        ext = acc_ref.shape[1]
        v_ext = jnp.concatenate([v, jnp.ones((v.shape[0], ext - d), v.dtype)], axis=1)
        acc_ref[:] = acc_ref[:] * correction + lax.dot_general(
            p.astype(v.dtype), v_ext, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    else:
        l_ref[:, :1] = l_ref[:, :1] * correction + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * correction + lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ki == num_k - 1)
    def _finalize():
        if fuse_l:
            o_ref[0] = (acc_ref[:, :d] / jnp.maximum(acc_ref[:, d : d + 1], 1e-30)).astype(o_ref.dtype)
        else:
            o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).astype(o_ref.dtype)


def _fit_bias(bias, rows, cols, n_rows=None, n_cols=None):
    """Shape a bias's trailing two dims to exactly (rows, cols) — a no-op when
    it already matches (the pre-padded cached-stack fast path), a slice when
    it is larger, a zero-pad when smaller.

    Padding contract: the kernels mask padded key columns by ADDING a -1e30
    row mask to the biased logits (not by overwriting them), so pad values in
    a caller-pre-padded bias must be ZERO — the convention this function and
    models/beit.compute_bias_stack both produce. A +1e30/NaN pad would cancel
    or poison the mask; finite small pads merely waste a few exp() lanes.

    Size-1 trailing dims are first broadcast over the LOGICAL sequence
    lengths (n_rows / n_cols) — the broadcastable-bias contract of
    jax.nn.dot_product_attention; zero-padding a broadcast dim instead would
    silently apply the bias to only query row 0 / key column 0."""
    br, bc = bias.shape[-2], bias.shape[-1]
    if br == 1 and (n_rows or rows) > 1:
        bias = jnp.broadcast_to(bias, (*bias.shape[:-2], n_rows or rows, bc))
    if bc == 1 and (n_cols or cols) > 1:
        bias = jnp.broadcast_to(bias, (*bias.shape[:-2], bias.shape[-2], n_cols or cols))
    br, bc = bias.shape[-2], bias.shape[-1]
    if (br, bc) == (rows, cols):
        return bias
    bias = bias[..., : min(br, rows), : min(bc, cols)]
    pad = [(0, 0)] * (bias.ndim - 2) + [(0, rows - bias.shape[-2]), (0, cols - bias.shape[-1])]
    return jnp.pad(bias, pad) if any(p != (0, 0) for p in pad) else bias


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret", "one_pass"))
def _flash_bhnd_prescaled(q, k, v, bias=None, block_q=None, block_k=None, interpret=False,
                          one_pass=None):
    """q/k/v: (BH, N, D), q already multiplied by the softmax scale.
    bias: optional (BH, N, N). Returns (BH, N, D).

    one_pass: None picks the kernel by the ONE_PASS_MAX_KV cutoff; True/False
    force a kernel (the cutover sweep, tools/flash_tune.py, measures both
    slightly past the cutoff — the one-pass VMEM budget allows it)."""
    bh, n, d = q.shape
    n_pad128 = _round_up(n, 128)

    if one_pass if one_pass is not None else (n_pad128 <= ONE_PASS_MAX_KV):
        # ---- one-pass: whole key range per program ----
        if block_q is None:
            # largest 128-multiple whose f32 logit tile fits the budget,
            # preferring blocks that minimize dead padded q rows (a whole-N
            # block is exact for small N; at large N the cap shrinks toward
            # the 256-row floor)
            cap = min(
                n_pad128,
                max(ONE_PASS_MIN_BLOCK_Q, ONE_PASS_LOGIT_BYTES // (n_pad128 * 4) // 128 * 128),
            )
            block_q, best_pad = cap, _round_up(n_pad128, cap)
            for cand in range(cap, 511, -128):
                padded = _round_up(n_pad128, cand)
                if padded < best_pad:
                    block_q, best_pad = cand, padded
        block_q = min(block_q, n_pad128)
        n_pad_q = _round_up(n, block_q)
        # Scoped-VMEM budget for this program: the (block_q, n_pad) f32 logit
        # tile + (biased) double-buffered bias blocks + K/V residency margin.
        # Mirrors the fused-qkv path: over-budget f32 biases are carried in
        # bf16 (the serving aux caches are bf16 already), and if the estimate
        # still exceeds the physical budget — only reachable with an f32 bias
        # at n_pad ≳ 29k, i.e. ~2700px+ BEiT inputs — fall back to the online
        # kernel instead of failing Mosaic compilation.
        vmem_need = block_q * n_pad128 * 4 + 16 * 1024 * 1024
        if bias is not None:
            bias_db = 2 * block_q * n_pad128 * bias.dtype.itemsize
            if bias.dtype.itemsize > 2 and vmem_need + bias_db > 80 * 1024 * 1024:
                bias = bias.astype(jnp.bfloat16)
                bias_db //= 2
            vmem_need += bias_db
            if vmem_need > _FUSED_VMEM_BUDGET and one_pass is not True:
                return _flash_bhnd_prescaled(
                    q, k, v, bias, interpret=interpret, one_pass=False
                )
        exp2_domain = bias is None  # biased logits stay in natural-exp units
        if exp2_domain:
            q = (q.astype(jnp.float32) * LOG2E).astype(q.dtype)
        qp = jnp.pad(q, ((0, 0), (0, n_pad_q - n), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, n_pad128 - n), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, n_pad128 - n), (0, 0)))
        grid = (bh, n_pad_q // block_q)
        in_specs = [
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_pad128, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n_pad128, d), lambda b, i: (b, 0, 0)),
        ]
        args = [qp, kp, vp]
        kernel = functools.partial(_onepass_kernel, kv_len=n, exp2_domain=exp2_domain)
        if bias is not None:
            bp = _fit_bias(bias, n_pad_q, n_pad128, n, n)
            in_specs.append(pl.BlockSpec((1, block_q, n_pad128), lambda b, i: (b, i, 0)))
            args.append(bp)

            def kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
                _onepass_kernel(q_ref, k_ref, v_ref, o_ref, kv_len=n, bias_ref=b_ref)

        kwargs = {}
        if _HAS_PLTPU and not interpret:
            # the (block_q, n_pad) f32 logit tile alone reaches 16 MiB at
            # N=2048 — raise the scoped-VMEM budget like the fused-qkv path,
            # scaled with the actual tile need (biased large-N programs pass
            # 100 MB)
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=max(100 * 1024 * 1024, vmem_need)
            )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, n_pad_q, d), q.dtype),
            interpret=interpret,
            **kwargs,
        )(*args)
        return out[:, :n, :]

    # ---- online: keys streamed in blocks ----
    # Round-3b on-chip sweep (tools/flash_tune.py, exp2 + fused-l kernel):
    # big q-blocks win as long as the q padding waste stays bounded —
    # (4096, 1024) reads 18.9 ms at N=18497 and 6.9 ms at N=10405 per
    # 16-head op (vs 22.1 / 7.4 for round-3's (1024, 1024)), while at
    # N=5477 the 4096 block pads 50% dead rows and (2048, 1024) wins
    # (1.75 ms). block_k below 1024 is disastrous (correction overhead per
    # k-step), 2048 is consistently worse (VMEM pressure halves pipelining).
    # XLA's dot_product_attention: 29-122 ms at these sizes, OOM at N=18497.
    if block_q is None:
        for cand in (4096, 2048, 1024, 512):
            if _round_up(n, cand) <= 1.2 * n_pad128:
                block_q = cand
                break
        else:
            block_q = 512
    if block_k is None:
        block_k = 1024
    block_q = min(block_q, n_pad128)
    block_k = min(block_k, n_pad128)
    n_pad_q = _round_up(n, block_q)
    n_pad_k = _round_up(n, block_k)

    # exp2 domain: fold log2(e) into q (and bias) once, in XLA, so the kernel's
    # exponentials are native base-2 — see _online_kernel docstring
    q = (q.astype(jnp.float32) * LOG2E).astype(q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, n_pad_q - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad_k - n), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad_k - n), (0, 0)))

    # l rides in the acc matmul when the PV output group has spare lanes
    fuse_l = d % 128 != 0
    acc_cols = _round_up(d + 1, 128) if fuse_l else d

    grid = (bh, n_pad_q // block_q, n_pad_k // block_k)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
    ]
    args = [qp, kp, vp]
    base_kernel = functools.partial(_online_kernel, kv_len=n, block_k=block_k, d=d)
    if fuse_l:
        def kernel(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref):
            base_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
            base_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, l_ref=l_ref)
    if bias is not None:
        bp = _fit_bias(bias, n_pad_q, n_pad_k, n, n)
        bp = (bp.astype(jnp.float32) * LOG2E).astype(bp.dtype)
        in_specs.append(pl.BlockSpec((1, block_q, block_k), lambda b, i, j: (b, i, j)))
        args.append(bp)

        if fuse_l:
            def kernel(q_ref, k_ref, v_ref, b_ref, o_ref, m_ref, acc_ref):
                base_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, bias_ref=b_ref)
        else:
            def kernel(q_ref, k_ref, v_ref, b_ref, o_ref, m_ref, l_ref, acc_ref):
                base_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, l_ref=l_ref, bias_ref=b_ref)

    if pltpu is None:
        raise RuntimeError(
            "online flash kernel needs pallas-TPU scratch (pltpu import failed); "
            "fall back to jax.nn.dot_product_attention for N > ONE_PASS_MAX_KV"
        )
    scratch_shapes = [
        pltpu.VMEM((block_q, 128), jnp.float32),  # running max (col 0 used)
        pltpu.VMEM((block_q, acc_cols), jnp.float32),  # acc (+ fused l column)
    ]
    if not fuse_l:
        scratch_shapes.insert(1, pltpu.VMEM((block_q, 128), jnp.float32))  # running sum

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        # allow large (block_q, block_k) logit tiles past the default 16 MB
        # scoped budget (the tuned blocks for N>8k reach 8-16 MB per tile)
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad_q, d), q.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **kwargs,
    )(*args)
    return out[:, :n, :]


def _flash_bhnd(q, k, v, bias=None, scale=None, interpret=False, **block_kw):
    """(BH, N, D) flash attention; q in natural (unscaled) form."""
    d = q.shape[-1]
    s = (d ** -0.5) if scale is None else scale
    qs = (q.astype(jnp.float32) * s).astype(q.dtype)
    return _flash_bhnd_prescaled(qs, k, v, bias, interpret=interpret, **block_kw)


def flash_attention(q, k, v, bias=None, scale=None, interpret=False):
    """Drop-in for jax.nn.dot_product_attention with (B, N, H, D) layout and
    optional additive bias broadcastable to (B, H, N, N)."""
    b, n, h, d = q.shape
    s = (d ** -0.5) if scale is None else scale
    # fold the softmax scale into q here so XLA fuses it with the transpose
    qs = (q.astype(jnp.float32) * s).astype(q.dtype)
    to_bhnd = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    qb, kb, vb = to_bhnd(qs), to_bhnd(k), to_bhnd(v)
    bias_b = None
    if bias is not None:
        bn = bias.shape[-2], bias.shape[-1]  # may be pre-padded past n (pads must be zero — see _fit_bias)
        bias_b = jnp.broadcast_to(bias, (b, h, *bn)).reshape(b * h, *bn)
    out = _flash_bhnd_prescaled(qb, kb, vb, bias_b, interpret=interpret)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
