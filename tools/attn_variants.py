"""Flash-attention kernel variant shootout on the real TPU.

Measures candidate optimizations for the round-2 MFU push at the headline
shape (DA ViT-L @ 504^2: BH=16 heads, N=1297 tokens, D=64, bf16):

  v0    current ops/pallas/flash_attention (online softmax, whole-K block)
  xla   jax.nn.dot_product_attention
  v1    one-pass kernel (K fits one block): no scratch, no online correction,
        q pre-scaled outside the kernel, iota mask for padded columns
  v2    v1 + exp2 domain (q pre-scaled by scale*log2(e))
  v3    v2 + mask-free padding: K/V zero-padding makes the pad logits 0, so
        max(s) >= 0 is a valid softmax shift and the pad contribution to the
        denominator is exactly (pad_count)*2^-m, subtracted analytically.
  v4    v3 with a single whole-N q-block (grid = heads only)
  v5    v3 with an inner unrolled k-chunk loop (online softmax in registers)
        so Mosaic can overlap the next chunk's MXU matmul with this chunk's
        VPU softmax work.

Run: python tools/attn_variants.py   (wants the real TPU; ~2 min)
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = float(np.log2(np.e))


def timeit_ingraph(f, q, k, v, label="", c1=32, c2=160, reps=6):
    """Per-op device time via the slope between two in-graph chain lengths
    (out feeds the next q). The tunnel's ~25 ms readback RTT and host
    dispatch overhead cancel in the difference."""

    def build(chain):
        @jax.jit
        def many(q, k, v):
            def body(carry, _):
                return f(carry, k, v), None

            out, _ = lax.scan(body, q, None, length=chain)
            return out

        return many

    f1, f2 = build(c1), build(c2)
    np.asarray(f1(q, k, v).ravel()[0])
    np.asarray(f2(q, k, v).ravel()[0])

    def run(fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(q, k, v).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    us = (run(f2) - run(f1)) / (c2 - c1) * 1e6
    print(f"{label:36s} {us:9.1f} us")
    return us


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# one-pass kernels (single k block)
# --------------------------------------------------------------------------


def _onepass_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len, mode):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    bk = s.shape[1]
    if mode in ("mask_exp", "mask_exp2"):
        if kv_len < bk:
            col = lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m) if mode == "mask_exp2" else jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
    elif mode == "nosm":  # ablation: both matmuls + cast, no softmax at all
        p = s.astype(v.dtype)
        l = jnp.ones((s.shape[0], 1), jnp.float32)
    elif mode == "maxonly":  # ablation: + max-reduce and subtract, no exp
        m = jnp.max(s, axis=1, keepdims=True)
        p = (s - m).astype(v.dtype)
        l = jnp.ones((s.shape[0], 1), jnp.float32)
    elif mode == "exponly":  # ablation: exp2 but no max/sum reductions
        p = jnp.exp2(s)
        l = jnp.ones((s.shape[0], 1), jnp.float32)
    else:  # padfix: no mask; zero-padded K makes pad logits 0 -> m >= 0 valid
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        if kv_len < bk:
            l = l - (bk - kv_len) * jnp.exp2(-m)
    o = lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _innerloop_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len, chunk):
    q = q_ref[0]
    bq = q.shape[0]
    bk_total = k_ref.shape[1]
    n_chunks = bk_total // chunk
    m = jnp.full((bq, 1), -1e30, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, q.shape[1]), jnp.float32)
    for i in range(n_chunks):
        kc = k_ref[0, i * chunk : (i + 1) * chunk, :]
        vc = v_ref[0, i * chunk : (i + 1) * chunk, :]
        s = lax.dot_general(q, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m - m_new)
        lc = jnp.sum(p, axis=1, keepdims=True)
        if (i + 1) * chunk > kv_len:  # final chunk holds the zero padding
            lc = lc - ((i + 1) * chunk - max(kv_len, i * chunk)) * jnp.exp2(-m_new)
        l = l * corr + lc
        acc = acc * corr + lax.dot_general(
            p.astype(vc.dtype), vc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = m_new
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "block_q", "chunk"))
def flash_variant(q, k, v, mode="padfix", block_q=704, chunk=None):
    """q pre-scaled. q/k/v: (BH, N, D)."""
    bh, n, d = q.shape
    n_pad_k = _round_up(n, 128)
    n_pad_q = _round_up(n, block_q)
    qp = jnp.pad(q, ((0, 0), (0, n_pad_q - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad_k - n), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad_k - n), (0, 0)))
    grid = (bh, n_pad_q // block_q)
    if chunk is None:
        kernel = functools.partial(_onepass_kernel, kv_len=n, mode=mode)
    else:
        kernel = functools.partial(_innerloop_kernel, kv_len=n, chunk=chunk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_pad_k, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n_pad_k, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad_q, d), q.dtype),
    )(qp, kp, vp)
    return out[:, :n, :]


def main():
    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from muggled_dpt_tpu.ops.pallas.flash_attention import _flash_bhnd, flash_attention

    bh, n, d = 16, 1297, 64
    scale = d ** -0.5
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.bfloat16)
    q_s = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    q_s2 = (q.astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)

    # correctness reference (f32 math)
    def ref_attn(q, k, v):
        s = jnp.einsum("hnd,hmd->hnm", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("hnm,hmd->hnd", w, v.astype(jnp.float32))

    ref = np.asarray(jax.jit(ref_attn)(q, k, v))

    def check(out, label):
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        print(f"  {label}: max abs err vs f32 ref = {err:.4f}")

    check(_flash_bhnd(q, k, v, None, scale=scale), "v0 current")
    check(flash_variant(q_s, k, v, mode="mask_exp"), "v1 mask+exp")
    check(flash_variant(q_s2, k, v, mode="mask_exp2"), "v2 mask+exp2")
    check(flash_variant(q_s2, k, v, mode="padfix"), "v3 padfix")
    check(flash_variant(q_s2, k, v, mode="padfix", block_q=1408), "v4 padfix 1q")
    check(flash_variant(q_s2, k, v, chunk=704), "v5 inner-loop 704")
    check(flash_variant(q_s2, k, v, chunk=352), "v5 inner-loop 352")

    # (B,N,H,D) XLA comparison
    qb = q.reshape(1, 16, n, d).transpose(0, 2, 1, 3)
    kb = k.reshape(1, 16, n, d).transpose(0, 2, 1, 3)
    vb = v.reshape(1, 16, n, d).transpose(0, 2, 1, 3)
    xla_f = jax.jit(lambda a, b, c: jax.nn.dot_product_attention(a, b, c))
    wrap_f = jax.jit(lambda a, b, c: flash_attention(a, b, c))

    print("\n-- in-graph timings (per 16-head op, 64 chained) --")
    timeit_ingraph(lambda a, b, c: _flash_bhnd(a, b, c, None, scale=scale), q, k, v, label="v0 current flash (bhnd)")
    timeit_ingraph(lambda a, b, c: jax.nn.dot_product_attention(a, b, c), qb, kb, vb, label="xla dot_product_attention (bnhd)")
    timeit_ingraph(lambda a, b, c: flash_attention(a, b, c), qb, kb, vb, label="v0 wrapper incl transposes (bnhd)")
    timeit_ingraph(functools.partial(flash_variant, mode="mask_exp"), q_s, k, v, label="v1 onepass mask exp")
    timeit_ingraph(functools.partial(flash_variant, mode="mask_exp2"), q_s2, k, v, label="v2 onepass mask exp2")
    timeit_ingraph(functools.partial(flash_variant, mode="padfix"), q_s2, k, v, label="v3 onepass padfix exp2")
    timeit_ingraph(functools.partial(flash_variant, mode="padfix", block_q=1408), q_s2, k, v, label="v4 padfix whole-N q")
    timeit_ingraph(functools.partial(flash_variant, mode="padfix", block_q=352), q_s2, k, v, label="v3 padfix block_q=352")
    timeit_ingraph(functools.partial(flash_variant, chunk=704), q_s2, k, v, label="v5 inner-loop chunk=704")
    timeit_ingraph(functools.partial(flash_variant, chunk=352), q_s2, k, v, label="v5 inner-loop chunk=352")

    print("\n-- ablations (whole-N q-block, grid=16) --")
    timeit_ingraph(functools.partial(flash_variant, mode="nosm", block_q=1408), q_s2, k, v, label="abl: 2 matmuls + cast only")
    timeit_ingraph(functools.partial(flash_variant, mode="maxonly", block_q=1408), q_s2, k, v, label="abl: + max-reduce/sub")
    timeit_ingraph(functools.partial(flash_variant, mode="exponly", block_q=1408), q_s2, k, v, label="abl: + exp2 (no reductions)")


if __name__ == "__main__":
    main()
