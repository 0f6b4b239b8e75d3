"""Would 2-head packing lift the D=64 QK^T contraction off half MXU rate?

Round-3 VERDICT avenue (b) for the large-N attention floor: pack two heads so
the QK contraction runs at K=2D=128 full MXU depth. The only packing with
correct (un-summed) per-head logits is K-stacking:

    A  = [q1 | q2]                 (M, 128)
    Bt = [[k1 | 0], [0 | k2]]      (2N, 128)
    A @ Bt^T = [S1 | S2]           (M, 2N)  — block columns per head

Roofline: if K=64 runs at exactly half rate (the array pads the contraction
to 128), two (M,64)x(64,N) ops cost the same pass count as one full-rate
(M,128)x(128,2N) — packing is NEUTRAL, and the zero-halves double K-operand
VMEM/HBM traffic. Packing only wins if the hardware/Mosaic penalty for K=64
is WORSE than 2x (extra relayout passes, pipeline bubbles). This probe
measures that primitive before any kernel is built; the decision rule is the
same as tools/int8_mxu_probe.py.

Method: adaptive chain-slope timing (tools/chain_timer.py) — per-op time is
the slope between two in-graph scan-chain lengths sized so the delta alone
is ~0.5 s of chip work (the round-4a fixed 16k-link chains produced ~30 ms
deltas, below the tunnel's dispatch floor, and read 0.0 us), serialized by
folding each op's output back into the loop carry.
Run: python tools/headpack_probe.py  (real TPU).
"""

import os.path as osp
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tools.chain_timer import V5E_BF16_TMACS, V5E_INT8_TMACS, timeit_chain  # noqa: E402


def _chain(body_fn, carry_init):
    return timeit_chain(body_fn, carry_init)


def _fmt(label, t, macs, peak_tmacs):
    tmacs = macs / t / 1e12 if t > 0 else float("inf")
    flag = "  << SUSPECT: over peak, measurement failed" if tmacs > 1.2 * peak_tmacs else ""
    return f"{label}: {t * 1e6:8.1f} us  {tmacs:7.2f} TMAC/s{flag}"


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    m, n, d = 2048, 1024, 64  # online-kernel tile class: BQ=2048, BK=1024
    q1 = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
    q2 = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)

    # packed operands, built once outside the timed chain (the kernel variant
    # would lay these out in XLA at the qkv projection epilogue)
    a = jnp.concatenate([q1, q2], axis=1)  # (M, 128)
    z = jnp.zeros_like(k1)
    bt = jnp.concatenate(
        [jnp.concatenate([k1, z], axis=1), jnp.concatenate([z, k2], axis=1)], axis=0
    )  # (2N, 128)

    dn = (((1,), (1,)), ((), ()))  # contract last dims (q @ k^T)

    eps = jnp.asarray(1e-9, jnp.bfloat16)

    # Folds consume the ENTIRE logit tile via a max-reduction: a column-slice
    # fold invites XLA's slice-through-dot narrowing and a sum fold is
    # algebraically movable into the operands; max commutes with neither, and
    # fuses as the dot's epilogue. Note both real candidates write the same
    # 2MN logits (two (M,N) tiles vs one (M,2N)), so output traffic cancels
    # in the comparison.

    def two_heads(c):  # c: (M, 64) loop-carried q
        s1 = lax.dot_general(c, k1, dn, preferred_element_type=jnp.float32)
        s2 = lax.dot_general(c, k2, dn, preferred_element_type=jnp.float32)
        red = jnp.maximum(s1.max(axis=1), s2.max(axis=1))[:, None]
        return c + red.astype(jnp.bfloat16) * eps

    def packed(c):  # c: (M, 128) loop-carried [q1|q2]
        s = lax.dot_general(c, bt, dn, preferred_element_type=jnp.float32)
        return c + s.max(axis=1)[:, None].astype(jnp.bfloat16) * eps

    t_two = _chain(two_heads, q1)
    t_packed = _chain(packed, a)
    # control: one full-depth half-output matmul (if K=64 runs at exactly half
    # rate, t_two ~= t_packed ~= t_full; packing wins only if t_two >> t_full)
    kk = jnp.concatenate([k1, k2], axis=1)  # (N, 128)

    def full_depth(c):
        s = lax.dot_general(c, kk, dn, preferred_element_type=jnp.float32)
        return c + s.max(axis=1)[:, None].astype(jnp.bfloat16) * eps

    t_full = _chain(full_depth, a)

    # int8 K-stacked variant: bf16 packing is MAC-neutral (the block-diagonal
    # zeros exactly cancel the full-rate gain), but int8's datasheet rate is
    # 4x the bf16 HALF rate the K=64 contraction is stuck at — if the v5e
    # delivers it, an int8-QK^T K-stacked kernel wins ~2x on the QK half of
    # large-N attention even after doubling the MACs.
    rngi = np.random.default_rng(1)
    a_i8 = jnp.asarray(rngi.integers(-127, 127, (m, 2 * d), dtype=np.int8))
    bt_i8 = jnp.asarray(rngi.integers(-127, 127, (2 * n, 2 * d), dtype=np.int8))

    def packed_i8(c):  # c: (M, 128) int8 loop-carried [q1|q2]
        s = lax.dot_general(c, bt_i8, dn, preferred_element_type=jnp.int32)
        return c ^ (s.max(axis=1)[:, None] & 1).astype(jnp.int8)

    try:
        t_packed_i8 = _chain(packed_i8, a_i8)
    except Exception as e:  # noqa: BLE001
        t_packed_i8 = None
        print(f"int8 K-stacked probe failed: {type(e).__name__}: {str(e)[:160]}")

    macs_two = 2 * m * d * n  # two (M,64)x(64,N)
    macs_packed = m * 2 * d * 2 * n  # one (M,128)x(128,2N) incl. zero halves
    macs_full = m * 2 * d * n
    print(_fmt("two K=64 QK^T ops   (2 heads separate)", t_two, macs_two, V5E_BF16_TMACS))
    print(_fmt("one K=128 packed    ([S1|S2] block-col)", t_packed, macs_packed, V5E_BF16_TMACS))
    print(_fmt("one K=128 same-out  (control         )", t_full, macs_full, V5E_BF16_TMACS))
    if t_packed_i8 is not None:
        print(_fmt("one K=128 packed INT8 ([S1|S2] blkcol)", t_packed_i8, macs_packed, V5E_INT8_TMACS))
    if min(t_two, t_packed, t_full) <= 0:
        print("\nnegative slope — measurement failed, no verdict")
        return
    r = t_two / t_packed
    print(
        f"\npacked speedup vs two-head separate: {r:.2f}x "
        f"({'worth a kernel' if r > 1.15 else 'NOT worth a kernel — half-rate padding already optimal'})"
    )
    if t_packed_i8 is not None and t_packed_i8 > 0:
        ri = t_two / t_packed_i8
        print(
            f"packed-INT8 speedup vs two-head bf16: {ri:.2f}x "
            f"({'worth an int8-QK kernel' if ri > 1.5 else 'NOT worth an int8-QK kernel'})"
        )


if __name__ == "__main__":
    main()
