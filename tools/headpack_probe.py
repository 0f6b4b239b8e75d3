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

Method: chain-slope timing — per-op time is the slope between two in-graph
scan-chain lengths, serialized by folding each op's output back into the
loop carry. Run: python tools/headpack_probe.py  (real TPU).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _chain(body_fn, carry_init, c1=1024, c2=16384, reps=5):
    # c1/c2 sizing: these probes are ~1-3 us ops, so the (c2-c1) delta needs
    # tens of thousands of links to rise above the tunnel's ±ms noise
    # (15360 links x ~2 us ≈ 30 ms of chip work); scan keeps compile flat.
    """body_fn(carry) -> next carry, which must DEPEND on the probed op's
    output (a broadcast add of its first column). The earlier
    optimization_barrier probe-output harness was DCE'd wholesale — both
    probes measured 0.0 us."""

    def build(chain):
        @jax.jit
        def many(carry):
            out, _ = lax.scan(lambda c, _: (body_fn(c), None), carry, None, length=chain)
            return out

        return many

    f1, f2 = build(c1), build(c2)
    np.asarray(f1(carry_init).ravel()[0])
    np.asarray(f2(carry_init).ravel()[0])

    def run(fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(carry_init).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(f2) - run(f1)) / (c2 - c1)


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

    def two_heads(c):  # c: (M, 64) loop-carried q
        s1 = lax.dot_general(c, k1, dn, preferred_element_type=jnp.float32)
        s2 = lax.dot_general(c, k2, dn, preferred_element_type=jnp.float32)
        return c + (s1[:, :1] + s2[:, :1]).astype(jnp.bfloat16) * eps

    def packed(c):  # c: (M, 128) loop-carried [q1|q2]
        s = lax.dot_general(c, bt, dn, preferred_element_type=jnp.float32)
        return c + s[:, :1].astype(jnp.bfloat16) * eps

    t_two = _chain(two_heads, q1)
    t_packed = _chain(packed, a)
    # control: one full-depth half-output matmul (if K=64 runs at exactly half
    # rate, t_two ~= t_packed ~= t_full; packing wins only if t_two >> t_full)
    kk = jnp.concatenate([k1, k2], axis=1)  # (N, 128)

    def full_depth(c):
        s = lax.dot_general(c, kk, dn, preferred_element_type=jnp.float32)
        return c + s[:, :1].astype(jnp.bfloat16) * eps

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
        return c ^ (s[:, :1] & 1).astype(jnp.int8)

    try:
        t_packed_i8 = _chain(packed_i8, a_i8)
    except Exception as e:  # noqa: BLE001
        t_packed_i8 = None
        print(f"int8 K-stacked probe failed: {type(e).__name__}: {str(e)[:160]}")

    print(f"two K=64 QK^T ops   (2 heads separate): {t_two * 1e6:8.1f} us")
    print(f"one K=128 packed    ([S1|S2] block-col): {t_packed * 1e6:8.1f} us")
    print(f"one K=128 same-out  (control, (M,128)x(128,N)): {t_full * 1e6:8.1f} us")
    if t_packed_i8 is not None:
        print(f"one K=128 packed INT8 ([S1|S2] block-col): {t_packed_i8 * 1e6:8.1f} us")
    r = t_two / t_packed
    print(
        f"\npacked speedup vs two-head separate: {r:.2f}x "
        f"({'worth a kernel' if r > 1.15 else 'NOT worth a kernel — half-rate padding already optimal'})"
    )
    if t_packed_i8 is not None:
        ri = t_two / t_packed_i8
        print(
            f"packed-INT8 speedup vs two-head bf16: {ri:.2f}x "
            f"({'worth an int8-QK kernel' if ri > 1.5 else 'NOT worth an int8-QK kernel'})"
        )


if __name__ == "__main__":
    main()
