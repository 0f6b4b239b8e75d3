"""Does the v5e MXU really run int8 matmuls at 2x the bf16 rate — and does
that survive the D=64 attention contraction?

Motivation: at 1904^2 the online flash kernel sits near its MXU floor, and
that floor is itself ~2x off peak because attention's QK^T contracts over
D=64 (half the 128-deep MXU) and PV writes a 64-wide output group. The v5e
datasheet rate is 394 TOPS int8 vs 197 TFLOPS bf16 — IF an int8 QK^T hits
the 2x rate at K=64, an int8-attention serving tier could lift the
large-resolution ratios. This probe measures the primitive before we invest
in a kernel.

Method: adaptive chain-slope timing (tools/chain_timer.py) — per-op time is
the slope between two in-graph scan chain lengths sized so the delta alone
is ~0.5 s of chip work, serialized by folding each matmul's output back into
the loop carry so XLA can neither DCE nor overlap iterations. (The round-4a
fixed (64, 640) chains put ~25-50 ms in the delta — below the tunnel's
dispatch floor — and read 2158 TMAC/s, 20x over the bf16 peak.)
Run: python tools/int8_mxu_probe.py   (real TPU, ~5 min)
"""

import os.path as osp
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tools.chain_timer import V5E_BF16_TMACS, V5E_INT8_TMACS, timeit_chain  # noqa: E402


def time_matmul(m, k, n, dtype, acc_dtype):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        lhs = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
        rhs = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))
    else:
        lhs = jnp.asarray(rng.standard_normal((m, k)), dtype)
        rhs = jnp.asarray(rng.standard_normal((k, n)), dtype)

    def body(carry):
        out = lax.dot_general(
            carry, rhs, (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype
        )
        # Fold a max-reduction of the ENTIRE output back into the carry.
        # Every link then depends on every output element, so XLA can neither
        # DCE the matmul (an unused-probe harness was DCE'd wholesale) nor
        # narrow it: a column-slice fold invites the slice-through-dot
        # rewrite dot(c, rhs)[:, :1] -> dot(c, rhs[:, :1]) (the round-4a int8
        # rows read 3704 TMAC/s, 19x peak, while bf16 rows were sane), and a
        # sum fold is algebraically movable (reduce(dot) -> dot(reduce));
        # max commutes with neither. The reduce fuses as a dot epilogue.
        red = out.max(axis=1)[:, None]
        if dtype == jnp.int8:
            return carry ^ (red & 1).astype(jnp.int8)
        return carry + red.astype(dtype) * jnp.asarray(1e-9, dtype)

    per_op = timeit_chain(body, lhs)
    macs = m * k * n
    return per_op, macs / per_op / 1e12


def main():
    print(f"devices: {jax.devices()}")
    cases = [
        # attention QK^T shape class: contraction 64 (output-traffic heavy —
        # the K-ladder below isolates the MXU component)
        ("QK^T  bf16 K=64 ", 8192, 64, 8192, jnp.bfloat16, jnp.float32),
        ("QK^T  int8 K=64 ", 8192, 64, 8192, jnp.int8, jnp.int32),
        # PV shape class: deep contraction, 64-wide output
        ("PV    bf16 out64", 8192, 8192, 64, jnp.bfloat16, jnp.float32),
        ("PV    int8 out64", 8192, 8192, 64, jnp.int8, jnp.int32),
        # K-ladder at fixed M=N: output traffic is constant across rows, so
        # the time-vs-K slope is the pure MXU rate per dtype and the K=64
        # intercept exposes any fixed half-rate/relayout penalty
    ]
    for dt, acc, name in ((jnp.bfloat16, jnp.float32, "bf16"), (jnp.int8, jnp.int32, "int8")):
        for kk in (64, 128, 256, 512):
            cases.append((f"ladder {name} K={kk}", 4096, kk, 4096, dt, acc))
    results = {}
    for label, m, k, n, dt, acc in cases:
        try:
            per_op, tmacs = time_matmul(m, k, n, dt, acc)
            peak = V5E_INT8_TMACS if dt == jnp.int8 else V5E_BF16_TMACS
            suspect = tmacs > 1.2 * peak or per_op <= 0
            if not suspect:
                results[label] = (per_op, tmacs)
            flag = "  << SUSPECT: over peak / negative, measurement failed" if suspect else ""
            print(f"{label}: {per_op*1e6:9.1f} us  {tmacs:7.2f} TMAC/s{flag}", flush=True)
        except Exception as e:  # int8 dot may not lower on all backends
            print(f"{label}: FAILED — {type(e).__name__}: {str(e)[:200]}", flush=True)

    qk_bf, qk_i8 = results.get("QK^T  bf16 K=64 "), results.get("QK^T  int8 K=64 ")
    if qk_bf and qk_i8:
        r = qk_bf[0] / qk_i8[0]
        print(f"\nint8 QK^T speedup at K=64: {r:.2f}x "
              f"({'worth a kernel' if r > 1.5 else 'NOT worth a kernel'})")
    pv_bf, pv_i8 = results.get("PV    bf16 out64"), results.get("PV    int8 out64")
    if pv_bf and pv_i8:
        print(f"int8 PV   speedup at out=64: {pv_bf[0] / pv_i8[0]:.2f}x")

    # K-ladder: least-squares time-vs-K slope at fixed M=N=4096 — output
    # traffic cancels, leaving the per-dtype MXU rate; the K=64 intercept
    # shows the fixed per-op cost the contraction depth can't amortize.
    for name in ("bf16", "int8"):
        pts = [(kk, results[f"ladder {name} K={kk}"][0])
               for kk in (64, 128, 256, 512) if f"ladder {name} K={kk}" in results]
        if len(pts) >= 3:
            ks = np.array([p[0] for p in pts], np.float64)
            ts = np.array([p[1] for p in pts], np.float64)
            slope, intercept = np.polyfit(ks, ts, 1)
            if slope > 0:
                rate = 4096 * 4096 / slope / 1e12  # MACs per unit K / s
                print(f"ladder {name}: MXU rate from K-slope {rate:7.2f} TMAC/s, "
                      f"fixed per-op cost {intercept*1e6:6.1f} us")


if __name__ == "__main__":
    main()
