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
        # fold the output's first column back into the carry so every link
        # DEPENDS on the previous matmul (an unused-probe harness was DCE'd
        # wholesale). The broadcast op is one (m, k) VPU pass, ~1% of the
        # matmul.
        if dtype == jnp.int8:
            return carry ^ (out[:, :1] & 1).astype(jnp.int8)
        return carry + out[:, :1].astype(dtype) * jnp.asarray(1e-9, dtype)

    per_op = timeit_chain(body, lhs)
    macs = m * k * n
    return per_op, macs / per_op / 1e12


def main():
    print(f"devices: {jax.devices()}")
    cases = [
        # attention QK^T shape class: contraction 64
        ("QK^T  bf16 K=64 ", 8192, 64, 8192, jnp.bfloat16, jnp.float32),
        ("QK^T  int8 K=64 ", 8192, 64, 8192, jnp.int8, jnp.int32),
        # PV shape class: deep contraction, 64-wide output
        ("PV    bf16 out64", 8192, 8192, 64, jnp.bfloat16, jnp.float32),
        ("PV    int8 out64", 8192, 8192, 64, jnp.int8, jnp.int32),
        # control: square, full-depth — the MXU peak for each dtype
        ("ctrl  bf16 K=512", 4096, 512, 4096, jnp.bfloat16, jnp.float32),
        ("ctrl  int8 K=512", 4096, 512, 4096, jnp.int8, jnp.int32),
        ("ctrl  int8 K=256", 4096, 256, 4096, jnp.int8, jnp.int32),
    ]
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


if __name__ == "__main__":
    main()
