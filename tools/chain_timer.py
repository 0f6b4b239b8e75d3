"""Shared in-graph chain-slope timer for per-op TPU measurements.

This environment reaches the chip through a relayed tunnel whose per-dispatch
wall cost has a large, jittery floor (~100-300 ms including readback setup),
so any slope whose chip-work delta is below a few hundred ms reads as ~0:
wall = max(floor, chip_work), and both chain lengths sit under the floor.
The round-3 flash_tune hit this with fixed (3, 9) chains ("0.06 ms for a
35 GFLOP op"); the round-4 headpack/int8 probes hit it again with fixed
chains sized for a ±ms noise model (measured "2158 TMAC/s" — 20x over the
v5e's 98.5 TMAC/s bf16 peak — and negative slopes).

The fix is one rule: size the chain so the k2-k1 DELTA alone is ~target_s
(default 0.5 s) of chip work. lax.scan keeps compile time flat in chain
length, so microsecond-scale ops simply get six-figure chains. A pilot
slope (with a generous fallback when the pilot itself is sub-floor)
estimates per-op time, then the real two-point measurement is sized from it.

Serialization: the scan body must fold fn's output back into the carry so
iterations are data-dependent — XLA can neither DCE the op nor overlap
links. (An earlier optimization_barrier harness left the probe output
unused and the whole chain was DCE'd.) fn here is carry -> next_carry and
the caller owns that folding.

Sanity: callers timing raw matmuls should compare against the v5e roofline
(98.5 TMAC/s bf16, 197 TMAC/s int8) and flag anything over ~1.2x peak as a
measurement failure rather than reporting it; see int8_mxu_probe.py.
"""

import time

import numpy as np
import jax
from jax import lax


V5E_BF16_TMACS = 98.5  # 197 TFLOPS / 2 MAC-per-FLOP
V5E_INT8_TMACS = 197.0  # 394 TOPS / 2


def timeit_chain(fn, x, reps=4, target_s=0.5, max_links=1 << 20, probe=None):
    """Per-op seconds for fn via the slope between two in-graph chain lengths.

    fn: carry -> next carry of the same shape/dtype; MUST depend on the
        probed op's output (fold e.g. out[:, :1] back in) or XLA will DCE it.
    x: initial carry (device or host array).
    probe: result -> scalar-ish to read back (defaults to .ravel()[0]).
    """
    if probe is None:
        probe = lambda y: y.ravel()[0]

    def build(k):
        @jax.jit
        def run(x0):
            y, _ = lax.scan(lambda c, _: (fn(c), None), x0, None, length=k)
            return y

        return run

    def run_best(j, r=reps):
        best = float("inf")
        for _ in range(r):
            t0 = time.perf_counter()
            np.asarray(probe(j(x)))
            best = min(best, time.perf_counter() - t0)
        return best

    # pilot: slope between 4 and 12 links (cheap; often sub-floor for small
    # ops — the fallbacks below keep the estimate usable anyway)
    j4, j12 = build(4), build(12)
    np.asarray(probe(j4(x)))
    np.asarray(probe(j12(x)))
    t4, t12 = run_best(j4, 2), run_best(j12, 2)
    pilot = (t12 - t4) / 8
    if pilot * 8 >= target_s:
        return pilot
    # if the pilot slope drowned in the dispatch floor, bound per-op time by
    # the full 12-link wall (floor-inflated -> overestimates per-op -> the
    # sized chain lands at >= target_s, which only improves the measurement)
    est = max(pilot, t12 / 12 / 4, 1e-7)
    k2 = min(max_links, max(16, int(target_s / est)))
    k1 = max(2, k2 // 4)
    j1, j2 = build(k1), build(k2)
    np.asarray(probe(j1(x)))
    np.asarray(probe(j2(x)))
    return (run_best(j2) - run_best(j1)) / (k2 - k1)
