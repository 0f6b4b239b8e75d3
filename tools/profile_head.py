"""Per-op profile of the DPT fusion/head tail at large resolutions.

Motivation: at 1428² the component split reads encoder 166 / reassembly 4.3 /
fusion 12.1 / head 14.5 ms (tools/profile_split.py, round-4f), while the
head's conv roofline is ~3 ms — and the bf16 resize path applies DENSE
(out,in) MXU matmuls whose FLOPs grow quadratically with size (a measured win
at 504², ops/resize.py:198-209, but ~3.4 ms of mostly-zero MACs for the
816→1428 upsample and ~8 ms at 1088→1904). This tool times each op in the
fusion/head tail individually (adaptive chain-slope timing — single-op probes
under ~300 µs are tunnel noise, see tools/chain_timer.py) and measures two
resize candidates against the serving dense path:

* banded: the same row-stochastic weights, but applied per 128-row output
  block against only the input window that block's taps touch (static
  slices + small einsums). FLOPs drop by ~in_size/window ≈ 6-10× at the
  large sizes; every matmul stays MXU-shaped.
* gather: the sparse 2-tap lerp (jnp.take), the f32 parity path's form —
  measured SLOWER than dense at 288→504 in round 2b, re-measured here at
  the large sizes where the dense FLOP waste is no longer free.

If a candidate wins on-chip it gets wired into ops/resize.py behind the same
bf16 gate (scale-aware dispatch); a loser stays recorded here.

CAVEAT (round-4h): after commit 0684f83 the package ``resize_2d`` ITSELF
dispatches banded above BANDED_MIN_IN=384 input rows, so a "dense" row that
calls ``resize_2d`` measures banded-vs-banded (the 4h run read 1.84 vs
1.86 ms at 816→1428 — consistency, not a verdict). The dense row below now
builds the full (out,in) einsum directly, bypassing the dispatch, and the
"serving" row times whatever ``resize_2d`` actually ships.

Run on the TPU: python tools/profile_head.py [--size 1428 1904]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from muggled_dpt_tpu.ops.nn import conv2d, conv3x3_shiftsum, linear  # noqa: E402
from muggled_dpt_tpu.ops.resize import _resize_matrix_np, resize_2d  # noqa: E402
from tools.chain_timer import timeit_chain as _timeit_chain  # noqa: E402


def timeit(op, x, target_s=0.3):
    """Chain-slope time for op: x -> y (any output shape). The carry is x with
    a single element perturbed by a max-reduction of y. The fold MUST consume
    the whole output: the round-4g run folded only y[0,...,0] and XLA sliced
    the convolutions down to the one output pixel the fold read (conv rows
    printed ~0.00 ms — spatial slicing pushes through conv_general_dilated but
    not through the einsum+concat resize paths, which timed sanely)."""

    def step(c):
        y = op(c)
        return c.at[0, 0, 0, 0].add(jnp.max(y).astype(c.dtype) * c.dtype.type(1e-6))

    return _timeit_chain(step, x, reps=4, target_s=target_s, probe=lambda y: y[0, 0, 0, 0])


# ---------------------------------------------------------------------------
# resize candidates (bf16, same trace-time torch-exact weights)
# ---------------------------------------------------------------------------


def _banded_blocks(in_size, out_size, align_corners, block=128):
    w = _resize_matrix_np(in_size, out_size, "linear", align_corners, False)
    blocks = []
    for o0 in range(0, out_size, block):
        o1 = min(o0 + block, out_size)
        rows = w[o0:o1]
        nz = np.nonzero(rows.any(axis=0))[0]
        lo, hi = int(nz[0]), int(nz[-1]) + 1
        blocks.append((o0, o1, lo, hi, rows[:, lo:hi]))
    return blocks


def resize_2d_banded(x, out_hw, align_corners=True, block=128):
    """Separable linear resize with block-banded weight application: each
    128-output-row block multiplies only its input window."""
    n, h, w, c = x.shape
    out_h, out_w = out_hw
    if out_h != h:
        parts = [
            jnp.einsum("oh,nhwc->nowc", jnp.asarray(wb, x.dtype), x[:, lo:hi])
            for (_, _, lo, hi, wb) in _banded_blocks(h, out_h, align_corners, block)
        ]
        x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    if out_w != w:
        parts = [
            jnp.einsum("ow,nhwc->nhoc", jnp.asarray(wb, x.dtype), x[:, :, lo:hi])
            for (_, _, lo, hi, wb) in _banded_blocks(w, out_w, align_corners, block)
        ]
        x = jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]
    return x


def resize_2d_dense(x, out_hw, align_corners=True):
    """True dense (out,in) matmul resize — resize_2d's pre-0684f83 bf16 path,
    inlined so the package's banded dispatch can't silently take over."""
    n, h, w, c = x.shape
    out_h, out_w = out_hw
    if out_h != h:
        wm = jnp.asarray(_resize_matrix_np(h, out_h, "linear", align_corners, False), x.dtype)
        x = jnp.einsum("oh,nhwc->nowc", wm, x, preferred_element_type=x.dtype)
    if out_w != w:
        wm = jnp.asarray(_resize_matrix_np(w, out_w, "linear", align_corners, False), x.dtype)
        x = jnp.einsum("ow,nhwc->nhoc", wm, x, preferred_element_type=x.dtype)
    return x


def resize_2d_gather(x, out_hw, align_corners=True):
    from muggled_dpt_tpu.ops.resize import _linear_taps_np

    n, h, w, c = x.shape
    out_h, out_w = out_hw
    if out_h != h:
        i0, i1, w0, w1 = _linear_taps_np(h, out_h, align_corners)
        x = (
            jnp.take(x, jnp.asarray(i0), axis=1) * jnp.asarray(w0, x.dtype)[:, None, None]
            + jnp.take(x, jnp.asarray(i1), axis=1) * jnp.asarray(w1, x.dtype)[:, None, None]
        )
    if out_w != w:
        i0, i1, w0, w1 = _linear_taps_np(w, out_w, align_corners)
        x = (
            jnp.take(x, jnp.asarray(i0), axis=2) * jnp.asarray(w0, x.dtype)[:, None]
            + jnp.take(x, jnp.asarray(i1), axis=2) * jnp.asarray(w1, x.dtype)[:, None]
        )
    return x


def main():
    args = sys.argv[1:]
    sizes = [int(a) for a in args if a.isdigit()] or [1428, 1904]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    for full in sizes:
        grid = full // 14  # DA ViT-L patch grid
        fuse = grid * 8  # fusion output resolution (8x patch grid)
        half = fuse // 2
        print(f"\n=== input {full}² (patch grid {grid}, fusion map {fuse}²) ===")

        # ---- head ops ----
        x256 = jnp.asarray(rng.standard_normal((1, fuse, fuse, 256)), dt)
        k_in = jnp.asarray(rng.standard_normal((3, 3, 256, 128)) * 0.05, dt)
        t = timeit(lambda a: conv2d(a, k_in, padding=1), x256)
        print(f"  head conv_in 3x3 256->128 @{fuse}²      {t*1e3:8.2f} ms")

        x128 = jnp.asarray(rng.standard_normal((1, fuse, fuse, 128)), dt)
        for name, fn in (
            ("dense  ", lambda a: resize_2d_dense(a, (full, full))),
            ("serving", lambda a: resize_2d(a, (full, full), mode="bilinear", align_corners=True)),
            ("banded ", lambda a: resize_2d_banded(a, (full, full))),
            ("gather ", lambda a: resize_2d_gather(a, (full, full))),
        ):
            t = timeit(fn, x128)
            print(f"  head resize {fuse}->{full} C=128 {name}     {t*1e3:8.2f} ms")

        xfull = jnp.asarray(rng.standard_normal((1, full, full, 128)), dt)
        k_mid = jnp.asarray(rng.standard_normal((3, 3, 128, 32)) * 0.05, dt)
        t = timeit(lambda a: conv3x3_shiftsum(a, k_mid), xfull)
        print(f"  head conv_mid shiftsum 128->32 @{full}²  {t*1e3:8.2f} ms")
        k_mid_direct = k_mid
        t = timeit(lambda a: conv2d(a, k_mid_direct, padding=1), xfull)
        print(f"  head conv_mid DIRECT 128->32 @{full}²    {t*1e3:8.2f} ms")

        x32 = jnp.asarray(rng.standard_normal((1, full, full, 32)), dt)
        k_proj = jnp.asarray(rng.standard_normal((32, 1)) * 0.05, dt)
        t = timeit(lambda a: jax.nn.relu(linear(a, k_proj, None)), x32)
        print(f"  head proj 32->1 + relu @{full}²          {t*1e3:8.2f} ms")

        # ---- fusion tail ops (the largest fusion block) ----
        xh = jnp.asarray(rng.standard_normal((1, half, half, 256)), dt)
        k256 = jnp.asarray(rng.standard_normal((3, 3, 256, 256)) * 0.03, dt)
        t = timeit(lambda a: conv2d(jax.nn.relu(a), k256, padding=1), xh)
        print(f"  fusion RCU conv 3x3 256->256 @{half}²    {t*1e3:8.2f} ms  (x2 per RCU, x2 RCUs/level)")
        for name, fn in (
            ("dense  ", lambda a: resize_2d_dense(a, (fuse, fuse))),
            ("serving", lambda a: resize_2d(a, (fuse, fuse), mode="bilinear", align_corners=True)),
            ("banded ", lambda a: resize_2d_banded(a, (fuse, fuse))),
            ("gather ", lambda a: resize_2d_gather(a, (fuse, fuse))),
        ):
            t = timeit(fn, xh)
            print(f"  fusion resize {half}->{fuse} C=256 {name}    {t*1e3:8.2f} ms")
        k1x1 = jnp.asarray(rng.standard_normal((256, 256)) * 0.03, dt)
        xf256 = jnp.asarray(rng.standard_normal((1, fuse, fuse, 256)), dt)
        t = timeit(lambda a: linear(a, k1x1, None), xf256)
        print(f"  fusion out 1x1 256->256 @{fuse}²         {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
