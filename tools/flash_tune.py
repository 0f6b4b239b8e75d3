"""Online-flash (N > 2048) block-size sweep on the real TPU.

The large-resolution serving ratios (1036²/1428²/1904² at 1.47x/1.22x/1.17x
vs the reference GPU) are bounded by the online-softmax kernel, which until
round 3 ran fixed (block_q=512, block_k=1024). This sweeps block shapes at
the token counts those image sizes produce and prints a table; the winner
per regime feeds the block-size heuristic in ops/pallas/flash_attention.py.

Run: python tools/flash_tune.py [n ...]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from muggled_dpt_tpu.ops.pallas.flash_attention import _flash_bhnd_prescaled  # noqa: E402
from tools.chain_timer import timeit_chain as _timeit_chain  # noqa: E402


def timeit_chain(fn, x, reps=4, target_s=0.3):
    """Adaptive in-graph chain-slope timing; see tools/chain_timer.py for the
    tunnel-floor rationale (shared with headpack_probe / int8_mxu_probe)."""
    return _timeit_chain(fn, x, reps=reps, target_s=target_s, probe=lambda y: y[0, 0, 0])


def main():
    args = sys.argv[1:]
    with_int8 = "--int8" in args
    # --staged-only: skip the xla/online/plain-one-pass sections (already
    # measured across rounds 4b/4f) and run just the fused-qkv anchor + the
    # staged experiment grid — keeps a staged sweep inside a short TPU window
    staged_only = "--staged-only" in args
    with_staged = "--staged" in args or staged_only
    # --xl: the round-5 XL-variant grid (experiments/flash_attention_xl.py):
    # fused-qkv anchor + cross-chain pipelining / qp pairing / the no-softmax
    # ablation that prices the VPU bill for the roofline verdict
    xl_only = "--xl" in args
    ns = [int(a) for a in args if not a.startswith("--")] or (
        [10405, 18497] if xl_only else [5477, 10405, 18497]
    )
    h, d = 16, 64  # ViT-L heads; BH=16 per batch-1 frame
    rng = np.random.default_rng(0)
    for n in ns:
        q = jnp.asarray(rng.standard_normal((h, n, d)), jnp.bfloat16)

        def make_fn(bq, bk, one_pass=None):
            def fn(x):
                o = _flash_bhnd_prescaled(x, x, x, None, block_q=bq, block_k=bk, one_pass=one_pass)
                return (o + x * jnp.bfloat16(1e-6)).astype(x.dtype)
            return fn

        def xla_fn(x):
            o = jax.nn.dot_product_attention(
                x.transpose(1, 0, 2)[None], x.transpose(1, 0, 2)[None], x.transpose(1, 0, 2)[None]
            )[0].transpose(1, 0, 2)
            return (o + x * jnp.bfloat16(1e-6)).astype(x.dtype)

        print(f"\nN={n} (BH={h}, D={d}):")
        if xl_only:
            # anchor (the production q-blocked fused-qkv kernel) + variants
            from muggled_dpt_tpu.ops.pallas.flash_attention import flash_attention_fused_qkv
            from experiments.flash_attention_xl import flash_attention_fused_qkv_xl

            qkv = jnp.asarray(rng.standard_normal((1, n, 3 * h * d)), jnp.bfloat16)

            def make_xl_fn(call):
                def fn(x):
                    o = call(x)
                    return (x + jnp.pad(o, ((0, 0), (0, 0), (0, 2 * h * d))) * jnp.bfloat16(1e-6)).astype(x.dtype)
                return fn

            cases = [
                ("anchor (production fused-qkv)", lambda x: flash_attention_fused_qkv(x, h)),
                ("xl qp=1 seq (anchor-equiv)", lambda x: flash_attention_fused_qkv_xl(x, h, qp=1, pipelined=False)),
                ("xl qp=1 pipelined", lambda x: flash_attention_fused_qkv_xl(x, h, qp=1, pipelined=True)),
                ("xl qp=2 pipelined", lambda x: flash_attention_fused_qkv_xl(x, h, qp=2, pipelined=True)),
                ("xl qp=2 seq", lambda x: flash_attention_fused_qkv_xl(x, h, qp=2, pipelined=False)),
                ("xl qp=4 pipelined bq=128", lambda x: flash_attention_fused_qkv_xl(x, h, qp=4, block_q=128, pipelined=True)),
                ("xl hpp=4 pipelined", lambda x: flash_attention_fused_qkv_xl(x, h, hpp=4, pipelined=True)),
                ("xl ABLATION no-softmax", lambda x: flash_attention_fused_qkv_xl(x, h, ablate_softmax=True)),
                ("xl ABLATION no-sm qp=2 pl", lambda x: flash_attention_fused_qkv_xl(x, h, qp=2, pipelined=True, ablate_softmax=True)),
            ]
            for label, call in cases:
                try:
                    t = timeit_chain(make_xl_fn(call), qkv)
                    print(f"  {label:32s} {t*1e3:8.2f} ms")
                except Exception as e:  # noqa: BLE001
                    print(f"  {label:32s} failed: {type(e).__name__}: {str(e)[:100]}")
            continue
        if not staged_only:
            try:
                t = timeit_chain(xla_fn, q)
                print(f"  xla dot_product_attention          {t*1e3:8.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"  xla dpa failed: {type(e).__name__}")
            for bq, bk in ((None, None), (1024, 1024), (2048, 1024), (4096, 1024)):
                try:
                    t = timeit_chain(make_fn(bq, bk, one_pass=False), q)
                    print(f"  online bq={str(bq):<5} bk={str(bk):<5}      {t*1e3:8.2f} ms")
                except Exception as e:  # noqa: BLE001
                    print(f"  online bq={str(bq):<5} bk={str(bk):<5}      failed: {type(e).__name__}")
        if with_int8:
            # experimental int8-QK^T kernels (each includes its XLA-side
            # quantization cost — the honest e2e comparison). The online
            # variant's 64-wide int8 refs fail Mosaic lowering (kept to
            # record that); the round-4c fused-slab one-pass variant is the
            # real candidate.
            from experiments.flash_attention_int8 import (
                flash_attention_int8_qk,
                flash_attention_int8_qk_fused,
            )

            def make_i8_fn(bq, bk):
                def fn(x):
                    o = flash_attention_int8_qk(x, x, x, block_q=bq, block_k=bk)
                    return (o + x * jnp.bfloat16(1e-6)).astype(x.dtype)
                return fn

            for bq, bk in ((2048, 1024),):
                try:
                    t = timeit_chain(make_i8_fn(bq, bk), q)
                    print(f"  int8-qk online bq={str(bq):<5} bk={str(bk):<5}  {t*1e3:8.2f} ms")
                except Exception as e:  # noqa: BLE001
                    print(f"  int8-qk online bq={str(bq):<5} bk={str(bk):<5}  failed: {type(e).__name__}")

            qkv_i8 = jnp.asarray(rng.standard_normal((1, n, 3 * h * d)), jnp.bfloat16)

            def make_i8_fused_fn(fbq):
                def fn(x):
                    o = flash_attention_int8_qk_fused(x, h, block_q=fbq)
                    return (x + jnp.pad(o, ((0, 0), (0, 0), (0, 2 * h * d))) * jnp.bfloat16(1e-6)).astype(x.dtype)
                return fn

            for fbq in (None, 256, 512, 1024):
                try:
                    t = timeit_chain(make_i8_fused_fn(fbq), qkv_i8)
                    print(f"  int8-qk fused 1pass bq={str(fbq):<5} {t*1e3:8.2f} ms")
                except Exception as e:  # noqa: BLE001
                    print(f"  int8-qk fused 1pass bq={str(fbq):<5} failed: {type(e).__name__}: {str(e)[:120]}")
        # one-pass cutover probe: the whole-K kernel is VMEM-feasible far past
        # the 2048 serving cutoff once block_q shrinks (the f32 logit tile is
        # block_q x N_pad; k/v blocks stay cached across q-programs). The
        # round-3d mask-row optimization removed most of its per-call VPU
        # penalty, so probe it at EVERY N — if it keeps beating the online
        # kernel, the serving cutover moves.
        if not staged_only:
            for bq in (None, 256, 512, 1024):
                try:
                    t = timeit_chain(make_fn(bq, None, one_pass=True), q)
                    print(f"  one-pass bq={str(bq):<5}           {t*1e3:8.2f} ms")
                except Exception as e:  # noqa: BLE001
                    print(f"  one-pass bq={str(bq):<5}           failed: {type(e).__name__}")
        # fused-qkv one-pass (the actual DA serving path): reads the
        # head-major qkv projection output directly, hpp heads/program;
        # q-blocked automatically past the whole-N VMEM ceiling (round-4c),
        # so probe it at every N, plus forced q-block sizes
        from muggled_dpt_tpu.ops.pallas.flash_attention import flash_attention_fused_qkv

        qkv = jnp.asarray(rng.standard_normal((1, n, 3 * h * d)), jnp.bfloat16)

        def make_fused_fn(fbq):
            def fn(x):
                o = flash_attention_fused_qkv(x, h, block_q=fbq)
                return (x + jnp.pad(o, ((0, 0), (0, 0), (0, 2 * h * d))) * jnp.bfloat16(1e-6)).astype(x.dtype)
            return fn

        fused_bqs = (None,) if staged_only else (None, 256, 512, 1024)
        for fbq in fused_bqs:
            try:
                t = timeit_chain(make_fused_fn(fbq), qkv)
                print(f"  fused-qkv one-pass bq={str(fbq):<5}   {t*1e3:8.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"  fused-qkv one-pass bq={str(fbq):<5}   failed: {type(e).__name__}: {str(e)[:120]}")

        if with_staged:
            # staged (k-panel) + hpp-override experiment
            # (experiments/flash_attention_staged.py): (hpp=2, panels=1) is
            # the production kernel's structure through the experiment
            # wrapper — the sanity anchor the variants are judged against
            from experiments.flash_attention_staged import flash_attention_fused_qkv_staged

            def make_staged_fn(hpp, panels):
                def fn(x):
                    o = flash_attention_fused_qkv_staged(x, h, hpp=hpp, panels=panels)
                    return (x + jnp.pad(o, ((0, 0), (0, 0), (0, 2 * h * d))) * jnp.bfloat16(1e-6)).astype(x.dtype)
                return fn

            for hpp, panels in ((2, 1), (2, 2), (2, 4), (2, 8), (4, 1), (4, 2), (4, 4), (8, 1), (8, 2)):
                try:
                    t = timeit_chain(make_staged_fn(hpp, panels), qkv)
                    print(f"  staged hpp={hpp} panels={panels}          {t*1e3:8.2f} ms")
                except Exception as e:  # noqa: BLE001
                    print(f"  staged hpp={hpp} panels={panels}          failed: {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
