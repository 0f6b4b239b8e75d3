#!/usr/bin/env python3
"""Device-compile + execute probe for the hpp=4 XL dispatch window bounds.

The hpp=4 Mosaic failure at n_pad 18560 is DEVICE-compile-time: jax.export
TPU lowering passes (verified — tests/test_tpu_lowering.py can pin lowering
but not the device compiler's VMEM allocation), so the window ceiling
HPP4_MAX_NPAD must be proven on the chip. This compiles and executes the
production fused-qkv kernel at the window bounds + the serving sizes around
them and prints OK / the compiler error per n.

Run: python tools/hpp4_probe.py [n ...]   (default: bounds + neighbors)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from muggled_dpt_tpu.demo_helpers.misc import enable_compilation_cache
    from muggled_dpt_tpu.ops.pallas import flash_attention as fa
    from muggled_dpt_tpu.ops.pallas.flash_attention import (
        HPP4_MAX_NPAD,
        HPP4_MIN_NPAD,
        _heads_per_program,
        _hpp4_upgrade,
        flash_attention_fused_qkv,
    )

    enable_compilation_cache()
    argv = sys.argv[1:]
    if argv and argv[0] == "--max-npad":
        # ceiling exploration: lift the window so _hpp4_upgrade fires above
        # the production HPP4_MAX_NPAD (probing candidates for a raise)
        fa.HPP4_MAX_NPAD = int(argv[1])
        argv = argv[2:]
        print(f"  (window ceiling lifted to {fa.HPP4_MAX_NPAD} for this probe)", flush=True)
    ns = [int(a) for a in argv] or [
        HPP4_MIN_NPAD,      # window floor
        10405,              # 1428^2 — the measured win point
        11264,              # mid-window
        HPP4_MAX_NPAD,      # ceiling — the bound the tests assume compiles
    ]
    h, d = 16, 64
    rng = np.random.default_rng(0)
    for n in ns:
        n_pad = (n + 127) // 128 * 128
        hpp = 4 if _hpp4_upgrade(n_pad, h, d, _heads_per_program(h, d)) else _heads_per_program(h, d)
        qkv = jnp.asarray(rng.standard_normal((1, n, 3 * h * d)), jnp.bfloat16)
        t0 = time.monotonic()
        try:
            out = flash_attention_fused_qkv(qkv, h)
            probe = float(np.asarray(out[0, 0, 0]))  # forces device execution
            dt = time.monotonic() - t0
            assert np.isfinite(probe)
            print(f"  n={n:<6d} n_pad={n_pad:<6d} hpp={hpp}  OK  ({dt:.1f}s compile+run)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  n={n:<6d} n_pad={n_pad:<6d} hpp={hpp}  FAIL: {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
