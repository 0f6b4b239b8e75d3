#!/usr/bin/env python3
"""Measure the int8 serving tiers on TRAINED (non-random) weights.

Every int8 error number in docs/performance.md is measured on random-init
models, where the builder's own analysis shows the end-to-end abs-rel is
dominated by chaotic amplification of random-weight logits/necks rather than
recipe error. Real checkpoints are unavailable in this image (zero egress),
but the repo has a trained-weights path: this tool overfits a mid-size DA-V2
on the synthetic scene (tools/finetune_demo.py machinery, SSI objective)
until the loss has dropped >=10x, then quantizes THAT model with every tier —
default / include_qkv / calibrated / include_neck — and records depth abs-rel
vs the same model's own bf16 forward on held-out frames. This is the first
non-random-weight datapoint for the tier (round-3 VERDICT "what's weak" #4).

CPU mesh is fine (no TPU needed):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/int8_trained_weights.py --steps 240
"""

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from finetune_demo import synthetic_scene  # noqa: E402  (tools/ sibling)


def _strip_stale_fused(params):
    """Drop the bf16 fused reassembly precompute from a TRAINED pytree: the
    f32 training forward reads only the dense resample/fuse kernels, so the
    fused copies are stale after training (zero grads + weight decay).
    DPTModel.__init__ recomputes them from the trained dense kernels
    (dpt.py:_with_fused_reassembly)."""
    stages = [{k: v for k, v in p.items() if k != "fused"} for p in params["reassemble"]]
    return {**params, "reassemble": stages}


def main():
    ap = argparse.ArgumentParser(description="int8 tiers on trained weights")
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--train_size", type=int, default=112, help="square training input (multiple of 28)")
    ap.add_argument("--eval_size", type=int, default=224, help="held-out eval input")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from muggled_dpt_tpu.dpt import DPTModel
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt
    from muggled_dpt_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from muggled_dpt_tpu.parallel.train import make_train_step

    # The tpu_sanity mid-scale gate config (tools/tpu_sanity.py:108): F256 L12,
    # real DA base grid 37 — big enough that attention/MLP quantization error
    # has somewhere to accumulate, small enough to train on a CPU mesh.
    model = make_depthanythingv2_dpt(
        256, 4, 12, (32, 64, 128, 256), (37, 37), 64, dtype=jnp.float32, seed=args.seed
    )

    mesh = make_mesh()
    dp = mesh.shape["data"]
    hw = (args.train_size, args.train_size)
    rng = np.random.default_rng(args.seed)
    images, targets = synthetic_scene(rng, dp, hw)
    print(f"mesh={dict(mesh.shape)}  batch={dp}  train_input={hw}")

    fwd = model.spec["forward"]
    optimizer = optax.adamw(args.lr)
    params = shard_params(jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), model.params), mesh)
    opt_state = optimizer.init(params)
    sh_images, sh_targets = shard_batch((jnp.asarray(images), jnp.asarray(targets)), mesh)

    step = jax.jit(make_train_step(lambda p, x, aux: fwd(p, x, aux), optimizer))
    t0 = time.perf_counter()
    first = last = None
    with mesh:
        for i in range(args.steps):
            params, opt_state, loss = step(params, opt_state, sh_images, sh_targets)
            if i == 0:
                first = float(loss)
            if i % max(1, args.steps // 8) == 0 or i == args.steps - 1:
                print(f"step {i:3d}  ssi_loss {float(loss):.5f}")
        last = float(loss)
    drop = first / max(last, 1e-12)
    print(f"trained {args.steps} steps in {time.perf_counter() - t0:.0f}s: loss {first:.5f} -> {last:.5f} ({drop:.1f}x)")
    if drop < 10.0:
        print("WARNING: <10x loss drop — weights may not be 'trained enough' for this measurement")

    trained = _strip_stale_fused(jax.tree_util.tree_map(np.asarray, params))
    m32 = DPTModel(trained, model.config, model.spec, dtype=jnp.float32)
    m16 = m32.to(jnp.bfloat16)

    # Held-out frames (different seed than training): uint8 BGR like a real
    # caller, through the full inference() preprocessing path.
    ev_rng = np.random.default_rng(args.seed + 1)
    ev_images, _ = synthetic_scene(ev_rng, 3, (args.eval_size, args.eval_size))
    frames = [(np.clip(im, 0, 1) * 255).astype(np.uint8)[:, :, ::-1] for im in ev_images]

    def depth(m, frame):
        return np.asarray(m.inference(frame, max_side_length=args.eval_size), np.float32)

    d16 = [depth(m16, f) for f in frames]
    d32 = [depth(m32, f) for f in frames]

    def absrel(preds, refs):
        return float(
            np.mean([np.abs(p - r).mean() / (np.abs(r).mean() + 1e-12) for p, r in zip(preds, refs)])
        )

    cal_frames = frames[:2]
    variants = {
        "int8 default": m16.quantize_encoder_int8(),
        "int8 include_qkv": m16.quantize_encoder_int8(include_qkv=True),
        "int8 calibrated include_qkv": m16.quantize_encoder_int8(
            include_qkv=True, calibration_images=cal_frames, max_side_length=args.eval_size
        ),
        "int8 include_neck": m16.quantize_encoder_int8(include_neck=True),
    }
    tiers = {"bf16 vs f32 (context)": absrel(d16, d32)}
    tiers.update({name: absrel([depth(m, f) for f in frames], d16) for name, m in variants.items()})

    print(f"\nDepth abs-rel vs the model's own bf16, {len(frames)} held-out frames @ {args.eval_size}²:")
    for name, v in tiers.items():
        print(f"  {name:34s} {v:.2e}")
    print(
        json.dumps(
            {
                "metric": "trained_weights_int8_absrel_vs_bf16",
                "loss_drop": round(drop, 1),
                "tiers": {k: float(f"{v:.3e}") for k, v in tiers.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
