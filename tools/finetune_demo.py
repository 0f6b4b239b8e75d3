#!/usr/bin/env python3
"""Multi-step fine-tuning demo: overfit a DPT model to synthetic depth targets
with the scale-shift-invariant objective, dp x tp sharded over a device mesh.

The reference ships no training code (SURVEY.md §4); `parallel/train.py` is
the TPU-native extension and this tool is its runnable proof: the SSI loss
must drop by an order of magnitude within a few dozen steps when overfitting
a fixed batch, with gradients flowing through the full patch-embed ->
encoder -> reassembly -> fusion -> head stack.

No hardware needed:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/finetune_demo.py --steps 30
Loading a real checkpoint instead of the random tiny model:
  python tools/finetune_demo.py -m depth_anything_v2_vits.pth --size 238
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def synthetic_scene(rng, batch, hw):
    """(images, inverse-depth targets): a slanted 'floor' plane plus a few
    raised rectangles whose image brightness correlates with their depth —
    a learnable image->depth mapping, not pure noise."""
    h, w = hw
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    images = np.zeros((batch, h, w, 3), np.float32)
    targets = np.zeros((batch, h, w), np.float32)
    for b in range(batch):
        depth = 0.2 + 0.5 * yy  # floor ramp (near at the bottom)
        img = np.stack([0.3 + 0.4 * yy] * 3, axis=-1)
        for _ in range(3):  # raised boxes
            y0, x0 = rng.integers(0, h // 2), rng.integers(0, w // 2)
            bh, bw = rng.integers(h // 6, h // 3), rng.integers(w // 6, w // 3)
            lift = rng.uniform(0.2, 0.4)
            depth[y0 : y0 + bh, x0 : x0 + bw] += lift
            img[y0 : y0 + bh, x0 : x0 + bw] = 0.25 + lift + rng.uniform(-0.05, 0.05, 3)
        images[b] = img + rng.normal(0, 0.01, (h, w, 3))
        targets[b] = depth
    return images, targets


def main():
    ap = argparse.ArgumentParser(description="Overfit a DPT model to synthetic depth (training-path demo)")
    ap.add_argument("-m", "--model_path", default=None, help="Optional real checkpoint (default: tiny random DA-V2)")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=None, help="Default: one per data-mesh slot")
    ap.add_argument("--size", type=int, default=56, help="Square input side (multiple of the model tile)")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt_dir", default=None, help="Save/resume sharded train state here (parallel/checkpoint.py)")
    ap.add_argument("--save_every", type=int, default=10, help="Checkpoint cadence in steps (with --ckpt_dir)")
    ap.add_argument("--resume", action="store_true", help="Resume from the latest step in --ckpt_dir")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from muggled_dpt_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from muggled_dpt_tpu.parallel.train import make_train_step

    if args.model_path:
        from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

        _, model = make_dpt_from_state_dict(args.model_path, dtype=jnp.float32)
    else:
        from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

        model = make_depthanythingv2_dpt(
            features_per_token=64, num_heads=2, num_blocks=4,
            reassembly_features_list=[8, 16, 32, 64], base_patch_grid_hw=(8, 8),
            fusion_channels=16, patch_size_px=14, dtype=jnp.float32, seed=args.seed,
        )

    mesh = make_mesh()
    dp = mesh.shape["data"]
    batch = args.batch or dp
    assert batch % dp == 0, f"batch {batch} must divide over data={dp}"
    hw = (args.size, args.size)
    assert args.size % model.tiling_size == 0, f"--size must be a multiple of {model.tiling_size}"

    rng = np.random.default_rng(args.seed)
    images, targets = synthetic_scene(rng, batch, hw)
    print(f"mesh={dict(mesh.shape)}  batch={batch}  input={hw}  params=f32")

    fwd = model.spec["forward"]
    optimizer = optax.adamw(args.lr)
    params = shard_params(jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), model.params), mesh)
    opt_state = optimizer.init(params)
    images, targets = shard_batch((jnp.asarray(images), jnp.asarray(targets)), mesh)

    start = 0
    if args.ckpt_dir:
        from muggled_dpt_tpu.parallel.checkpoint import restore_train_state, save_train_state
    if args.ckpt_dir and args.resume:
        params, opt_state, start = restore_train_state(args.ckpt_dir, params, opt_state)
        print(f"resumed from {args.ckpt_dir} step {start}")
        if start >= args.steps:
            print(f"nothing to do: checkpoint step {start} >= --steps {args.steps}")
            return 0

    step = jax.jit(make_train_step(lambda p, x, aux: fwd(p, x, aux), optimizer))
    losses = []
    with mesh:
        for i in range(start, args.steps):
            params, opt_state, loss = step(params, opt_state, images, targets)
            losses.append(float(loss))
            if i % max(1, args.steps // 10) == 0 or i == args.steps - 1:
                print(f"step {i:3d}  ssi_loss {losses[-1]:.5f}")
            if args.ckpt_dir and (i + 1) % args.save_every == 0:
                save_train_state(args.ckpt_dir, i + 1, params, opt_state)
                print(f"saved step {i + 1} -> {args.ckpt_dir}")

    # final validation readout: the standard monocular-depth eval protocol
    # (SSI-aligned, matching the relative-depth output convention)
    from muggled_dpt_tpu.utils.metrics import depth_metrics

    with mesh:
        pred = fwd(params, images)
        m = {k: float(v) for k, v in depth_metrics(pred, targets).items()}
    print("eval:", "  ".join(f"{k}={v:.4f}" for k, v in m.items()))

    drop = losses[-1] / max(losses[0], 1e-12)
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f}  ({drop:.3f}x of start)")
    if start:
        # resumed segment: the big early-loss drop happened before the
        # checkpoint, so gate only on continued improvement
        ok = losses[-1] <= losses[0]
        print("RESUMED OK" if ok else "LOSS REGRESSED AFTER RESUME")
    else:
        ok = losses[-1] < 0.5 * losses[0]
        print("CONVERGED" if ok else "DID NOT CONVERGE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
