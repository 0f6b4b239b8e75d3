"""Fine-tuning / multi-chip training step.

The reference ships no training code (SURVEY.md §4); this module provides the
TPU-native extension: a scale-and-shift-invariant depth loss (the standard
MiDaS-style SSI objective matching the models' relative-depth output
convention) and an optax training step that runs dp x tp sharded over a
jax.sharding.Mesh."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .mesh import make_mesh, place_aux, shard_batch, shard_params


def ssi_loss(pred_bhw, target_bhw, mask_bhw=None, eps=1e-6):
    """Scale-shift-invariant MSE: per-image least-squares align (scale, shift)
    of the prediction to the target, then mean squared residual. The alignment
    itself lives in utils/metrics.py (shared with the eval protocol)."""
    from ..utils.metrics import align_scale_shift

    b = pred_bhw.shape[0]
    aligned = align_scale_shift(pred_bhw, target_bhw, mask_bhw, eps).reshape(b, -1)
    t = target_bhw.reshape(b, -1).astype(jnp.float32)
    m = jnp.ones_like(t) if mask_bhw is None else mask_bhw.reshape(b, -1).astype(jnp.float32)
    n = jnp.sum(m, axis=1) + eps
    return jnp.mean(jnp.sum(m * (aligned - t) ** 2, axis=1) / n)


def make_train_step(forward_fn, optimizer):
    """Build a jittable (params, opt_state, images, targets[, aux]) -> step.

    forward_fn: (params, images_nhwc, aux) -> pred_bhw. `aux` threads the
    facade's grid-keyed cache (BEiT relpos bias stack, SwinV2 CPB tables)
    into the differentiated forward: without it, every sharded fine-tune
    step regenerates the bias tables in-graph (the enable_cache=False cost,
    ~2x encoder work at BEiT-L grids). Aux is non-differentiated data, not
    a trained parameter — it is passed outside the grad closure. Place it
    with mesh.place_aux for tensor-parallel runs."""

    def loss_fn(params, images_nhwc, targets_bhw, aux):
        pred = forward_fn(params, images_nhwc, aux)
        return ssi_loss(pred, targets_bhw)

    def train_step(params, opt_state, images_nhwc, targets_bhw, aux=None):
        loss, grads = jax.value_and_grad(loss_fn)(params, images_nhwc, targets_bhw, aux)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def sharded_train_demo(model, mesh=None, batch: int = 2, image_hw=(56, 56), lr: float = 1e-4):
    """Run ONE dp x tp sharded training step on tiny shapes. Returns the loss.

    Used by __graft_entry__.dryrun_multichip to validate that the multi-chip
    shardings compile and execute (on virtual CPU devices or a real slice)."""
    mesh = mesh or make_mesh()
    fwd = model.spec["forward"]
    optimizer = optax.adamw(lr)

    params = shard_params(jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), model.params), mesh)
    opt_state = optimizer.init(params)

    import numpy as np

    rng = np.random.default_rng(0)
    images = rng.standard_normal((batch, image_hw[0], image_hw[1], 3)).astype(np.float32)
    targets = rng.uniform(0.1, 1.0, (batch, image_hw[0], image_hw[1])).astype(np.float32)
    images, targets = shard_batch((images, targets), mesh)

    # grid-cached aux (BEiT relpos bias / SwinV2 CPB) rides along sharded —
    # None for families without one (DINOv2)
    p = model.patch_size_px
    aux = place_aux(model._get_aux((image_hw[0] // p, image_hw[1] // p)), mesh)

    step = jax.jit(make_train_step(lambda p, x, aux: fwd(p, x, aux), optimizer))
    with mesh:
        params, opt_state, loss = step(params, opt_state, images, targets, aux)
        loss = float(loss)
    return loss
