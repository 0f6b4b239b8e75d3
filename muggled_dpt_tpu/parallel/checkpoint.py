"""Sharded training checkpoint / resume (orbax-backed).

The reference's checkpoint system is load-only — state-dict conversion with
no saving and no resume anywhere (SURVEY.md §5 "Checkpoint/resume" row). The
fine-tuning extension (parallel/train.py) gets the full TPU-native story
here: the (params, opt_state) pytree is saved WITH its jax.sharding layout
preserved (each chip writes its own shards through orbax/TensorStore — no
host gather), and restore places shards directly onto the target mesh. The
target mesh does not have to match the source: restoring onto a different
(data, model) factorization re-shards on read, which is the elastic-resume
path for growing/shrinking a slice between runs.

Layout: <ckpt_dir>/step_<N>/ orbax directories plus nothing else; the step
number is the single source of truth, parsed back by latest_step()."""

from __future__ import annotations

import os
import os.path as osp
import re
import shutil

_STEP_RE = re.compile(r"^step_(\d+)$")


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def _step_dir(ckpt_dir: str, step: int) -> str:
    return osp.join(osp.abspath(ckpt_dir), f"step_{step}")


def list_steps(ckpt_dir: str) -> list[int]:
    """Saved step numbers in ascending order ([] if the dir doesn't exist)."""
    if not osp.isdir(ckpt_dir):
        return []
    steps = []
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        if m and osp.isdir(osp.join(ckpt_dir, name)):
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_step(ckpt_dir: str) -> int | None:
    steps = list_steps(ckpt_dir)
    return steps[-1] if steps else None


def save_train_state(ckpt_dir: str, step: int, params, opt_state, keep: int = 3) -> str:
    """Write <ckpt_dir>/step_<step> (atomic: orbax renames into place only
    after a complete write, so a crash mid-save never corrupts the latest
    checkpoint). Prunes to the newest `keep` steps. Returns the path."""
    path = _step_dir(ckpt_dir, step)
    os.makedirs(osp.abspath(ckpt_dir), exist_ok=True)
    ckptr = _ckptr()
    ckptr.save(path, {"params": params, "opt_state": opt_state}, force=True)
    ckptr.wait_until_finished()
    if keep is not None:
        for old in list_steps(ckpt_dir)[:-keep]:
            shutil.rmtree(_step_dir(ckpt_dir, old), ignore_errors=True)
    return path


def restore_train_state(ckpt_dir: str, params_template, opt_state_template, step: int | None = None):
    """Restore (params, opt_state, step). The templates are pytrees of
    (possibly sharded) arrays — normally the freshly initialized train state,
    which is how plain JAX communicates the desired dtypes/shapes/shardings;
    restored leaves land directly with the templates' shardings (re-sharding
    across a different mesh happens in the read). step=None -> latest."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir!r}")
    templates = {"params": params_template, "opt_state": opt_state_template}
    restored = _ckptr().restore(_step_dir(ckpt_dir, step), templates)

    # Orbax restores every leaf COMMITTED to its template's sharding. Leaves
    # whose template was uncommitted/single-device (e.g. optax's scalar step
    # count from optimizer.init) would come back pinned to one device, and
    # jit refuses mixing a device-0-committed scalar with mesh-sharded
    # params — so replicate those over the templates' mesh explicitly.
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = next(
        (l.sharding.mesh for l in jax.tree_util.tree_leaves(templates) if isinstance(getattr(l, "sharding", None), NamedSharding)),
        None,
    )
    if mesh is not None:
        replicated = NamedSharding(mesh, PartitionSpec())

        def place(leaf, template):
            if isinstance(getattr(template, "sharding", None), NamedSharding):
                return leaf
            return jax.device_put(leaf, replicated)

        restored = jax.tree_util.tree_map(place, restored, templates)
    return restored["params"], restored["opt_state"], step
