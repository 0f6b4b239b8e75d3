"""Device-mesh utilities for multi-chip execution.

The reference is strictly single-device (SURVEY.md §5: no distributed
execution of any kind). The TPU-native extension scales via jax.sharding:
a ("data", "model") mesh where the batch is sharded over `data` (frame-level
parallelism for run_video-style streaming) and the wide encoder matmuls are
sharded over `model` (tensor parallelism). XLA inserts the collectives; they
ride ICI on a real slice.

Why dp x tp are THE parallelism axes for this model class (and the others
deliberately are not):
* data: depth inference is embarrassingly frame-parallel; it is the
  throughput axis for serving and the batch axis for fine-tuning.
* model (Megatron column/row split): the only way to cut single-frame
  latency; ViT-L's 4096-wide MLP shards to 4 chips while staying MXU-sized
  (_spec_for_param caps model at 4 so >=4 heads / >=1024 hidden per shard).
* pipeline (pp): possible over the identical transformer blocks, but at
  ViT-L-depth scale the activations-per-microbatch are tiny; pp adds bubble
  latency without relieving any memory pressure — tp is strictly better on
  an ICI-connected slice for these model sizes (the whole ViT-G is 5 GB,
  a fraction of one chip's HBM).
* sequence (sp): token counts top out at ~18.5k (1904^2 / 14^2); activation
  memory is nowhere near the HBM ceiling, so sharding LN/elementwise over
  tokens would add all-gathers around every attention for no benefit.
* expert (ep): no DPT family has MoE layers; there is nothing to shard.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data_parallel: int | None = None) -> Mesh:
    """Build a (data, model) mesh over the first n_devices. The model axis
    gets the largest power-of-two factor up to 4 unless data_parallel pins it
    (4 heads-per-shard minimum keeps the tensor-parallel matmuls MXU-sized)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if data_parallel is None:
        model = 1
        while model * 2 <= min(4, n) and n % (model * 2) == 0:
            model *= 2
        data_parallel = n // model
    model = n // data_parallel
    arr = np.array(devices).reshape(data_parallel, model)
    return Mesh(arr, axis_names=("data", "model"))


def _spec_for_param(path: str, shape: tuple[int, ...]) -> P:
    """Megatron-style tensor-parallel placement for the transformer weights:
    column-parallel for qkv/fc1/w12 (shard output features), row-parallel for
    proj/fc2/w3 (shard input features). Everything else is replicated."""
    last = path.split("/")[-1]
    if last in ("qkv_kernel", "fc1_kernel", "w12_kernel") and len(shape) >= 2:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    if last in ("proj_kernel", "fc2_kernel", "w3_kernel") and len(shape) >= 2:
        return P(*([None] * (len(shape) - 2) + ["model", None]))
    return P()


def shard_params(params, mesh: Mesh):
    """device_put a parameter pytree with tensor-parallel shardings."""

    def place(path, leaf):
        pathstr = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        spec = _spec_for_param(pathstr, np.shape(leaf))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def place_aux(aux, mesh: Mesh, tp_shard: bool = True):
    """Place a per-grid aux pytree (BEiT relpos bias stack, SwinV2 CPB stacks)
    on the mesh: head axes (axis 1 of the (L|P, H, N, N) stacks) shard over
    `model` when tensor-parallel, aligned with the Megatron head-major qkv
    column split so the cache's HBM cost divides across the TP group;
    everything else is replicated."""
    if aux is None:
        return None
    tp = mesh.shape.get("model", 1)

    def place(a):
        spec = P()
        if tp_shard and tp > 1 and a.ndim == 4 and a.shape[1] % tp == 0:
            spec = P(None, "model", None, None)
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, aux)


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis over the data axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
    )
