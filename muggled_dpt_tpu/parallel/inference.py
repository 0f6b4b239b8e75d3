"""Multi-chip batched inference (SURVEY.md §5 'distributed' row: the
TPU-idiomatic extension — data parallelism over frames/batch for
run_video-style throughput; pure ICI collectives, no host round-trips)."""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh, place_aux, shard_params


class BatchParallelRunner:
    """Shards frame batches over the mesh's data axis (and optionally the
    model over the model axis) and runs the family forward as one pjit'd
    program per batch shape.

    The facade's grid-keyed aux cache flows through: BEiT's relpos bias stack
    and SwinV2's CPB stacks are computed once per grid on the host model and
    fed to the sharded program — without this, every sharded forward would
    regenerate the bias tables in-graph (the enable_cache=False cost). Aux
    head axes are sharded over the `model` axis, aligned with the Megatron
    head-major qkv column split, so the cache's HBM cost divides across the
    tensor-parallel group.

    Frames must share one size (use DPTModel.compute_scaled_hw + the model's
    prepare path, or feed raw frames of equal size)."""

    def __init__(self, model, mesh=None, shard_model: bool = True):
        self.model = model
        self.mesh = mesh or make_mesh()
        params = jax.tree_util.tree_map(jnp.asarray, model.params)
        self._tp = shard_model and self.mesh.shape.get("model", 1) > 1
        if self._tp:
            self.params = shard_params(params, self.mesh)
        else:
            self.params = jax.device_put(
                params, NamedSharding(self.mesh, P())
            )
        fwd = model.spec["forward"]
        self._aux_placed: dict = {}
        self._fwd = jax.jit(
            lambda p, x, aux: fwd(p, x, aux),
            in_shardings=(None, NamedSharding(self.mesh, P("data")), None),
            out_shardings=NamedSharding(self.mesh, P("data")),
        )

    @property
    def data_parallelism(self) -> int:
        return self.mesh.shape["data"]

    def _get_aux(self, grid_hw):
        """Fetch the host model's per-grid aux and place it on the mesh
        (mesh.place_aux: head axes sharded over `model` when tensor-parallel,
        everything replicated over `data`)."""
        grid_hw = tuple(int(g) for g in grid_hw)
        if grid_hw in self._aux_placed:
            return self._aux_placed[grid_hw]
        aux = place_aux(self.model._get_aux(grid_hw), self.mesh, tp_shard=self._tp)
        self._aux_placed[grid_hw] = aux
        return aux

    def __call__(self, images_nhwc) -> jax.Array:
        """images_nhwc: (B, H, W, 3), B divisible by the data axis.
        Returns (B, H', W') inverse depth."""
        x = jnp.asarray(images_nhwc, self.params_dtype())
        b = x.shape[0]
        dp = self.data_parallelism
        assert b % dp == 0, f"batch {b} must be divisible by data parallelism {dp}"
        p = self.model.patch_size_px
        aux = self._get_aux((x.shape[1] // p, x.shape[2] // p))
        with self.mesh:
            return self._fwd(self.params, x, aux)

    def clear_cache(self):
        self._aux_placed.clear()
        self.model.clear_cache()

    def params_dtype(self):
        return jax.tree_util.tree_leaves(self.params)[0].dtype
