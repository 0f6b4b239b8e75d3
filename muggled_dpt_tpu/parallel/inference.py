"""Multi-chip batched inference (SURVEY.md §5 'distributed' row: the
TPU-idiomatic extension — data parallelism over frames/batch for
run_video-style throughput; pure ICI collectives, no host round-trips)."""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh, shard_params


class BatchParallelRunner:
    """Shards frame batches over the mesh's data axis (and optionally the
    model over the model axis) and runs the family forward as one pjit'd
    program per batch shape.

    Frames must share one size (use DPTModel.compute_scaled_hw + the model's
    prepare path, or feed raw frames of equal size)."""

    def __init__(self, model, mesh=None, shard_model: bool = True):
        self.model = model
        self.mesh = mesh or make_mesh()
        params = jax.tree_util.tree_map(jnp.asarray, model.params)
        if shard_model and self.mesh.shape.get("model", 1) > 1:
            self.params = shard_params(params, self.mesh)
        else:
            self.params = jax.device_put(
                params, NamedSharding(self.mesh, P())
            )
        fwd = model.spec["forward"]
        self._fwd = jax.jit(
            lambda p, x: fwd(p, x),
            in_shardings=(None, NamedSharding(self.mesh, P("data"))),
            out_shardings=NamedSharding(self.mesh, P("data")),
        )

    @property
    def data_parallelism(self) -> int:
        return self.mesh.shape["data"]

    def __call__(self, images_nhwc) -> jax.Array:
        """images_nhwc: (B, H, W, 3), B divisible by the data axis.
        Returns (B, H', W') inverse depth."""
        x = jnp.asarray(images_nhwc, self.params_dtype())
        b = x.shape[0]
        dp = self.data_parallelism
        assert b % dp == 0, f"batch {b} must be divisible by data parallelism {dp}"
        with self.mesh:
            return self._fwd(self.params, x)

    def params_dtype(self):
        return jax.tree_util.tree_leaves(self.params)[0].dtype
