"""Multi-chip sharding on the 8-virtual-CPU-device mesh: dp x tp training
step, batch-parallel inference, and parity of sharded vs single-device
forwards."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt
from muggled_dpt_tpu.parallel.mesh import make_mesh, shard_params
from muggled_dpt_tpu.parallel.train import sharded_train_demo, ssi_loss
from muggled_dpt_tpu.parallel.inference import BatchParallelRunner


@pytest.fixture(scope="module")
def tiny_model():
    return make_depthanythingv2_dpt(64, 1, 4, (8, 16, 32, 64), (8, 8), 16, dtype=jnp.float32)


def test_mesh_factorization():
    assert jax.device_count() == 8
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 2, "model": 4}
    assert make_mesh(8, data_parallel=8).shape == {"data": 8, "model": 1}


def test_ssi_loss_invariance():
    rng = np.random.default_rng(0)
    t = rng.uniform(0.1, 1.0, (2, 16, 16)).astype(np.float32)
    # prediction that is a scale+shift of the target has ~zero loss
    p = 3.5 * t - 0.7
    assert float(ssi_loss(jnp.asarray(p), jnp.asarray(t))) < 1e-8
    assert float(ssi_loss(jnp.asarray(rng.standard_normal(t.shape)), jnp.asarray(t))) > 1e-4


def test_sharded_train_step(tiny_model):
    loss = sharded_train_demo(tiny_model, mesh=make_mesh(8), batch=4, image_hw=(56, 56))
    assert np.isfinite(loss)


def test_batch_parallel_inference_matches_single(tiny_model):
    mesh = make_mesh(8, data_parallel=4)
    runner = BatchParallelRunner(tiny_model, mesh=mesh)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 56, 56, 3)).astype(np.float32)
    sharded_out = np.asarray(runner(x))

    fwd = tiny_model.spec["forward"]
    single = np.asarray(jax.jit(fwd)(tiny_model.params, jnp.asarray(x)))
    np.testing.assert_allclose(sharded_out, single, rtol=2e-5, atol=2e-5)


def test_tensor_parallel_forward_matches_single(tiny_model):
    """tp-sharded params produce the same forward results (GSPMD inserts the
    collectives; numerics match up to reduction order)."""
    mesh = make_mesh(8)  # 2 x 4
    params = shard_params(tiny_model.params, mesh)
    fwd = tiny_model.spec["forward"]
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)
    with mesh:
        sharded = np.asarray(jax.jit(fwd)(params, x))
    single = np.asarray(jax.jit(fwd)(tiny_model.params, x))
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-4)
