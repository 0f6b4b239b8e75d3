"""utils/metrics.py: SSI-aligned monocular-depth evaluation metrics."""

import numpy as np
import jax.numpy as jnp

from muggled_dpt_tpu.utils.metrics import align_scale_shift, depth_metrics


def _rand(shape, seed=0, lo=0.2, hi=1.0):
    return np.random.default_rng(seed).uniform(lo, hi, shape).astype(np.float32)


def test_perfect_up_to_scale_shift():
    t = _rand((2, 16, 16))
    p = 4.0 * t - 0.3  # alignment must recover this exactly
    m = depth_metrics(jnp.asarray(p), jnp.asarray(t))
    assert float(m["abs_rel"]) < 1e-5
    assert float(m["rmse"]) < 1e-5
    assert float(m["delta1"]) == 1.0


def test_unaligned_metrics_match_numpy():
    rng = np.random.default_rng(3)
    t = _rand((3, 8, 8), seed=1)
    p = t * (1 + 0.1 * rng.standard_normal(t.shape).astype(np.float32))
    p = np.clip(p, 1e-3, None)
    m = depth_metrics(jnp.asarray(p), jnp.asarray(t), align=False)

    pf, tf = p.reshape(3, -1), t.reshape(3, -1)
    abs_rel = (np.abs(pf - tf) / tf).mean(axis=1).mean()
    rmse = np.sqrt(((pf - tf) ** 2).mean(axis=1)).mean()
    ratio = np.maximum(pf / tf, tf / pf)
    delta1 = (ratio < 1.25).mean(axis=1).mean()
    np.testing.assert_allclose(float(m["abs_rel"]), abs_rel, rtol=1e-4)
    np.testing.assert_allclose(float(m["rmse"]), rmse, rtol=1e-4)
    np.testing.assert_allclose(float(m["delta1"]), delta1, rtol=1e-4)


def test_mask_excludes_corrupted_region():
    t = _rand((1, 12, 12))
    p = t.copy()
    p[:, :4, :] = 50.0  # corrupt a band
    mask = np.ones_like(t)
    mask[:, :4, :] = 0.0
    m = depth_metrics(jnp.asarray(p), jnp.asarray(t), jnp.asarray(mask), align=False)
    assert float(m["abs_rel"]) < 1e-6
    assert float(m["delta1"]) == 1.0
    m_unmasked = depth_metrics(jnp.asarray(p), jnp.asarray(t), align=False)
    assert float(m_unmasked["abs_rel"]) > 1.0


def test_align_flag_matters_for_metric_models():
    t = _rand((2, 8, 8))
    p = 2.0 * t  # wrong absolute scale
    aligned = depth_metrics(jnp.asarray(p), jnp.asarray(t), align=True)
    metric = depth_metrics(jnp.asarray(p), jnp.asarray(t), align=False)
    assert float(aligned["abs_rel"]) < 1e-5
    assert float(metric["abs_rel"]) > 0.5  # 2x off everywhere


def test_align_scale_shift_recovers_parameters():
    t = _rand((2, 10, 10), seed=7)
    p = 0.5 * t + 0.2
    a = np.asarray(align_scale_shift(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(a, t, rtol=1e-4, atol=1e-5)


def test_jittable_and_batched():
    import jax

    f = jax.jit(lambda p, t: depth_metrics(p, t))
    t = jnp.asarray(_rand((4, 8, 8), seed=9))
    p = t * 1.5
    m = f(p, t)
    assert set(m) == {"abs_rel", "rmse", "rmse_log", "delta1", "delta2", "delta3"}
    assert all(np.isfinite(float(v)) for v in m.values())
