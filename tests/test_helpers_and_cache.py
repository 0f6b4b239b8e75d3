"""Demo-helper functions, conversion cache, and observability utilities."""

import numpy as np
import pytest
import torch

from muggled_dpt_tpu.checkpoints.random_init import random_original_depth_anything_state_dict
from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

TINY = {
    "features_per_token": 64,
    "num_blocks": 4,
    "reassembly_features_list": [8, 16, 32, 64],
    "fusion_channels": 16,
    "patch_size_px": 14,
    "base_patch_grid_hw": (8, 8),
}


def test_postprocess_functions():
    from muggled_dpt_tpu.demo_helpers.postprocess import (
        convert_to_uint8,
        histogram_equalization,
        normalize_01,
        remove_infinities,
        scale_prediction,
    )

    d = np.array([[1.0, 2.0], [np.inf, -np.inf]], np.float32)
    clean = remove_infinities(d)
    assert np.isfinite(clean).all() and clean.max() == 2.0 and clean.min() == 1.0

    n = normalize_01(np.array([[1.0, 3.0]], np.float32))
    np.testing.assert_allclose(n, [[0.0, 1.0]])
    assert normalize_01(np.zeros((2, 2))).max() == 0.0

    u8 = convert_to_uint8(np.array([[0.0, 0.5, 1.0]]))
    np.testing.assert_array_equal(u8, [[0, 127, 255]])

    img = np.tile(np.arange(256, dtype=np.uint8), (4, 1))
    eq = histogram_equalization(img)
    assert eq.shape == img.shape and eq.dtype == np.uint8
    assert eq.min() <= 5 and eq.max() >= 250  # roughly full range

    scaled = scale_prediction(np.ones((10, 12), np.float32), (24, 20))
    assert scaled.shape == (20, 24)


def test_plane_fit_recovers_plane():
    from muggled_dpt_tpu.demo_helpers.plane_fit import estimate_plane_of_best_fit

    h, w = 64, 80
    xg, yg = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    depth = 0.003 * xg - 0.002 * yg + 0.5
    plane = estimate_plane_of_best_fit(depth, rng=np.random.default_rng(0))
    # fitted plane should match the synthetic plane closely
    assert np.abs(plane - depth).mean() < 1e-3


def test_history_keeper_roundtrip(tmp_path):
    from muggled_dpt_tpu.demo_helpers.history_keeper import HistoryKeeper

    hk = HistoryKeeper(str(tmp_path))
    hk.store(model_path=str(tmp_path / "nonexistent.pt"), value=42)
    hk2 = HistoryKeeper(str(tmp_path))
    has, v = hk2.read("value")
    assert has and v == 42
    has, _ = hk2.read("model_path")  # *_path keys must exist on disk
    assert not has


def test_conversion_cache_roundtrip(tmp_path):
    sd = random_original_depth_anything_state_dict(TINY, seed=8)
    path = str(tmp_path / "depth_anything_v2_tiny.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    cfg1, model1 = make_dpt_from_state_dict(path, conversion_cache=True)
    from muggled_dpt_tpu.checkpoints.cache import cache_path_for
    import os.path as osp

    assert osp.exists(cache_path_for(path))

    cfg2, model2 = make_dpt_from_state_dict(path, conversion_cache=True)
    x = np.random.default_rng(0).standard_normal((1, 3, 56, 56)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(model1.forward(x)), np.asarray(model2.forward(x)), rtol=1e-6, atol=1e-6)


def test_beit_bias_budget_math():
    from muggled_dpt_tpu.models.beit import calculate_bias_bytes

    # documented example: BEiT-L-512 @512^2 -> 24 layers x 16 x 1025^2 x 4 B
    per_layer = calculate_bias_bytes(1, 16, (32, 32))
    assert per_layer == 16 * 1025 * 1025 * 4
    assert calculate_bias_bytes(24, 16, (32, 32)) == 24 * per_layer


def test_step_timer_and_memory_report():
    from muggled_dpt_tpu.utils.observability import StepTimer, device_memory_report, trace_span

    t = StepTimer(smoothing=0.0)
    t.tick()
    import time

    time.sleep(0.01)
    t.tick()
    assert t.ms > 5
    assert isinstance(device_memory_report(), dict)
    with trace_span("test-span"):
        pass


def test_assert_finite_guard():
    from muggled_dpt_tpu.utils.observability import assert_finite

    assert_finite({"a": np.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="bad/a"):
        assert_finite({"a": np.array([1.0, np.inf])}, "bad")


def test_prepare_image_bgr_nhwc_matches_bchw_path():
    """prepare_image_bgr_nhwc is the same preprocessing as prepare_image_bgr
    minus the BCHW transpose (the BatchParallelRunner batching entry)."""
    import jax.numpy as jnp

    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

    m = make_depthanythingv2_dpt(64, 1, 4, (8, 16, 32, 64), (8, 8), 16, dtype=jnp.float32)
    img = np.random.default_rng(0).integers(0, 256, (120, 160, 3), np.uint8)
    bchw = np.asarray(m.prepare_image_bgr(img, 112))
    nhwc = np.asarray(m.prepare_image_bgr_nhwc(img, 112))
    assert nhwc.shape == (1, 112, 112, 3)
    np.testing.assert_array_equal(nhwc, bchw.transpose(0, 2, 3, 1))


def test_backend_watchdog_passive_and_transparent(capsys):
    """run_with_backend_watchdog passes through results/exceptions, prints the
    unreachable-backend hint only when the wrapped call overruns its timeout,
    and select_device never touches the backend eagerly (an early-exiting app
    run must not leave an initialized exclusive-access TPU client behind)."""
    import inspect
    import time

    from muggled_dpt_tpu.demo_helpers import misc

    # transparent pass-through, no warning for a fast call
    assert misc.run_with_backend_watchdog(lambda: 41 + 1, timeout_s=5.0) == 42
    assert "unreachable" not in capsys.readouterr().out

    # exceptions propagate and still disarm the watchdog
    with pytest.raises(RuntimeError, match="boom"):
        misc.run_with_backend_watchdog(lambda: (_ for _ in ()).throw(RuntimeError("boom")).close(), timeout_s=5.0)
    assert "unreachable" not in capsys.readouterr().out

    # a call that blocks past the timeout triggers the hint
    def _slow():
        time.sleep(0.25)
        return "done"

    assert misc.run_with_backend_watchdog(_slow, timeout_s=0.05) == "done"
    assert "unreachable" in capsys.readouterr().out

    # select_device is config-only: no thread spawn, no jax.devices() call
    src = inspect.getsource(misc.select_device)
    assert "jax.devices" not in src and "Thread" not in src


def test_aux_budget_negative_cached_and_cumulative(capsys):
    """An over-budget grid prints the cache-disabled warning ONCE (the
    decision is negative-cached, not re-evaluated per frame), and the
    stats-unavailable budget fallback counts resident params + cached grids
    instead of judging each new grid against the flat limit alone."""
    import jax.numpy as jnp

    from muggled_dpt_tpu.dpt import _fits_hbm_budget
    from muggled_dpt_tpu.make_beit_dpt import make_beit_dpt

    m = make_beit_dpt(64, 2, 4, (8, 16, 32, 64), (8, 8), 16, dtype=jnp.float32)
    m.spec = {**m.spec, "aux_bytes_estimate": lambda cfg, grid: 1 << 62}  # always over budget
    assert m._get_aux((8, 8)) is None
    first = capsys.readouterr().out
    assert "Caching disabled" in first
    assert m._get_aux((8, 8)) is None  # served from the negative cache
    assert "Caching disabled" not in capsys.readouterr().out

    # fallback budget: the same request passes with nothing resident but
    # fails once resident bytes approach the 8 GB assumption
    assert _fits_hbm_budget(1 << 30, resident_bytes=0)
    assert not _fits_hbm_budget(1 << 30, resident_bytes=8 * 1024**3)


def test_to_upcast_notice_and_scale_keys(capsys):
    """.to() prints the bf16-rounded-weights notice only when upcasting, and
    the f32-exempt scale-key predicate matches exactly the int8 leaf names."""
    import jax.numpy as jnp

    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt
    from muggled_dpt_tpu.ops.quant import is_scale_key

    m = make_depthanythingv2_dpt(64, 1, 4, (8, 16, 32, 64), (8, 8), 16, dtype=jnp.float32)
    m16 = m.to(jnp.bfloat16)  # downcast: silent
    assert "upcasts" not in capsys.readouterr().out
    m16.to(jnp.float32)  # upcast: notice
    assert "upcasts" in capsys.readouterr().out

    for key in ("qkv_kernel_scale", "proj_kernel_scale", "kernel_scale",
                "w9_kernel9_scale", "qkv_act_smooth", "t00_scale", "t22_scale"):
        assert is_scale_key(key), key
    for key in ("norm1_scale", "logit_scale", "t0_scale", "tap_scale", "scale"):
        assert not is_scale_key(key), key


def test_int8_calibration_refuses_empty_stats(monkeypatch):
    """If the eager capture forwards record nothing (e.g. the capture path ran
    traced), calibration must raise instead of silently shipping an
    uncalibrated int8 model."""
    import jax.numpy as jnp

    from muggled_dpt_tpu import ops
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

    m = make_depthanythingv2_dpt(64, 2, 4, (8, 16, 32, 64), (8, 8), 16, dtype=jnp.float32)
    monkeypatch.setattr(ops.quant, "_record_activation", lambda name, x: None)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (60, 80, 3), np.uint8)]
    with pytest.raises(RuntimeError, match="no activation stats"):
        m.quantize_encoder_int8(include_qkv=True, calibration_images=frames)


def test_aux_cache_lru_eviction(monkeypatch):
    """When a new grid doesn't fit the HBM budget, the cache evicts the
    least-recently-used grid instead of refusing to cache the new one — a
    session cycling sizes keeps its hot grid fast and the resident estimate
    stays bounded. (The reference cache is grow-only,
    v31_beit/image_encoder_model.py:95-119; the TPU build does better.)"""
    import jax.numpy as jnp

    from muggled_dpt_tpu import dpt as dpt_mod
    from muggled_dpt_tpu.make_beit_dpt import make_beit_dpt

    m = make_beit_dpt(64, 2, 4, (8, 16, 32, 64), (8, 8), 16, dtype=jnp.float32)
    assert m.spec.get("aux_bytes_estimate") is not None

    def _positives():
        return [k for k, v in m._aux_cache.items() if v is not None]

    # budget stub that RESPECTS resident_bytes (the params-only precheck
    # depends on it): _tree_bytes counts 1 per positive cached grid and 0
    # for params, so "fits" means fewer than two positive grids resident
    def fake_tree_bytes(tree):
        if isinstance(tree, dict) and any(isinstance(k, tuple) for k in tree):
            return sum(1 for v in tree.values() if v is not None)
        return 0  # params

    monkeypatch.setattr(dpt_mod, "_tree_bytes", fake_tree_bytes)
    monkeypatch.setattr(
        dpt_mod,
        "_fits_hbm_budget",
        # the empty-cache precheck credits the cache back via reclaimable_bytes
        lambda needed, resident_bytes=0, reclaimable_bytes=0: resident_bytes - reclaimable_bytes < 2,
    )

    a, b, c = (8, 8), (9, 9), (10, 10)
    aux_a = m._get_aux(a)
    assert aux_a is not None
    assert m._get_aux(b) is not None
    assert _positives() == [a, b]
    # recency bump: touching A makes B the LRU
    assert m._get_aux(a) is aux_a
    # third grid: B (least recently used) is evicted, A stays hot
    assert m._get_aux(c) is not None
    assert _positives() == [a, c]
    assert len(m._aux_cache) == 2  # bounded, no stale entries

    # oversized-grid case: a grid that cannot fit beside the params even with
    # an EMPTY cache is negative-cached WITHOUT evicting anything — draining
    # the hot grids for a grid that can never be cached would only force the
    # next frame at the hot size to recompute its full bias stack
    monkeypatch.setattr(
        dpt_mod, "_fits_hbm_budget", lambda needed, resident_bytes=0, reclaimable_bytes=0: False
    )
    assert m._get_aux((11, 11)) is None
    assert _positives() == [a, c]  # hot grids untouched
    assert m._aux_cache[(11, 11)] is None

    # stats shifting between the precheck and the loop: the precheck passes
    # (reclaimable credit) but the loop never fits — the loop must drain and
    # break (no StopIteration), then cache on the precheck's verdict
    monkeypatch.setattr(
        dpt_mod,
        "_fits_hbm_budget",
        lambda needed, resident_bytes=0, reclaimable_bytes=0: reclaimable_bytes > 0,
    )
    assert m._get_aux((12, 12)) is not None
    assert _positives() == [(12, 12)]  # previous hot grids drained, no crash


def test_fits_hbm_budget_stats_path_credits_reclaimable(monkeypatch):
    """On stats-capable backends bytes_in_use already contains the cached
    grids, so the empty-cache precheck must credit reclaimable bytes back —
    otherwise it equals the eviction-loop predicate and eviction can never
    fire (each new over-budget grid would be permanently negative-cached
    while stale grids hold the memory)."""
    import jax

    from muggled_dpt_tpu.dpt import _fits_hbm_budget

    class FakeDev:
        def memory_stats(self):
            # 10 GB limit, 9 GB in use (of which 4 GB is evictable cache)
            return {"bytes_limit": 10 * 1024**3, "bytes_in_use": 9 * 1024**3}

    monkeypatch.setattr(jax, "local_devices", lambda: [FakeDev()])
    gb = 1024**3
    # fits-now check (loop): 1 GB free * 0.5 headroom -> 2 GB does NOT fit
    assert not _fits_hbm_budget(2 * gb, resident_bytes=9 * gb)
    # empty-cache precheck: crediting the 4 GB evictable cache -> it fits,
    # so the caller evicts instead of negative-caching
    assert _fits_hbm_budget(2 * gb, resident_bytes=9 * gb, reclaimable_bytes=4 * gb)
    # fallback path (no stats): resident minus reclaimable is what counts
    monkeypatch.setattr(FakeDev, "memory_stats", lambda self: None)
    assert not _fits_hbm_budget(2 * gb, resident_bytes=7 * gb)
    assert _fits_hbm_budget(2 * gb, resident_bytes=7 * gb, reclaimable_bytes=4 * gb)
