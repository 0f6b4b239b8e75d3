"""Batched single-chip serving entry (bench.py --batch / batch_sweep.py):
`inference_rgb_device` on a (B, H, W, 3) stack must equal B independent
single-frame calls through the same fused prep+forward program.

The reference has no batched entry (its apps run frame-at-a-time,
run_video.py:336-350); batching is this framework's throughput extension, so
the contract is pinned here rather than in a parity_* file."""

import numpy as np
import jax.numpy as jnp

from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt


def test_batched_inference_matches_single():
    m = make_depthanythingv2_dpt(
        features_per_token=64,
        num_heads=2,
        num_blocks=4,
        reassembly_features_list=(16, 24, 32, 40),
        base_patch_grid_hw=(37, 37),
        fusion_channels=16,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    frames = [
        np.ascontiguousarray(rng.integers(0, 256, (120, 160, 3), np.uint8))
        for _ in range(3)
    ]
    hw = m.compute_scaled_hw(frames[0].shape[:2], 140, True)

    singles = [np.asarray(m.inference_rgb_device(jnp.asarray(f), hw))[0] for f in frames]
    batched = np.asarray(
        m.inference_rgb_device(jnp.asarray(np.stack(frames + [frames[0]])), hw)
    )

    assert batched.shape == (4, *singles[0].shape)
    # duplicate frames inside one batch: same program, same data — bit-equal
    np.testing.assert_array_equal(batched[0], batched[3])
    for i, s in enumerate(singles):
        # vs the single-frame program: XLA picks different reduction tilings
        # per batch shape and the random-weight neck chaotically amplifies the
        # ~1e-7 encoder-level reordering noise to ~1e-3 (the documented
        # fixture effect, docs/performance.md "Knobs"); any actual cross-frame
        # leakage (e.g. a batch-axis reduction bug) would be orders larger
        np.testing.assert_allclose(batched[i], s, rtol=5e-3, atol=5e-3)


def _assert_batched_matches_single(m, max_side):
    """Shared contract: a (B, H, W, 3) stack through inference_rgb_device
    equals B single-frame calls (duplicate rows bit-equal; vs-single within
    the documented reduction-retiling tolerance)."""
    rng = np.random.default_rng(1)
    frames = [
        np.ascontiguousarray(rng.integers(0, 256, (120, 160, 3), np.uint8))
        for _ in range(2)
    ]
    hw = m.compute_scaled_hw(frames[0].shape[:2], max_side, True)
    singles = [np.asarray(m.inference_rgb_device(jnp.asarray(f), hw))[0] for f in frames]
    batched = np.asarray(
        m.inference_rgb_device(jnp.asarray(np.stack(frames + [frames[0]])), hw)
    )
    assert batched.shape == (3, *singles[0].shape)
    np.testing.assert_array_equal(batched[0], batched[2])
    for i, s in enumerate(singles):
        np.testing.assert_allclose(batched[i], s, rtol=5e-3, atol=5e-3)


def test_batched_inference_beit():
    """BEiT through the batched entry: the per-grid relpos bias aux must
    broadcast over the batch axis, not interact with it (beit.py additive
    bias is (heads, N, N); any batch mixing would blow the dup-row check)."""
    from muggled_dpt_tpu.make_beit_dpt import make_beit_dpt

    m = make_beit_dpt(64, 4, 8, (8, 16, 32, 64), (6, 6), 16, dtype=jnp.float32)
    _assert_batched_matches_single(m, 96)


def test_batched_inference_swinv2():
    """SwinV2 through the batched entry: windows are carved per-image
    ((B, H, W, C) -> (B*nW, win, C) in swinv2.py), so shifted-window masks
    must stay image-local across the batch."""
    from muggled_dpt_tpu.make_swinv2_dpt import make_swinv2_dpt

    m = make_swinv2_dpt(
        (16, 32, 64, 128), (2, 4, 4, 8), (2, 2, 2, 2), (16, 16), (4, 4), (None,) * 4, 16
    )
    _assert_batched_matches_single(m, 64)
