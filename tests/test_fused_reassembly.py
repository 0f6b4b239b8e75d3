"""Phase-decomposed fused reassembly (conv-transpose + 3x3 fuse pair).

The bf16 serving path collapses each x4/x2 reassembly stage's
`conv_transpose_blocky` + 3x3 SAME fuse conv (reference
reassembly_model.py:244-270, :135) into per-output-phase matmuls at input
resolution (ops/nn.py:fuse_transpose_conv3x3_weights). These tests pin the
fused op to the dense pair exactly (f32) and check the model-level wiring:
fused weights exist only on bf16 models and change nothing but summation
order.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from muggled_dpt_tpu.ops.nn import (
    conv2d,
    conv_transpose_blocky,
    conv_transpose_fuse_phase,
    fuse_transpose_conv3x3_weights,
)


def _dense_pair(x, kt, rb, fk):
    up = conv_transpose_blocky(x, kt, rb)
    return conv2d(up, fk, None, stride=1, padding=1)


@pytest.mark.parametrize("s", [2, 4])
@pytest.mark.parametrize("hw", [(5, 7), (3, 3)])
def test_fused_matches_dense_pair_f32(s, hw):
    rng = np.random.default_rng(11 + s)
    h, w = hw
    ci, cr, co = 12, 10, 6
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((s, s, ci, cr)) * 0.3, jnp.float32)
    rb = jnp.asarray(rng.standard_normal(cr), jnp.float32)
    fk = jnp.asarray(rng.standard_normal((3, 3, cr, co)) * 0.3, jnp.float32)

    ref = _dense_pair(x, kt, rb, fk)
    fused = fuse_transpose_conv3x3_weights(kt, rb, fk)
    got = conv_transpose_fuse_phase(x, fused, s)
    assert got.shape == (2, s * h, s * w, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_bias_border_truncation_exact():
    """The resample bias rides through the fuse conv's zero padding — border
    pixels must see the truncated tap sum, not the interior constant."""
    s, ci, cr, co = 4, 3, 5, 2
    rng = np.random.default_rng(0)
    x = jnp.zeros((1, 3, 4, ci), jnp.float32)  # zero input isolates the bias path
    kt = jnp.asarray(rng.standard_normal((s, s, ci, cr)), jnp.float32)
    rb = jnp.asarray(rng.standard_normal(cr), jnp.float32)
    fk = jnp.asarray(rng.standard_normal((3, 3, cr, co)), jnp.float32)
    ref = _dense_pair(x, kt, rb, fk)
    got = conv_transpose_fuse_phase(x, fuse_transpose_conv3x3_weights(kt, rb, fk), s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)
    # sanity: the border really is different from the interior
    interior = np.asarray(ref)[0, 5, 5]
    corner = np.asarray(ref)[0, 0, 0]
    assert not np.allclose(interior, corner)


def _tiny_da(dtype):
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

    return make_depthanythingv2_dpt(64, 2, 4, (8, 16, 32, 64), (8, 8), 16, dtype=dtype)


def test_bf16_model_carries_fused_weights_f32_does_not():
    m32 = _tiny_da(jnp.float32)
    m16 = _tiny_da(jnp.bfloat16)
    assert "fused" not in m32.params["reassemble"][0]
    for i, scale in enumerate((4, 2, 1, 0.5)):
        stage = m16.params["reassemble"][i]
        assert ("fused" in stage) == (scale in (2, 4)), (i, scale)
    # fused weights live in the compute dtype like the rest of the pytree
    t = m16.params["reassemble"][0]["fused"]["t11"]
    assert t.dtype == jnp.bfloat16
    # and survive the to() / quantize copies without recompute surprises
    assert "fused" in m16.to(jnp.bfloat16).params["reassemble"][0]


def test_bf16_fused_output_matches_dense_path(monkeypatch):
    """End-to-end: the fused path only reassociates bf16 sums."""
    m16 = _tiny_da(jnp.bfloat16)
    img = np.random.default_rng(3).integers(0, 256, (90, 120, 3), dtype=np.uint8)
    fused_out = np.asarray(m16.inference(img), np.float32)

    import muggled_dpt_tpu.dpt as dpt_mod

    stripped = dict(m16.params)
    stripped["reassemble"] = [
        {k: v for k, v in p.items() if k != "fused"} for p in m16.params["reassemble"]
    ]
    monkeypatch.setattr(dpt_mod, "_with_fused_reassembly", lambda p: p)
    dense = dpt_mod.DPTModel(stripped, m16.config, m16.spec, dtype=jnp.bfloat16)
    assert "fused" not in dense.params["reassemble"][0]
    dense_out = np.asarray(dense.inference(img), np.float32)
    denom = np.maximum(np.abs(dense_out), 1e-3)
    assert np.max(np.abs(fused_out - dense_out) / denom) < 5e-2
