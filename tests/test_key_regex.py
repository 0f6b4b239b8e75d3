"""Public key_regex helper parity: the documented examples from the
reference's module (v2_depthanything/state_dict_conversion/key_regex.py)
must hold, plus this implementation's documented extensions."""

import pytest

from muggled_dpt_tpu.checkpoints.convert_common import max_index
from muggled_dpt_tpu.checkpoints.key_regex import (
    find_match_by_lut,
    get_nth_integer,
    get_suffix_terms,
    has_prefix,
    replace_prefix,
)


def test_has_prefix_hash_matches_any_number():
    # reference key_regex.py:41-57 documented behavior
    for n in (0, 1, 2, 17, 104):
        assert has_prefix(f"layer.{n}.block.x", "layer.#.block")
    assert has_prefix("layer.0.block", "layer.0.block")
    assert not has_prefix("layer.x.block", "layer.#.block")
    assert not has_prefix("prefix.layer.0.block", "layer.#.block")
    # '.' must be literal, not a regex wildcard
    assert not has_prefix("layerX0Xblock", "layer.#.block")


def test_replace_prefix_plain_and_hash():
    # plain prefixes work (the reference raises NotImplementedError here)
    assert replace_prefix("head.conv.weight", "head", "neck") == "neck.conv.weight"
    # '#' in the old prefix matches digits and they can be dropped...
    assert replace_prefix("blocks.3.attn.qkv", "blocks.#.", "") == "attn.qkv"
    # ...or re-inserted in order via '#' in the new prefix
    out = replace_prefix("layers.2.blocks.5.norm", "layers.#.blocks.#", "stage#.block#")
    assert out == "stage2.block5.norm"
    # non-matching keys pass through unchanged
    assert replace_prefix("other.key", "blocks.#.", "x.") == "other.key"
    with pytest.raises(ValueError):
        replace_prefix("a.1.b", "a.#", "x.#.#")


def test_get_nth_integer():
    # reference key_regex.py:87-98 documented example
    ex = "abc.5.xyz.2.aa.bb[0]"
    assert get_nth_integer(ex, 0) == 5
    assert get_nth_integer(ex, 1) == 2
    assert get_nth_integer(ex, 2) == 0
    assert get_nth_integer(ex, -1) == 0  # extension: from the right
    with pytest.raises(IndexError):
        get_nth_integer(ex, 3)
    with pytest.raises(IndexError):
        get_nth_integer("no numbers here")


def test_find_match_by_lut():
    # reference key_regex.py:116-135 documented examples
    lut = {"hello": "goodbye", "conv.1.bias": "offset.1", "conv.2.bias": "offset.3"}
    assert find_match_by_lut("hello world", lut) == "goodbye"
    assert find_match_by_lut("model.layer.1.value.key.conv.1.bias", lut) == "offset.1"
    assert find_match_by_lut("model.layer.1.value.key.attn", lut) is None


def test_get_suffix_terms():
    # reference key_regex.py:148-161 documented examples
    ex = "layer.0.block.1.fc1.weight"
    assert get_suffix_terms(ex, 3) == "1.fc1.weight"
    assert get_suffix_terms(ex, -2) == "block.1.fc1.weight"
    assert get_suffix_terms(ex) == "weight"


def test_max_index_uses_prefix_scoping():
    sd = {
        "pretrained.blocks.0.w": 0,
        "pretrained.blocks.11.w": 0,
        "pretrained.blocks.3.w": 0,
        "other.blocks.99.w": 0,
        "pretrained.blocksX.5.w": 0,
    }
    assert max_index(sd, "pretrained.blocks") == 11
    assert max_index(sd, "missing.prefix") == -1
