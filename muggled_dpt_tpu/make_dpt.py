"""Auto-loading entry point: build any supported DPT model from an original
checkpoint file, sniffing the model family from state-dict keys.

API-compatible with the reference (make_dpt.py:21-144): returns
(config_dict, DPTModel); supports the metric-filename hack and lazy per-family
imports."""

from __future__ import annotations

import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp

from .checkpoints.pt_loader import load_state_dict

KNOWN_MODEL_TYPES = ("swinv2", "beit", "depthanythingv1", "depthanythingv2")


def make_dpt_from_state_dict(
    path_to_state_dict: str,
    enable_cache: bool = True,
    enable_optimizations: bool = True,
    strict_load: bool = True,
    model_type: str | None = None,
    dtype=jnp.float32,
    conversion_cache: bool = False,
    unroll_blocks: bool | int = False,
):
    """Load an original .pt/.pth checkpoint (unchanged, as downloaded) and
    build the matching DPT model. Returns (config_dict, model).

    conversion_cache=True persists/reuses the converted parameter pytree
    beside the checkpoint (<name>.dpt_cache.npz) for fast reloads of multi-GB
    models; the cache is invalidated when the source file changes.

    unroll_blocks=True switches the DINOv2 encoders (Depth-Anything V1/V2)
    to the fixed-shape serving mode (~12% faster encoder, ~7x longer compile
    per input shape); an int k >= 2 requests the partial lax.scan(unroll=k)
    middle ground instead (tools/scan_unroll_curve.py charts the trade).
    Ignored by the BEiT/SwinV2 families."""
    if conversion_cache:
        from .checkpoints.cache import load_converted

        cached = load_converted(path_to_state_dict)
        if cached is not None:
            config_dict, params = cached
            cached_type = config_dict.pop("_model_type", None)
            if cached_type in KNOWN_MODEL_TYPES:
                config_dict["enable_cache"] = enable_cache
                config_dict["enable_optimizations"] = enable_optimizations
                if unroll_blocks:
                    config_dict["unroll_blocks"] = unroll_blocks
                model = _build_from_converted(cached_type, config_dict, params, dtype)
                return config_dict, model

    state_dict = load_state_dict(path_to_state_dict)

    if model_type is None:
        model_type = determine_model_type_from_state_dict(path_to_state_dict, state_dict)
    if model_type not in KNOWN_MODEL_TYPES:
        print("Accepted model types:", *KNOWN_MODEL_TYPES, sep="\n")
        raise NotImplementedError(f"Bad model type: {model_type}, no support for this yet!")

    # Metric-model hack (reference make_dpt.py:53-66): metric DA-V2 weights are
    # indistinguishable from relative ones; flag from the filename.
    if model_type == "depthanythingv2" and "metric" in path_to_state_dict:
        state_dict["is_metric"] = np.zeros((), dtype=np.float32)
        print(
            "",
            "Warning: Metric Depth-Anything V2 model detected!",
            "  These models are not officially supported,",
            "  model outputs may be incorrect...",
            sep="\n",
            flush=True,
        )

    make_fn = import_model_functions(model_type)
    config_dict, model = make_fn(state_dict, enable_cache, enable_optimizations, strict_load, dtype=dtype)
    if unroll_blocks:
        # rebuild the spec with the serving-mode flag (spec construction is
        # cheap; the params pytree is reused as-is)
        config_dict = dict(config_dict, unroll_blocks=unroll_blocks)
        model = _build_from_converted(model_type, config_dict, model.params, dtype)

    if conversion_cache:
        from .checkpoints.cache import save_converted

        params_np = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), model.params)
        save_converted(path_to_state_dict, dict(config_dict, _model_type=model_type), params_np)

    return config_dict, model


def _build_from_converted(model_type: str, config_dict: dict, params, dtype):
    """Assemble a DPTModel from an already-converted parameter pytree."""
    from .dpt import DPTModel

    if model_type == "depthanythingv2":
        from .models.depth_anything import make_family_spec

        spec = make_family_spec(config_dict, version=2)
    elif model_type == "depthanythingv1":
        from .models.depth_anything import make_family_spec

        spec = make_family_spec(config_dict, version=1)
    elif model_type == "beit":
        from .models.beit_family import make_family_spec

        spec = make_family_spec(config_dict)
    else:
        from .models.swinv2_family import make_family_spec

        spec = make_family_spec(config_dict)
    return DPTModel(params, config_dict, spec, dtype=dtype)


def determine_model_type_from_state_dict(model_path: str, state_dict: dict) -> str:
    """Key-sniffing family detection (reference make_dpt.py:78-116)."""
    keys = state_dict.keys()
    if "pretrained.model.layers.0.blocks.0.attn.logit_scale" in keys:
        return "swinv2"
    if "pretrained.model.blocks.0.attn.relative_position_bias_table" in keys:
        return "beit"
    if "pretrained.blocks.0.ls1.gamma" in keys:
        model_name = osp.basename(model_path).lower()
        is_v2 = "v2" in model_name
        is_v1 = (not is_v2) and (("anything_vit" in model_name) or ("v1" in model_name))
        if (not is_v1) and (not is_v2):
            print(
                "",
                "WARNING: Unable to determine DepthAnything model version!",
                "-> Will assume v2",
                "-> Will use v1 if the file name contains 'v1'",
                sep="\n",
            )
        return "depthanythingv1" if is_v1 else "depthanythingv2"
    return "unknown"


def import_model_functions(model_type: str):
    """Lazy per-family import (reference make_dpt.py:122-144)."""
    if model_type == "swinv2":
        from .make_swinv2_dpt import make_swinv2_dpt_from_midas_v31_state_dict as make_fn
    elif model_type == "beit":
        from .make_beit_dpt import make_beit_dpt_from_midas_v31_state_dict as make_fn
    elif model_type == "depthanythingv1":
        from .make_depthanythingv1_dpt import make_depthanythingv1_dpt_from_original_state_dict as make_fn
    elif model_type == "depthanythingv2":
        from .make_depthanythingv2_dpt import make_depthanythingv2_dpt_from_original_state_dict as make_fn
    else:
        raise TypeError(f"Cannot import model functions, Unknown model type: {model_type}")
    return make_fn
