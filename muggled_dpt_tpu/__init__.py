"""muggled_dpt_tpu — TPU-native (JAX/XLA/Pallas) DPT monocular depth framework.

A ground-up rebuild of the capabilities of heyoeyo/muggled_dpt for TPU:
MiDaS v3.1 BEiT & SwinV2, Depth-Anything V1 & V2 (incl. metric + ViT-Giant),
loading the original .pt/.pth checkpoints unchanged."""

import os as _os

# Some PJRT plugin environments override the JAX_PLATFORMS env var during
# plugin registration (e.g. rewriting it to "axon,cpu" at jax import, so a
# JAX_PLATFORMS=cpu subprocess still grabs the exclusive TPU). Restore stock
# JAX semantics: the env var wins whenever the registered config disagrees.
# Only effective before backend initialization, i.e. when muggled_dpt_tpu is
# imported before any jax computation — true for all apps/tools in this repo.
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from .dpt import DPTModel
from .make_dpt import make_dpt_from_state_dict
from .make_depthanythingv1_dpt import (
    make_depthanythingv1_dpt,
    make_depthanythingv1_dpt_from_original_state_dict,
)
from .make_depthanythingv2_dpt import (
    make_depthanythingv2_dpt,
    make_depthanythingv2_dpt_from_original_state_dict,
)

__all__ = [
    "DPTModel",
    "make_dpt_from_state_dict",
    "make_depthanythingv1_dpt",
    "make_depthanythingv1_dpt_from_original_state_dict",
    "make_depthanythingv2_dpt",
    "make_depthanythingv2_dpt_from_original_state_dict",
]

__version__ = "0.1.0"
