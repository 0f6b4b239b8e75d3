"""muggled_dpt_tpu — TPU-native (JAX/XLA/Pallas) DPT monocular depth framework.

A ground-up rebuild of the capabilities of heyoeyo/muggled_dpt for TPU:
MiDaS v3.1 BEiT & SwinV2, Depth-Anything V1 & V2 (incl. metric + ViT-Giant),
loading the original .pt/.pth checkpoints unchanged."""

import os as _os

# Some PJRT plugin environments register a TPU platform in jax.config during
# plugin import, so a JAX_PLATFORMS=cpu subprocess still grabs the exclusive
# TPU device. Re-assert the env var — but ONLY for the cpu-isolation case
# (env requests exactly "cpu" and the config disagrees): that is the known
# plugin-override failure, and narrowing avoids clobbering a caller's own
# explicit jax.config.update("jax_platforms", ...), which stock JAX lets win
# over the env var. Escape hatch: set MUGGLED_DPT_TPU_NO_PLATFORM_FIX=1.
# Only effective before backend initialization, i.e. when muggled_dpt_tpu is
# imported before any jax computation — true for all apps/tools in this repo.
if (
    _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"
    and not _os.environ.get("MUGGLED_DPT_TPU_NO_PLATFORM_FIX")
):
    import jax as _jax

    try:
        if _jax.config.jax_platforms != "cpu":
            _jax.config.update("jax_platforms", "cpu")
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
