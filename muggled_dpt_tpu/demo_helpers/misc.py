"""Device/dtype configuration and async-dispatch helpers (reference
demo_helpers/misc.py, re-imagined for JAX/TPU).

The reference's DeviceChecker polls a CUDA stream to gate async video
inference (misc.py:19-38); on TPU the analog is jax's async dispatch —
``jax.Array.is_ready()`` reports whether the last result has materialized
without blocking, enabling the same never-block video loop."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def run_with_backend_watchdog(fn, timeout_s: float = 60.0, what: str = "Backend init"):
    """Run ``fn()`` (a call expected to touch the accelerator for the first
    time) with a watchdog thread that prints an actionable hint if it blocks
    past ``timeout_s`` — e.g. a dropped TPU tunnel, where backend init hangs
    forever inside C code with no Python-level error. The watchdog is passive:
    it never initializes the backend itself, so a run that exits early (bad
    checkpoint path, Ctrl+C at a prompt) never leaves a half/fully-initialized
    exclusive-access TPU client behind."""
    import threading

    done = threading.Event()

    def _watchdog():
        if not done.wait(timeout_s):
            print(
                f"*** {what} has not completed after {timeout_s:.0f}s — the accelerator may be "
                "unreachable (TPU tunnel down?). Exit and retry with '-d cpu' to run on CPU.",
                flush=True,
            )

    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        return fn()
    finally:
        done.set()


def get_default_device_string() -> str:
    """'tpu' when a TPU/accelerator is attached, else 'cpu'.

    This is the apps' first device-touching call (via make_device_config), so
    it carries the unreachable-backend watchdog."""
    devices = run_with_backend_watchdog(jax.devices)
    return devices[0].platform


def select_device(device_str: str | None) -> None:
    """Force a JAX backend ('cpu' or 'tpu'/accelerator) — the apps' -d flag.
    Must be called before any device computation; the env var is unreliable
    under PJRT plugins so this uses the config API.

    Deliberately config-only: backend init happens at the app's first real
    device op (inside run_with_backend_watchdog), never eagerly at startup —
    an early-exiting run (bad args, missing checkpoint) must not have touched
    the exclusive-access TPU at all."""
    if device_str and device_str == "cpu":
        jax.config.update("jax_platforms", "cpu")


def make_device_config(device_str: str | None = None, use_float32: bool = False, prefer_bfloat16: bool = True) -> dict:
    """Compute-policy config for DPTModel: dtype defaults to bf16 on
    accelerators (the reference also prefers bf16 when supported,
    misc.py:61-77) and f32 on CPU or when forced."""
    device_str = device_str or get_default_device_string()
    if use_float32 or device_str == "cpu":
        dtype = jnp.float32
    else:
        dtype = jnp.bfloat16 if prefer_bfloat16 else jnp.float16
    return {"device": device_str, "dtype": dtype}


def maybe_quantize_int8(model, int8: bool, int8_full: bool = False):
    """Shared --int8 / --int8-full CLI handling for the apps: apply the int8
    serving tier (optionally incl. the full neck) with the standard
    unsupported-family fallback message. Returns the (possibly new) model."""
    if not (int8 or int8_full):
        return model
    try:
        model = model.quantize_encoder_int8(include_neck=int8_full)
        print("  int8 encoder tier enabled" + (" (+ full neck)" if int8_full else ""))
    except NotImplementedError as e:
        print(f"  --int8 unavailable for this family ({e}); using dense path")
    return model


def print_config_feedback(model_path: str, device_config: dict, use_cache: bool, image_bchw=None) -> None:
    """Startup feedback mirroring the reference's config printout
    (misc.py:101-137), with device memory stats where available."""
    import os.path as osp

    dtype = device_config.get("dtype")
    lines = [
        "",
        f"Model: {osp.basename(model_path)}",
        f"Device: {device_config.get('device')} | dtype: {jnp.dtype(dtype).name} | cache: {use_cache}",
    ]
    if image_bchw is not None:
        shape = tuple(np.shape(image_bchw))
        lines.append(f"Image shape: {'x'.join(str(s) for s in shape)}")
    stats = get_device_memory_stats()
    if stats:
        used = stats.get("bytes_in_use", 0) / 1e9
        limit = stats.get("bytes_limit", 0) / 1e9
        if limit:
            lines.append(f"Device memory: {used:.2f} / {limit:.2f} GB")
    print(*lines, sep="\n", flush=True)


def get_device_memory_stats() -> dict:
    try:
        return jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return {}


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache so per-size executables
    survive process restarts — first-compile of a large model takes 15-110 s,
    so this is the difference between instant and painful app startup."""
    cache_dir = cache_dir or os.path.join(os.path.expanduser("~"), ".cache", "muggled_dpt_tpu", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir


def reduce_overthreading() -> None:
    """Cap cv2/BLAS thread pools for interactive use (reference misc.py:143-168)."""
    try:
        import cv2

        cv2.setNumThreads(max(2, (os.cpu_count() or 4) // 2))
    except Exception:
        pass


def no_data() -> None:
    return None


class AsyncResult:
    """Wrapper for dispatch-ahead inference: holds the in-flight jax array and
    reports readiness without blocking (the TPU analog of the reference's
    DeviceChecker CUDA-stream query, misc.py:19-38)."""

    def __init__(self):
        self._pending = None

    def is_ready(self) -> bool:
        if self._pending is None:
            return True
        try:
            return self._pending.is_ready()
        except AttributeError:
            return True

    def submit(self, jax_array):
        """Store a newly dispatched (asynchronously computing) result."""
        self._pending = jax_array
        return jax_array

    def collect(self):
        """Blocking read of the last submitted result as numpy (device->host)."""
        if self._pending is None:
            return None
        return np.asarray(self._pending)
