"""Tracing / profiling / logging utilities (SURVEY.md §5 'tracing' row).

The reference instruments with perf_counter spans and prints VRAM via
torch.cuda.mem_get_info (run_image.py:204-207, demo_helpers/misc.py:174-179).
TPU-native equivalents:
* jax.profiler trace annotations (viewable in TensorBoard/Perfetto)
* per-device HBM statistics from device.memory_stats()
* structured std-logging with step-time counters
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

LOGGER = logging.getLogger("muggled_dpt_tpu")


def setup_logging(level=logging.INFO):
    if not LOGGER.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        LOGGER.addHandler(handler)
    LOGGER.setLevel(level)
    return LOGGER


@contextlib.contextmanager
def trace_span(name: str, log: bool = False):
    """Wall-clock span that also emits a jax.profiler TraceAnnotation, so the
    region shows up in captured device profiles."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    if log:
        LOGGER.info("%s: %.2f ms", name, dt * 1000)


def start_profiler_trace(log_dir: str = "/tmp/jax_trace"):
    jax.profiler.start_trace(log_dir)
    return log_dir


def stop_profiler_trace():
    jax.profiler.stop_trace()


def device_memory_report() -> dict:
    """HBM usage per local device (bytes)."""
    report = {}
    for dev in jax.local_devices():
        stats = dev.memory_stats() or {}
        report[str(dev)] = {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    return report


def assert_finite(tree, name: str = "output"):
    """Host-side NaN/inf guard for debugging (SURVEY.md §5 'race detection /
    sanitizers' row: the reference removes infs post-hoc, postprocess.py:55-68;
    this raises instead so bad numerics are caught at the source)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            pathstr = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(f"{name}{'/' + pathstr if pathstr else ''}: {bad} non-finite values")
    return tree


class StepTimer:
    """EMA step-time / fps counter for streaming loops (the reference's
    on-frame ms overlay, run_video.py:383-384)."""

    def __init__(self, smoothing: float = 0.9):
        self._smoothing = smoothing
        self._ema = None
        self._last = None

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._ema = dt if self._ema is None else self._smoothing * self._ema + (1 - self._smoothing) * dt
        self._last = now
        return self.ms

    @property
    def ms(self) -> float:
        return 0.0 if self._ema is None else self._ema * 1000.0

    @property
    def fps(self) -> float:
        return 0.0 if not self._ema else 1.0 / self._ema
