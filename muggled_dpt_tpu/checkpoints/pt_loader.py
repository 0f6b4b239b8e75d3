"""Torch-free reader for PyTorch ``.pt`` / ``.pth`` checkpoint files.

The reference loads original checkpoints with ``torch.load`` (make_dpt.py:38-41).
This framework must load the *same files unchanged* (BASELINE.json) without
requiring torch at runtime: a torch zip checkpoint is a zipfile containing a
pickle (``data.pkl``) whose tensors are persistent-id references into raw
little-endian storage blobs (``data/<key>``). We unpickle with a restricted
Unpickler that materializes storages as numpy arrays.

Falls back to ``torch.load(map_location='cpu')`` for legacy (non-zip) files
when torch is importable — mirroring the reference's CPU-remap fallback.
"""

from __future__ import annotations

import io
import pickle
import zipfile

import numpy as np

try:  # bfloat16 support without torch
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": _BFLOAT16,
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
}


class _StorageRef:
    __slots__ = ("dtype", "key", "numel")

    def __init__(self, dtype, key, numel):
        self.dtype, self.key, self.numel = dtype, key, numel


class _StorageType:
    """Stand-in for torch.FloatStorage etc. encountered during unpickling."""

    def __init__(self, name):
        self.name = name


def _rebuild_tensor_v2(storage_array, storage_offset, size, stride, *_args, **_kw):
    itemsize = storage_array.dtype.itemsize
    if not size:
        return storage_array[storage_offset].copy()
    byte_strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        storage_array[storage_offset:], shape=tuple(size), strides=byte_strides, writeable=False
    )
    return view.copy()


def _rebuild_parameter(data, *_args, **_kw):
    return data


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, read_blob):
        super().__init__(file, encoding="latin1")
        self._read_blob = read_blob

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if name.endswith("Storage"):
            return _StorageType(name)
        if module == "collections" and name == "OrderedDict":
            return dict
        if (module, name) in {("torch", "Size"), ("builtins", "tuple")}:
            return tuple
        # torch dtype objects etc. appear in some checkpoints' metadata
        if module.startswith("torch"):
            return lambda *a, **k: None
        raise pickle.UnpicklingError(f"Blocked unpickle of {module}.{name}")

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"Unknown persistent id: {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = storage_type.name if isinstance(storage_type, _StorageType) else str(storage_type)
        dtype = _STORAGE_DTYPES.get(name)
        if dtype is None:
            raise pickle.UnpicklingError(f"Unsupported storage dtype: {name}")
        raw = self._read_blob(key)
        return np.frombuffer(raw, dtype=dtype, count=numel)


def load_pt(path: str):
    """Load a .pt/.pth checkpoint into nested python structures with numpy
    tensors. Works without torch for zip-format files (torch >= 1.6)."""
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
            prefix = pkl_name[: -len("data.pkl")]

            def read_blob(key):
                return zf.read(f"{prefix}data/{key}")

            with zf.open(pkl_name) as f:
                return _Unpickler(io.BytesIO(f.read()), read_blob).load()

    # Legacy pickle format: delegate to torch (CPU map, mirrors make_dpt.py:38-41)
    try:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as err:
        raise ValueError(
            f"Not a valid PyTorch checkpoint: {path} "
            "(neither zip-format nor a loadable legacy pickle)"
        ) from err
    return _torch_to_numpy_tree(obj)


def _torch_to_numpy_tree(obj):
    import torch

    if isinstance(obj, torch.Tensor):
        t = obj.detach().cpu()
        if t.dtype == torch.bfloat16:
            return t.to(torch.float32).numpy().astype(_BFLOAT16) if _BFLOAT16 else t.float().numpy()
        return t.numpy()
    if isinstance(obj, dict):
        return {k: _torch_to_numpy_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_torch_to_numpy_tree(v) for v in obj)
    return obj


def load_safetensors(path: str) -> dict:
    """Load a .safetensors checkpoint to {name: ndarray} (some Depth-Anything
    releases ship safetensors alongside the .pth files)."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out


def load_state_dict(path: str) -> dict:
    """Load and unwrap a checkpoint to a flat {name: ndarray} state dict.
    Supports torch zip/legacy .pt/.pth and .safetensors files; unwraps common
    single-key containers ({'model': ...}, {'state_dict': ...})."""
    if str(path).lower().endswith(".safetensors"):
        return load_safetensors(path)
    obj = load_pt(path)
    if isinstance(obj, dict):
        for wrapper in ("state_dict", "model"):
            inner = obj.get(wrapper)
            if isinstance(inner, dict) and inner and not any(isinstance(v, np.ndarray) for v in obj.values()):
                obj = inner
                break
    if not isinstance(obj, dict):
        raise ValueError(f"Checkpoint at {path} did not contain a state dict")
    return obj
