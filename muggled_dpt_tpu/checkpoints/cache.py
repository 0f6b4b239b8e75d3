"""Converted-checkpoint caching (SURVEY.md §5 'checkpoint / resume' row).

The original .pt/.pth files load unchanged through the torch-free reader, but
conversion (unpickle + transpose surgery) of a multi-GB checkpoint costs
seconds. This module persists the *converted* parameter pytree beside the
original file (``<name>.dpt_cache.npz``) for near-instant reloads, keyed by
the source file's size+mtime so a changed checkpoint invalidates the cache."""

from __future__ import annotations

import os
import os.path as osp
import json

import numpy as np


def _fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}-{int(st.st_mtime)}"


def cache_path_for(checkpoint_path: str) -> str:
    return osp.splitext(checkpoint_path)[0] + ".dpt_cache.npz"


def _flatten(tree, prefix=""):
    """Flatten a nested dict/list pytree of arrays to {path: array}."""
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip("/"): tree}
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}/"))
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for path, value in flat.items():
        keys = path.split("/")
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(root)


def save_converted(checkpoint_path: str, config_dict: dict, params) -> str:
    """Write the converted (config, params) cache. Returns the cache path."""
    flat = _flatten(params)
    meta = json.dumps({"fingerprint": _fingerprint(checkpoint_path), "config": _json_safe(config_dict)})
    out = cache_path_for(checkpoint_path)
    np.savez(out, __meta__=np.frombuffer(meta.encode(), dtype=np.uint8), **flat)
    return out


def load_converted(checkpoint_path: str):
    """Returns (config_dict, params) if a valid cache exists, else None."""
    cache = cache_path_for(checkpoint_path)
    if not osp.exists(cache):
        return None
    try:
        with np.load(cache) as data:
            meta = json.loads(bytes(data["__meta__"]).decode())
            if meta.get("fingerprint") != _fingerprint(checkpoint_path):
                return None
            flat = {k: data[k] for k in data.files if k != "__meta__"}
        return meta["config"], _unflatten(flat)
    except Exception:
        return None


def _json_safe(obj):
    if isinstance(obj, dict):
        return {k: _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj
