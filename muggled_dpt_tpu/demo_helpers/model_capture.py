"""Intermediate-output capture (reference demo_helpers/model_capture.py).

The reference registers torch forward hooks on modules of a chosen type
(ModelOutputCapture, model_capture.py:15-62). Hooks don't exist in a
functional jitted world; the equivalent here is the introspection-mode
forward — ``DPTModel.forward_with_internals`` — which returns a pytree of
intermediates (per-block tokens, softmax attention maps, reassembly/fusion
maps) from a single compiled program. This class adapts that to the
reference's capture-object ergonomics for the analysis experiments."""

from __future__ import annotations

import numpy as np


class ModelOutputCapture:
    """Capture intermediates for one forward pass.

    target: 'attention' (per-block softmax maps), 'block_tokens'
    (per-block token outputs), 'reassembly_maps' or 'fused_map'.
    After calling run(), the captured results are available by indexing this
    object (mirrors the reference's list-like capture results)."""

    def __init__(self, dpt_model, target: str = "attention"):
        self._model = dpt_model
        self._target = target
        self.results: list = []
        self.depth = None

    def run(self, image_rgb_normalized_bchw):
        depth, internals = self._model.forward_with_internals(image_rgb_normalized_bchw)
        captured = internals[self._target]
        if not isinstance(captured, (list, tuple)):
            captured = [captured]
        self.results = [np.asarray(c) for c in captured]
        self.depth = np.asarray(depth)
        return self.depth

    def __len__(self):
        return len(self.results)

    def __getitem__(self, idx):
        return self.results[idx]

    def __iter__(self):
        return iter(self.results)
