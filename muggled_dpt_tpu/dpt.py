"""Generic DPT model facade.

API-compatible with the reference's DPTModel (muggled_dpt/dpt_model.py:20-166):
``forward`` / ``inference`` / ``prepare_image_bgr`` / ``verify_input`` with the
same argument conventions (BCHW tensors at the API boundary, BGR uint8 numpy
images for ``inference``).

TPU-native execution model: the entire pipeline — on-device preprocessing
(resize-to-patch-multiple + normalization) through patch embed, encoder,
reassembly, fusion and head — is one jitted XLA program per static input
shape. jax.jit's executable cache keyed on shapes replaces the reference's
GridCache machinery; async dispatch replaces torch's non_blocking copies."""

from __future__ import annotations

from contextlib import nullcontext as _nullcontext

import numpy as np
import jax
import jax.numpy as jnp

from .ops.quant import is_scale_key
from .ops.resize import resize_2d


class DPTModel:
    """Holds parameters + the family-specific forward function.

    family_spec: dict with keys
      forward(params, image_nhwc, capture=False) -> depth (B,H,W) [, internals]
      mean_rgb, std_rgb: per-channel normalization (floats 0..1)
      patch_size_px, tiling_size, default_size_px
    """

    def __init__(self, params, config_dict: dict, family_spec: dict, dtype=jnp.float32):
        self.config = dict(config_dict)
        self.spec = family_spec
        self._dtype = jnp.dtype(dtype)
        if self._dtype == jnp.bfloat16:
            params = _with_fused_reassembly(params)
        self.params = jax.tree_util.tree_map_with_path(
            lambda path, a: jnp.asarray(a, dtype=self._cast_dtype(a, path)), params
        )
        self._mean = np.asarray(family_spec["mean_rgb"], dtype=np.float32)
        self._std = np.asarray(family_spec["std_rgb"], dtype=np.float32)
        self.patch_size_px = family_spec["patch_size_px"]
        self.tiling_size = family_spec["tiling_size"]
        self.default_size_px = family_spec["default_size_px"]

        # f32 mode is the parity mode: force full-precision MXU passes.
        precision = "highest" if self._dtype == jnp.float32 else None
        fwd = family_spec["forward"]
        self._make_aux = family_spec.get("make_aux")
        self._aux_cache: dict = {}

        def _forward(params, image_nhwc, aux=None):
            with jax.default_matmul_precision(precision) if precision else _nullcontext():
                return fwd(params, image_nhwc, aux)

        def _prep(image_f32, scaled_hw):
            # resize (bilinear antialias, on 0..255 floats) then normalize —
            # exact order of the reference (v2 patch_embed.py:103-145).
            # Accepts a single (H, W, 3) frame or a (B, H, W, 3) batch —
            # rank is static at trace time, so both compile to the same
            # batched program shape-for-shape (batched serving, bench --batch)
            x = image_f32 if image_f32.ndim == 4 else image_f32[None]
            x = resize_2d(x, scaled_hw, mode="bilinear", align_corners=False, antialias=True)
            x = (x / 255.0 - self._mean) / self._std
            return x.astype(self._dtype)

        def _infer(params, image_hw3_u8, scaled_hw, aux=None):
            with jax.default_matmul_precision(precision) if precision else _nullcontext():
                x = _prep(image_hw3_u8.astype(jnp.float32), scaled_hw)
                return fwd(params, x, aux)

        self._forward_jit = jax.jit(_forward)
        self._infer_jit = jax.jit(_infer, static_argnums=(2,))
        self._prep_jit = jax.jit(_prep, static_argnums=(1,))
        self._capture_fn = family_spec.get("forward_capture")
        # one jit wrapper for the aux builder, so clear_cache() + re-derive at
        # a previously-seen grid hits jax's executable cache instead of
        # re-tracing a fresh wrapper per cache miss
        self._aux_jit = (
            jax.jit(self._make_aux, static_argnums=(1,)) if self._make_aux is not None else None
        )

    def _cast_dtype(self, a, path=()):
        a = np.asarray(a)
        # int8 dequant scales and SmoothQuant activation factors stay f32:
        # bf16-rounding them would add ~0.3% per-channel error on top of the
        # int8 error — and the act_smooth inverse must cancel the f32 factor
        # folded into the weights exactly. The key predicate lives beside the
        # code that CREATES those keys (ops/quant.py:is_scale_key), so adding
        # a new quantized op can't silently miss this cast exemption.
        key = str(getattr(path[-1], "key", "")) if path else ""
        if is_scale_key(key):
            return a.dtype
        return self._dtype if np.issubdtype(a.dtype, np.floating) else a.dtype

    # -- reference API ------------------------------------------------------

    def _get_aux(self, grid_hw):
        """Grid-keyed cache of precomputed aux tensors (BEiT relpos bias stack,
        SwinV2 CPB tables) — the TPU analog of the reference's GridCache
        (enable_cache, v31_beit/image_encoder_model.py:82-83)."""
        if self._make_aux is None or not self.config.get("enable_cache", True):
            return None
        grid_hw = tuple(int(g) for g in grid_hw)
        if grid_hw in self._aux_cache:
            # LRU recency bump (dict preserves insertion order; oldest first)
            self._aux_cache[grid_hw] = self._aux_cache.pop(grid_hw)
            return self._aux_cache[grid_hw]
        # HBM-budget check: mirror the reference's OOM->disable-cache
        # fallback (v31_beit/image_encoder_model.py:101-117) but predictive,
        # using the exact bias-size math (relative_positional_encoder.py:313-332).
        # The budget counts what is already resident (params + previously
        # cached grids); when the new grid doesn't fit we evict
        # least-recently-used grids to make room (the reference's cache is
        # grow-only, so a long session cycling sizes would end up refusing to
        # cache the size it is actually serving).
        estimate = self.spec.get("aux_bytes_estimate")
        if estimate is not None:
            needed = estimate(self.config, grid_hw)
            params_bytes = _tree_bytes(self.params)
            cache_bytes = _tree_bytes(self._aux_cache)
            if not _fits_hbm_budget(
                needed,
                resident_bytes=params_bytes + cache_bytes,
                reclaimable_bytes=cache_bytes,
            ):
                # doesn't fit beside the params even with an EMPTY cache —
                # check this before the eviction loop, or one oversized grid
                # would drain every cached (hot) grid for zero benefit.
                # Negative-cache the decision (stable, since params are
                # constant): without it, every frame at this grid re-runs the
                # estimate and re-prints the banner.
                print(
                    "*** WARNING ***\n"
                    "Not enough device memory for relpos caching! Caching disabled for this grid..."
                )
                self._aux_cache[grid_hw] = None
                return None
            while not _fits_hbm_budget(
                needed, resident_bytes=params_bytes + _tree_bytes(self._aux_cache)
            ):
                # evict least-recently-used positive entries until it fits.
                # The empty-cache precheck above means this normally stops
                # with room to spare; the None default guards the drained
                # case (live memory_stats can shift between the two checks)
                # — then proceed on the precheck's verdict rather than crash.
                lru = next((k for k, v in self._aux_cache.items() if v is not None), None)
                if lru is None:
                    break
                del self._aux_cache[lru]
        aux = self._aux_jit(self.params, grid_hw)
        # store in the compute dtype (e.g. bf16): halves cache HBM cost
        # and bandwidth; logits still accumulate in f32
        aux = jax.tree_util.tree_map(
            lambda a: a.astype(self._dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, aux
        )
        self._aux_cache[grid_hw] = aux
        return aux

    def clear_cache(self):
        """Drop cached per-grid aux tensors (reference clear_relpos_cache)."""
        self._aux_cache.clear()

    def prewarm(self, max_side_lengths, use_square_sizing=True, image_hw=(720, 1280)):
        """Compile-ahead for a list of sizes so interactive size switching
        (run_image's size slider) doesn't stall on first use. Returns the
        scaled sizes that were warmed.

        image_hw MUST be the actual capture resolution: the fused prep+forward
        program is traced on the raw frame shape as well as the scaled size,
        so warming at the default (720, 1280) does nothing for e.g. 1080p
        input — pass `frame.shape[:2]` from the source you will serve."""
        warmed = []
        dummy = np.zeros((*image_hw, 3), dtype=np.uint8)
        for side in max_side_lengths:
            scaled = self.compute_scaled_hw(image_hw, side, use_square_sizing)
            if scaled in warmed:
                continue
            np.asarray(self.inference(dummy, side, use_square_sizing)[0, 0, 0])
            warmed.append(scaled)
        return warmed

    def forward(self, image_rgb_normalized_bchw):
        """Depth prediction on a preprocessed BCHW tensor -> (B, H, W)."""
        x = jnp.asarray(image_rgb_normalized_bchw).transpose(0, 2, 3, 1).astype(self._dtype)
        p = self.patch_size_px
        aux = self._get_aux((x.shape[1] // p, x.shape[2] // p))
        return self._forward_jit(self.params, x, aux)

    __call__ = forward

    def inference(self, image_bgr: np.ndarray, max_side_length: int | None = None, use_square_sizing: bool = True):
        """Full preprocessing + forward on a BGR uint8 image -> (1, H, W)."""
        scaled_hw = self.compute_scaled_hw(image_bgr.shape[:2], max_side_length, use_square_sizing)
        image_rgb = np.ascontiguousarray(image_bgr[..., ::-1])
        p = self.patch_size_px
        aux = self._get_aux((scaled_hw[0] // p, scaled_hw[1] // p))
        return self._infer_jit(self.params, jnp.asarray(image_rgb), scaled_hw, aux)

    def inference_rgb_device(self, image_rgb_hw3, scaled_hw: tuple[int, int]):
        """Public entry for the fused on-device prep+forward program used by
        benchmarking and streaming callers: takes an RGB uint8 (H, W, 3) array
        — or a (B, H, W, 3) batch of frames — (ideally already device-resident
        via jax.device_put) and a precomputed (h, w) from compute_scaled_hw,
        returns depth (B, h', w'). Equivalent to `inference` minus the
        host-side BGR flip and sizing math."""
        p = self.patch_size_px
        aux = self._get_aux((scaled_hw[0] // p, scaled_hw[1] // p))
        return self._infer_jit(self.params, image_rgb_hw3, scaled_hw, aux)

    def prepare_image_bgr(
        self,
        image_bgr: np.ndarray,
        max_side_length: int | None = None,
        use_square_sizing: bool = True,
        interpolation_mode: str = "bilinear",
    ):
        """Preprocess a BGR uint8 image -> normalized BCHW array (API parity
        with v2 patch_embed.py:103-145)."""
        assert interpolation_mode == "bilinear", "only bilinear preprocessing is supported"
        scaled_hw = self.compute_scaled_hw(image_bgr.shape[:2], max_side_length, use_square_sizing)
        image_rgb = np.ascontiguousarray(image_bgr[..., ::-1]).astype(np.float32)
        x = self._prep_jit(jnp.asarray(image_rgb), scaled_hw)
        return x.transpose(0, 3, 1, 2)

    def prepare_image_bgr_nhwc(self, image_bgr, max_side_length=None, use_square_sizing=True):
        """Like `prepare_image_bgr` but returns the device-resident NHWC
        array the forward actually consumes (no BCHW round trip / host sync)
        — the batching entry for `parallel.BatchParallelRunner` callers."""
        scaled_hw = self.compute_scaled_hw(image_bgr.shape[:2], max_side_length, use_square_sizing)
        image_rgb = np.ascontiguousarray(image_bgr[..., ::-1]).astype(np.float32)
        return self._prep_jit(jnp.asarray(image_rgb), scaled_hw)

    def compute_scaled_hw(self, img_hw, max_side_length=None, use_square_sizing=True):
        """Round target size to the model's tiling constraint (patch_embed.py:117-130)."""
        if max_side_length is None:
            max_side_length = self.default_size_px
        h, w = int(img_hw[0]), int(img_hw[1])
        largest = max(h, w)
        scale = max_side_length / largest
        targ = (largest, largest) if use_square_sizing else (h, w)
        tile = self.tiling_size
        return tuple(max(1, round(s * scale / tile)) * tile for s in targ)

    def verify_input(self, image_rgb_normalized_bchw) -> bool:
        shape = np.shape(image_rgb_normalized_bchw)
        assert len(shape) == 4, f"Bad image shape! {shape} should be BxCxHxW"
        b, c, h, w = shape
        assert c == 3, f"Bad channel count! Expected 3 got {c}"
        p = self.patch_size_px
        assert h % p == 0, f"Bad height! Image height ({h}) must be divisible by {p}"
        assert w % p == 0, f"Bad width! Image width ({w}) must be divisible by {p}"
        return True

    # -- extensions ---------------------------------------------------------

    def forward_with_internals(self, image_rgb_normalized_bchw):
        """Introspection mode: functional replacement for the reference's
        forward hooks (demo_helpers/model_capture.py) — returns
        (depth, internals-pytree with per-block tokens / attention maps)."""
        if self._capture_fn is None:
            raise NotImplementedError("No capture mode for this family yet")
        x = jnp.asarray(image_rgb_normalized_bchw).transpose(0, 2, 3, 1).astype(self._dtype)
        p = self.patch_size_px
        aux = self._get_aux((x.shape[1] // p, x.shape[2] // p))
        return self._capture_fn(self.params, x, aux)

    def to(self, dtype):
        """Return a copy of this model with a different compute dtype.

        Upcasting (e.g. bf16 -> f32) starts from THIS model's already-rounded
        weights, not the checkpoint: the result runs f32 arithmetic over
        bf16-rounded values. That is exactly what the ONNX export parity check
        wants (compare against the upcast of what was exported), but it is NOT
        the bit-parity f32 mode — reload from the checkpoint with dtype=f32
        for that. A one-line notice makes the distinction impossible to miss."""
        if jnp.finfo(dtype).bits > jnp.finfo(self._dtype).bits:
            print(
                f"Note: .to({jnp.dtype(dtype).name}) upcasts {jnp.dtype(self._dtype).name}-rounded "
                "weights; for checkpoint-exact parity mode reload with dtype=float32."
            )
        return DPTModel(self.params, self.config, self.spec, dtype=dtype)

    def quantize_encoder_int8(
        self, include_qkv: bool = False, calibration_images=None, max_side_length=None,
        include_neck: bool = False,
    ):
        """Opt-in int8 (w8a8) serving tier: returns a copy whose encoder
        transformer matmul weights are symmetric per-channel int8 (activations
        quantized dynamically per token at run time — ops/quant.py). The v5e
        MXU runs s8 matmuls at ~2x the bf16 rate and the int8 weights stream
        from HBM at half the traffic. include_qkv=False (default) keeps the
        attention qkv projection in the dense dtype: softmax amplifies qkv
        quantization noise when attention logits are peaky, so the qkv matmul
        is the dominant error source for a modest share of the speedup.
        Accuracy/speed trade per variant is quantified in docs/performance.md;
        the f32 parity path and bf16 default are unaffected. Wired for the
        DINOv2 (Depth-Anything V1/V2, incl. SwiGLU giant) and BEiT encoders
        (full subset) and SwinV2 (MLP matmuls only — its windowed attention
        qkv/proj take the plain-linear path by design).

        calibration_images: optional list of BGR uint8 images enabling the
        SmoothQuant calibration tier (ops/quant.py:compute_smoothing):
        per-channel activation maxima are collected from eager capture
        forwards over these frames and outlier magnitude is migrated from
        activations into the int8 weights, which is what makes
        include_qkv=True usable (dynamic per-token scales alone lose
        resolution to outlier channels, and softmax amplifies the resulting
        qkv noise). Only wired for the stacked-blocks encoders (DINOv2/BEiT);
        SwinV2's MLP-only subset doesn't need it."""
        from .ops.quant import (
            QUANTIZABLE,
            collect_activation_stats,
            compute_smoothing,
            quantize_block_params,
            reset_collection_pass,
        )

        enc = self.params.get("encoder")
        params = dict(self.params)
        subset = QUANTIZABLE if include_qkv else tuple(n for n in QUANTIZABLE if n != "qkv")
        smoothing = None
        if calibration_images is not None:
            if not (isinstance(enc, dict) and "blocks" in enc):
                raise NotImplementedError("int8 calibration: only the stacked-blocks encoders (DINOv2/BEiT)")
            with collect_activation_stats() as stats:
                for img in calibration_images:
                    reset_collection_pass()
                    x = self.prepare_image_bgr(img, max_side_length)
                    self.forward_with_internals(x)
            if not stats:
                # the collector only sees EAGER forwards; if the capture path
                # ever runs traced, stats stay empty and the tier would
                # silently degrade to uncalibrated dynamic quantization —
                # exactly what the caller passed calibration images to avoid
                raise RuntimeError(
                    "int8 calibration recorded no activation stats (capture "
                    "forward did not run eagerly?) — refusing to quantize "
                    "without the smoothing the calibration images were for"
                )
            smoothing = compute_smoothing(enc["blocks"], stats, subset)
            missing = [n for n in subset if n + "_kernel" in enc["blocks"] and n not in smoothing]
            if missing:
                print(f"int8 calibration: no activation stats for {missing}; those stay dynamic-only")
        if isinstance(enc, dict) and "blocks" in enc:
            params["encoder"] = {**enc, "blocks": quantize_block_params(enc["blocks"], subset, smoothing=smoothing)}
        elif isinstance(enc, dict) and "stages" in enc:
            mlp_subset = tuple(n for n in subset if n in ("fc1", "fc2"))
            stages = [
                {k: (quantize_block_params(v, mlp_subset) if k in ("b0", "b1") else v) for k, v in stage.items()}
                for stage in enc["stages"]
            ]
            params["encoder"] = {**enc, "stages": stages}
        else:
            raise NotImplementedError("int8 tier: unrecognized encoder parameter layout")
        if include_neck:
            # extend the tier to the whole neck: reassembly GEMMs, fusion
            # residual convs + out projections (shiftsum-GEMM q8 form) and
            # the head convs — see ops/quant.quantize_neck_params
            from .ops.quant import quantize_neck_params

            params = quantize_neck_params(params)
        return DPTModel(params, self.config, self.spec, dtype=self._dtype)


def _with_fused_reassembly(params):
    """bf16 serving precompute: collapse each reassembly stage's
    conv-transpose(k=s) + 3x3 fuse pair into phase-decomposed matmul weights
    (ops/nn.py:fuse_transpose_conv3x3_weights). Contracted once in f32 at
    build; cast to the compute dtype with the rest of the pytree. Stages are
    recognized by the s x s resample kernel (s in {2,4}); already-fused params
    (DPTModel.to / quantize copies) pass through unchanged.

    The dense resample/fuse kernels are deliberately KEPT alongside the fused
    weights even though the bf16 serving path never reads them: .to(float32)
    (the ONNX export parity check) and the f32 branch of reassemble_stage
    need the originals, and they are device-put once — the cost is idle HBM
    residency, not per-call traffic."""
    stages = params.get("reassemble") if isinstance(params, dict) else None
    if not stages:
        return params
    from .ops.nn import fuse_transpose_conv3x3_weights

    new_stages = []
    changed = False
    for p in stages:
        rk = p.get("resample_kernel")
        if rk is not None and "fused" not in p and np.shape(rk)[0] in (2, 4) and np.shape(rk)[0] == np.shape(rk)[1]:
            p = {**p, "fused": fuse_transpose_conv3x3_weights(rk, p["resample_bias"], p["fuse_kernel"])}
            changed = True
        new_stages.append(p)
    if not changed:
        return params
    return {**params, "reassemble": type(stages)(new_stages) if not isinstance(stages, list) else new_stages}


def _tree_bytes(tree) -> int:
    """Total nbytes of the array leaves of a pytree (0 for non-arrays)."""
    return sum(int(getattr(l, "nbytes", 0)) for l in jax.tree_util.tree_leaves(tree))


def _fits_hbm_budget(
    needed_bytes: int,
    safety_fraction: float = 0.5,
    resident_bytes: int = 0,
    reclaimable_bytes: int = 0,
) -> bool:
    """True if `needed_bytes` fits in the free device memory (with headroom).

    resident_bytes: what the model already holds (params + cached aux). On
    the stats path those buffers are already inside bytes_in_use, so only the
    stats-unavailable fallback charges them (this repo's TPU backend returns
    None from memory_stats(), so the fallback IS the deployed path: without
    it each new grid would be judged against a flat budget while the cache
    grows unbounded).

    reclaimable_bytes: the subset of resident_bytes the caller is willing to
    evict (cached grids) — credited back as free space on BOTH paths, so the
    "would it fit with an empty cache" precheck works on stats-capable
    backends too (where in_use already counts the evictable grids; without
    the credit the precheck and the eviction-loop check are the same
    predicate and eviction can never fire)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if not limit:
            # stats unavailable (some PJRT plugins): assume a conservative
            # 8 GB of headroom for params + every cached grid together
            return resident_bytes - reclaimable_bytes + needed_bytes < 8 * 1024**3
        return needed_bytes < (limit - in_use + reclaimable_bytes) * safety_fraction
    except Exception:
        return True


