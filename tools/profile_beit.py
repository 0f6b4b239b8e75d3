"""BEiT-L-512 component/op profiler (real TPU).

Answers where BEiT's serving time goes relative to DA ViT-L (which runs the
same 24x1024x16h encoder shape without the relpos bias): encoder split,
per-op attention with/without bias, and the bias-handling overheads
(pad+broadcast of the cached stack, in-kernel bias tile reads).

Run: python tools/profile_beit.py [size]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit_queue(fn, k1=10, k2=40, reps=5):
    outs = [fn() for _ in range(3)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[0])

    def run(k):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(k)]
            np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(k2) - run(k1)) / (k2 - k1)


def main():
    sys.path.insert(0, "/root/repo")
    from muggled_dpt_tpu.make_beit_dpt import make_beit_dpt
    from muggled_dpt_tpu.models.beit import BEiTConfig, encoder_forward, compute_bias_stack
    from muggled_dpt_tpu.ops.nn import patchify_embed, self_attention

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512

    model = make_beit_dpt(
        features_per_token=1024,
        num_heads=16,
        num_blocks=24,
        reassembly_features_list=(256, 512, 1024, 1024),
        base_patch_grid_hw=(32, 32),
        fusion_channels=256,
        patch_size_px=16,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    image_bgr = rng.integers(0, 256, size=(720, 1280, 3), dtype=np.uint8)
    scaled_hw = model.compute_scaled_hw(image_bgr.shape[:2], size, True)
    grid = (scaled_hw[0] // 16, scaled_hw[1] // 16)
    n = grid[0] * grid[1] + 1
    print(f"scaled: {scaled_hw}, grid {grid}, N={n}")
    frame = jax.device_put(jnp.asarray(np.ascontiguousarray(image_bgr[..., ::-1])))
    params = model.params
    aux = model._get_aux(grid)
    print("aux dtype/shape:", aux.dtype, aux.shape)

    cfg = model.spec["encoder_config"]

    def upto_encoder(p, x, bias_stack):
        tokens, g = patchify_embed(x, p["patch_embed"]["kernel"], p["patch_embed"]["bias"])
        return encoder_forward(p["encoder"], tokens, g, cfg, bias_stack=bias_stack)

    f_enc = jax.jit(lambda p, fr, a: upto_encoder(p, model._prep_jit(fr.astype(jnp.float32), scaled_hw), a))
    f_prep = jax.jit(lambda fr: model._prep_jit(fr.astype(jnp.float32), scaled_hw))

    rows = [
        ("e2e inference (cached aux)", lambda: model._infer_jit(params, frame, scaled_hw, aux)),
        ("prep only", lambda: f_prep(frame)),
        ("prep+embed+encoder", lambda: f_enc(params, frame, aux)),
    ]
    for label, fn in rows:
        print(f"{label:36s} {timeit_queue(fn)*1e3:8.2f} ms")

    # ---- per-op attention probes (in-graph chains so launch cost amortizes)
    h, d = 16, 64
    x = jnp.asarray(rng.standard_normal((1, n, 1024)), jnp.bfloat16)
    bp0 = jax.tree_util.tree_map(lambda a: a[0], {k: v for k, v in params["encoder"]["blocks"].items() if k != "relpos_lut"})
    attn_params = {"qkv_kernel": bp0["qkv_kernel"], "qkv_bias": jnp.zeros((3072,), jnp.bfloat16),
                   "proj_kernel": bp0["proj_kernel"], "proj_bias": bp0["proj_bias"]}
    bias1 = aux[0][None]  # (1, H, N, N)

    def chain(fn, reps=8):
        def run(x0):
            y = x0
            for _ in range(reps):
                y = fn(y) + y * jnp.bfloat16(1e-6)
            return y
        j = jax.jit(run)
        t = timeit_queue(lambda: j(x), k1=5, k2=15)
        return t / reps

    t_nobias = chain(lambda y: self_attention(y, attn_params, h, bias=None, impl="pallas"))
    t_bias = chain(lambda y: self_attention(y, attn_params, h, bias=bias1, impl="pallas"))
    print(f"attention/block: no-bias {t_nobias*1e6:.0f} us | cached-bias {t_bias*1e6:.0f} us | delta {(t_bias-t_nobias)*1e6:.0f} us")

    # full-bias-generation cost (the enable_cache=False inline path, per layer)
    lut = params["encoder"]["blocks"]["relpos_lut"]
    f_gen = jax.jit(lambda l: compute_bias_stack(l[:1], (32, 32), grid))
    t_gen = timeit_queue(lambda: f_gen(lut), k1=5, k2=15)
    print(f"bias generation (resize+gather)/layer: {t_gen*1e3:.2f} ms")


if __name__ == "__main__":
    main()
