"""Model-level quality proxy: image-space cost of the serving modes'
weight re-rounding, measured end to end on synthetic FLUX-dims weights.

Real checkpoints cannot mount in this sandbox (zero egress), so the
single-largest unproven claim — the int8-turbo / w4a8 modes re-round the
checkpoint's int4 residual to per-channel int8 (loader.py _decode_svdq) —
is bounded here at MODEL level: build a FLUX-dims int4 "checkpoint twin"
with realistic code/scale distributions (discretized-gaussian codes,
heavy-tailed group scales — deepcompressor residuals look like this, not
like uniform codes), serve the SAME twin in each mode through the full
pipeline (20 denoise steps + tiled VAE decode at 1024px), and report
  - from-scratch LPIPS(int4 images, mode images)   [metrics/lpips.py]
  - latent relative error (mode vs int4) at the last step
for mode in {int8, w4a8}. The int4 run is the parity anchor (it matches
the reference's own quantized output contract; tests/test_golden.py).
The one-command real-weight path stays NUNCHAKU_TPU_CKPT_ROOT.

Reference accuracy spec this proxies: LPIPS table
/root/reference/tests/v1/flux/test_flux1_dev.py:66-135.

  python tools/quality_proxy.py [n_seeds] [steps] [size]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def realistic_int4(model, key):
    """Overwrite every int4 SVDQ linear's codes/scales with realistic
    distributions, deterministically: codes ~ round(N(0, 2.7)) clipped to
    [-7, 7] (group-quantized residuals are near-gaussian with the tails
    clipped into the end codes), group scales ~ lognormal(sigma=0.6)
    around the init magnitude (scale spread follows the activation-smooth
    folded weight magnitudes, which are heavy-tailed)."""
    from nunchaku_tpu.core.packing import pack_int4
    from nunchaku_tpu.models.linear import SVDQW4A4Linear

    i = 0
    for _, mod in model.modules():
        for attr, child in vars(mod).items():
            if not (isinstance(child, SVDQW4A4Linear)
                    and child.precision == "int4"):
                continue
            i += 1
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            shp = child.qweight.shape  # (.., K/2, N) packed
            kdim = shp[-2] * 2

            def gen(kk, kd=kdim, n=shp[-1]):
                c = jnp.clip(jnp.round(
                    jax.random.normal(kk, (kd, n)) * 2.7), -7, 7
                ).astype(jnp.int8)
                return pack_int4(c, axis=-2)

            if child.qweight.ndim == 3:
                # layer by layer: one (K, N) f32 temp at a time, not the
                # whole stack's (a 5.7 GiB temp at single-fc1 dims)
                child.qweight = jnp.stack([
                    jax.block_until_ready(gen(jax.random.fold_in(k1, j)))
                    for j in range(shp[0])
                ])
            else:
                child.qweight = gen(k1)
            ws = child.wscales
            child.wscales = (
                jnp.abs(ws.astype(jnp.float32))
                * jnp.exp(jax.random.normal(k2, ws.shape) * 0.6)
            ).astype(ws.dtype)
    model.refresh_pytree()
    return model


def build(mode: str):
    from nunchaku_tpu.models.autoencoder import AutoencoderKL
    from nunchaku_tpu.models.requantize import requantize_model
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )
    from nunchaku_tpu.pipeline.pipeline_flux import FluxPipeline

    if os.environ.get("NUNCHAKU_QP_TINY") == "1":  # CPU smoke config
        cfg = FluxConfig(num_layers=1, num_single_layers=1,
                         num_attention_heads=2, joint_attention_dim=512,
                         pooled_projection_dim=256, precision="int4")
    else:
        cfg = FluxConfig(precision="int4")
    m = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    m = realistic_int4(m, jax.random.PRNGKey(1))
    if mode != "int4":
        # same math as the loader's serving-mode decode (_decode_svdq);
        # inplace: the int4 model and the int8 stacks don't coexist
        m = requantize_model(m, mode, inplace=True)
    if os.environ.get("NUNCHAKU_QP_TINY") == "1":
        vae = AutoencoderKL.random_init(
            jax.random.PRNGKey(2), block_out_channels=(32, 32, 32, 32),
            layers_per_block=1,
        )
    else:
        vae = AutoencoderKL.random_init(jax.random.PRNGKey(2))
        vae.enable_tiling()
    return FluxPipeline(m, vae=vae), cfg


def run_mode(mode: str, n_seeds: int, steps: int, size: int):
    pipe, cfg = build(mode)
    s_txt = 64 if os.environ.get("NUNCHAKU_QP_TINY") == "1" else 512
    pe = jax.random.normal(
        jax.random.PRNGKey(3), (1, s_txt, cfg.joint_attention_dim), jnp.bfloat16
    )
    pooled = jax.random.normal(
        jax.random.PRNGKey(4), (1, cfg.pooled_projection_dim), jnp.bfloat16
    )
    imgs, lats = [], []
    for seed in range(n_seeds):
        t0 = time.time()
        out = pipe(
            prompt_embeds=pe, pooled_prompt_embeds=pooled,
            height=size, width=size, num_inference_steps=steps, seed=seed,
        )
        imgs.append(np.asarray(out.images, np.float32))
        lats.append(np.asarray(out.latents, np.float32))
        print(f"[{mode}] seed {seed}: {time.time() - t0:.1f} s", flush=True)
    del pipe
    import gc

    gc.collect()
    return np.concatenate(imgs), np.concatenate(lats)


def main():
    """Each serving mode runs in its OWN process and saves an npz: the
    16 GiB chip cannot hold mode N's weights while mode N-1's allocator
    state is still warm (the in-process loop OOM'd building int8 after the
    int4 run). Orchestration:

      python tools/quality_proxy.py --mode int4 --save /tmp/qp_int4.npz [n steps size]
      python tools/quality_proxy.py --mode int8 --save /tmp/qp_int8.npz [n steps size]
      python tools/quality_proxy.py --mode w4a8 --save /tmp/qp_w4a8.npz [n steps size]
      python tools/quality_proxy.py --report /tmp/qp_int4.npz /tmp/qp_int8.npz /tmp/qp_w4a8.npz

    Positional [n_seeds steps size] keep their defaults (2, 20, 1024)."""
    argv = sys.argv[1:]
    if argv and argv[0] == "--report":
        from nunchaku_tpu.metrics.lpips import compute_lpips

        ref = np.load(argv[1])
        table = {}
        for path in argv[2:]:
            d = np.load(path)
            mode = str(d["mode"])
            lp = compute_lpips(ref["images"], d["images"])
            rel = float(
                np.linalg.norm(d["latents"] - ref["latents"])
                / (np.linalg.norm(ref["latents"]) + 1e-9)
            )
            table[mode] = {"lpips_vs_int4": round(lp, 5),
                           "latent_rel_err": round(rel, 5)}
        print(json.dumps({
            "quality_proxy": table,
            "n_seeds": int(ref["n_seeds"]), "steps": int(ref["steps"]),
            "size": int(ref["size"]),
            "note": ("synthetic FLUX-dims twin (realistic code/scale dists);"
                     " int4 = parity anchor; from-scratch LPIPS"
                     " (random-feature AlexNet when no weights file)"),
        }))
        return

    mode, save = "int4", None
    if "--mode" in argv:
        i = argv.index("--mode")
        mode = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--save" in argv:
        i = argv.index("--save")
        save = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    n_seeds = int(argv[0]) if len(argv) > 0 else 2
    steps = int(argv[1]) if len(argv) > 1 else 20
    size = int(argv[2]) if len(argv) > 2 else 1024
    imgs, lats = run_mode(mode, n_seeds, steps, size)
    if save:
        np.savez_compressed(save, images=imgs, latents=lats, mode=mode,
                            n_seeds=n_seeds, steps=steps, size=size)
        print(f"saved {save}: images {imgs.shape} latents {lats.shape}")


if __name__ == "__main__":
    main()
