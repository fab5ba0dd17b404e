"""Installation smoke test (counterpart of nunchaku/test.py:22-38, which
runs FLUX.1-schnell 4-step on the GPU).

Without checkpoints this drives the full engine end-to-end with random
weights — every kernel, the scan graph, caching, and the VAE decode — and
reports latency. With --transformer it runs the real model.

    python -m nunchaku_tpu.test [--full] [--transformer ckpt.safetensors]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from .models.autoencoder import AutoencoderKL
from .models.transformers.transformer_flux import FluxConfig, FluxTransformer2DModel
from .pipeline.pipeline_flux import FluxPipeline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="full-size FLUX dims")
    ap.add_argument("--transformer", help="nunchaku checkpoint to load")
    ap.add_argument("--precision", default="int8")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--cache", default=None)
    args = ap.parse_args()

    if args.transformer:
        from .models.transformers.loader import load_flux_transformer

        model = load_flux_transformer(args.transformer, precision=args.precision)
        size = 1024
    elif args.full:
        cfg = FluxConfig(precision=args.precision, guidance_embeds=False)
        model = FluxTransformer2DModel.dummy_init(cfg)
        size = 1024
    else:
        cfg = FluxConfig(
            num_layers=2, num_single_layers=4, num_attention_heads=4,
            joint_attention_dim=512, pooled_projection_dim=256,
            precision=args.precision, guidance_embeds=False,
        )
        model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
        size = 256

    vae = AutoencoderKL.random_init(
        jax.random.PRNGKey(1), block_out_channels=(32, 64, 128, 128), layers_per_block=1
    )
    pipe = FluxPipeline(model, vae=vae)
    cfgm = model.cfg

    pe = jax.random.normal(
        jax.random.PRNGKey(2), (1, 256, cfgm.joint_attention_dim), jnp.bfloat16
    )
    pool = jax.random.normal(
        jax.random.PRNGKey(3), (1, cfgm.pooled_projection_dim), jnp.bfloat16
    )
    t0 = time.time()
    out = pipe(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=size, width=size, num_inference_steps=args.steps,
        cache=args.cache, seed=0,
    )
    jax.block_until_ready(out.images if out.images is not None else out.latents)
    dt = time.time() - t0
    img = out.images
    ok = bool(jnp.isfinite(jnp.asarray(img, jnp.float32)).all())
    print(
        f"nunchaku_tpu smoke: {args.steps} steps @ {size}px "
        f"({'checkpoint' if args.transformer else 'random weights'}, "
        f"{args.precision}) -> image {tuple(img.shape)}, finite={ok}, "
        f"{dt:.1f}s incl. compile"
    )
    assert ok


if __name__ == "__main__":
    main()
