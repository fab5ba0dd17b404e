"""First-block cache composed with CPU offloading (counterpart of the
reference's examples/flux.1-dev-double_cache_offloading.py: double FB cache
+ transformer offload + per-layer text-encoder offload for ~3-4 GiB VRAM).

OffloadedCachedFluxForward keeps only the embeddings, the output head, and
dual block 0 (the cache decision block) resident in HBM; the remaining 56
blocks live in host RAM. On a cache hit the cached residuals replay and no
block weights stream at all — each hit saves ~6.2 GB of host->device
traffic (int8 FLUX), which under offloading matters far more than the
skipped FLOPs.
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from nunchaku_tpu import (
    FluxPipeline,
    load_autoencoder,
    load_clip_text,
    load_flux_transformer,
    load_t5_encoder,
)
from nunchaku_tpu.pipeline.pipeline_flux import make_img_ids, unpack_latents
from nunchaku_tpu.pipeline.scheduler import euler_step, flux_sigmas
from nunchaku_tpu.utils.offload import OffloadedCachedFluxForward


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True)
    ap.add_argument("--vae")
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--prompt", default="A cat holding a sign that says hello world")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--threshold", type=float, default=0.12,
                    help="FB-cache residual_diff_threshold (0.12 ~= the "
                         "reference's 2x-at-50-steps operating point)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lookahead", type=int, default=1)
    ap.add_argument("--out", default="flux_dev_cache_offload.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer)
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae) if args.vae else None,
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )
    prompt_embeds, pooled = pipe.encode_prompt(args.prompt)

    off = OffloadedCachedFluxForward(
        transformer, lookahead=args.lookahead,
        residual_diff_threshold=args.threshold,
    )

    lh, lw = args.size // 8, args.size // 8
    s_img = (lh // 2) * (lw // 2)
    lat = jax.random.normal(
        jax.random.PRNGKey(args.seed), (1, s_img, 64), jnp.float32
    )
    img_ids = make_img_ids(lh // 2, lw // 2)
    txt_ids = jnp.zeros((prompt_embeds.shape[1], 3), jnp.int32)
    guidance = jnp.array([args.guidance], jnp.float32)
    sigmas = flux_sigmas(args.steps, s_img)

    for i in range(args.steps):
        t = jnp.full((1,), float(sigmas[i]), jnp.float32)
        vel = off(lat.astype(jnp.bfloat16), prompt_embeds, pooled, t,
                  img_ids, txt_ids, guidance)
        lat = euler_step(lat, vel.astype(jnp.float32),
                         float(sigmas[i]), float(sigmas[i + 1]))
        print(f"step {i + 1}/{args.steps} hits={off.hits}", flush=True)

    result = lat.astype(jnp.bfloat16)
    if pipe.vae is not None:
        z = unpack_latents(result, lh, lw).astype(jnp.bfloat16)
        result = pipe.vae.decode(z)
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape} "
          f"cache_hits={off.hits}/{off.steps}")


if __name__ == "__main__":
    main()
