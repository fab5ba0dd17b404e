"""Qwen-Image first-block cache composed with CPU offloading — the
reference's flagship offload capability (20B Qwen through 3-4 GB of VRAM,
``set_offload``; README.md:24) with its cache-dit DBCache example config
on top (Fn_compute_blocks=8, examples/v1/qwen-image-cache-dit.py).

OffloadedCachedQwenImageForward keeps the embeddings, the output head and
the first --fn-blocks indicator blocks resident; the remaining 52 of 60
joint blocks live in host RAM. On a cache hit the cached img-stream
residual replays and none of the streamed blocks transfer — each hit
saves ~17 GB of host->device traffic at 20B int8, which under offloading
matters far more than the skipped FLOPs.
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from nunchaku_tpu import load_autoencoder, load_qwenimage_transformer
from nunchaku_tpu.pipeline.pipeline_flux import make_img_ids, unpack_latents
from nunchaku_tpu.pipeline.scheduler import euler_step, flux_sigmas
from nunchaku_tpu.utils.offload import OffloadedCachedQwenImageForward


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4_r128-qwen-image.safetensors")
    ap.add_argument("--vae")
    ap.add_argument("--prompt-embeds", required=True,
                    help=".npy (B, S, 3584) Qwen2.5-VL hidden states")
    ap.add_argument("--threshold", type=float, default=0.12)
    ap.add_argument("--fn-blocks", type=int, default=8,
                    help="Fn_compute_blocks indicator depth (reference: 8)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lookahead", type=int, default=1)
    ap.add_argument("--out", default="qwen_image_offload_cache.npy")
    args = ap.parse_args()

    transformer = load_qwenimage_transformer(args.transformer)
    vae = load_autoencoder(args.vae) if args.vae else None
    pe = jnp.asarray(np.load(args.prompt_embeds), jnp.bfloat16)

    off = OffloadedCachedQwenImageForward(
        transformer, lookahead=args.lookahead,
        residual_diff_threshold=args.threshold, fn_blocks=args.fn_blocks,
    )

    lh, lw = args.size // 8, args.size // 8
    s_img = (lh // 2) * (lw // 2)
    lat = jax.random.normal(
        jax.random.PRNGKey(args.seed), (1, s_img, 64), jnp.float32
    )
    img_ids = make_img_ids(lh // 2, lw // 2)
    txt_ids = jnp.zeros((pe.shape[1], 3), jnp.int32)
    sigmas = flux_sigmas(args.steps, image_seq_len=s_img)

    for i in range(args.steps):
        t = jnp.full((1,), float(sigmas[i]), jnp.float32)
        vel = off(lat.astype(jnp.bfloat16), pe, t, img_ids, txt_ids)
        lat = euler_step(lat, vel.astype(jnp.float32),
                         float(sigmas[i]), float(sigmas[i + 1]))
        print(f"step {i + 1}/{args.steps} hits={off.hits}", flush=True)

    result = lat.astype(jnp.bfloat16)
    if vae is not None:
        z = unpack_latents(result, lh, lw).astype(jnp.bfloat16)
        result = vae.decode(z)
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape} "
          f"cache_hits={off.hits}/{off.steps}")


if __name__ == "__main__":
    main()
