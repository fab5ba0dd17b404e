"""FLUX.1-dev with CPU block offloading (counterpart of the reference's
examples/v1/flux.1-dev-offload.py, transformer.set_offload(True)).

Block-stack weights live in host RAM and stream to the device with
lookahead prefetch (utils/offload.py BlockStreamer); embeds/head stay
resident. Trades step latency for a ~6.5 GB drop in device HBM, so the
19+38-block transformer fits alongside the VAE + text encoders on small
chips. The denoise loop is driven manually (the streamer issues per-block
device calls, which cannot live inside one jitted step).
"""

import argparse

import numpy as np
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
from nunchaku_tpu.utils.offload import OffloadedFluxForward

import jax


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
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lookahead", type=int, default=1)
    ap.add_argument("--out", default="flux_dev_offload.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer)
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae) if args.vae else None,
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )
    prompt_embeds, pooled = pipe.encode_prompt(args.prompt)

    # move block stacks to host AFTER text encoding freed its activations
    off = OffloadedFluxForward(transformer, lookahead=args.lookahead)

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
        print(f"step {i + 1}/{args.steps}", flush=True)

    result = lat.astype(jnp.bfloat16)
    if pipe.vae is not None:
        z = unpack_latents(result, lh, lw).astype(jnp.bfloat16)
        result = pipe.vae.decode(z)
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
