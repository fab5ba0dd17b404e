"""FLUX.1-Redux image variation (counterpart of the reference's
examples/flux.1-redux-dev.py, which drives diffusers'
FluxPriorReduxPipeline + FluxPipeline with the nunchaku transformer).

The reference image runs through the SigLIP-so400m tower and the Redux
embedder (models/redux.py) into 729 image-prompt tokens that are appended
to the (optionally empty) text prompt embeds; the denoise loop is the
plain FLUX loop on the base dev transformer.
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
from nunchaku_tpu.models.redux import load_redux_prior, preprocess_siglip_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4_r32-flux.1-dev.safetensors (base dev model)")
    ap.add_argument("--vae", required=True)
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--siglip", required=True,
                    help="FLUX.1-Redux-dev image_encoder safetensors (SigLIP)")
    ap.add_argument("--embedder", required=True,
                    help="FLUX.1-Redux-dev image_embedder safetensors")
    ap.add_argument("--image", required=True, help=".npy (H, W, 3) in [0,1]")
    ap.add_argument("--prompt", default="",
                    help="optional extra text prompt (Redux works unprompted)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=2.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--precision", choices=["int4", "nvfp4", "int8"], default=None)
    ap.add_argument("--out", default="redux_variation.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer, precision=args.precision)
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae),
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )
    prior = load_redux_prior(args.siglip, args.embedder)

    text_embeds, pooled = pipe.encode_prompt(args.prompt)
    px = preprocess_siglip_image(np.load(args.image))
    prompt_embeds = prior.prompt_embeds(px, text_embeds)
    print(f"prompt embeds: {text_embeds.shape[1]} text + "
          f"{prompt_embeds.shape[1] - text_embeds.shape[1]} image tokens")

    out = pipe(
        prompt_embeds=prompt_embeds.astype(jnp.bfloat16),
        pooled_prompt_embeds=pooled,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
