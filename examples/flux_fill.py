"""FLUX.1-Fill-dev inpainting (counterpart of the reference's
examples/v1/flux.1-fill-dev.py).

Fill conditions on 320 extra channels: the VAE-encoded masked image (64)
plus the 8x8-patchified binary mask (256), channel-concatenated with the
noise latents (pipeline prepare_fill; diffusers FluxFillPipeline parity).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4_r32-flux.1-fill-dev safetensors")
    ap.add_argument("--vae", required=True)
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--image", required=True, help=".npy (H, W, 3) in [0,1]")
    ap.add_argument("--mask", required=True,
                    help=".npy (H, W) binary; 1 = region to repaint")
    ap.add_argument("--prompt", default="a white paper cup")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=30.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="flux_fill.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer)
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae),
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )

    img = jnp.asarray(np.load(args.image)[None], jnp.float32)
    mask = jnp.asarray(np.load(args.mask)[None], jnp.float32)
    h, w = img.shape[1], img.shape[2]
    cond = pipe.prepare_fill(img, mask)

    out = pipe(
        prompt=args.prompt,
        height=h,
        width=w,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
        control_latents=cond,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
