"""FLUX.1-Kontext image editing (counterpart of the reference's
examples/v1/flux.1-kontext-dev.py, which drives diffusers'
FluxKontextPipeline with the nunchaku transformer).

The reference image is VAE-encoded, packed, and appended to the latent
sequence with rope frame index 1 (pipeline_flux.py prepare_kontext); the
transformer attends jointly and only the generated-image rows integrate.
"""

import argparse

import numpy as np

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
                    help="svdq-int4_r32-flux.1-kontext-dev.safetensors")
    ap.add_argument("--vae", required=True)
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--image", required=True, help=".npy (H, W, 3) in [0,1]")
    ap.add_argument("--prompt", default="Make the sky a dramatic sunset")
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--guidance", type=float, default=2.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--precision", choices=["int4", "nvfp4", "int8"], default=None)
    ap.add_argument("--out", default="kontext_edit.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer, precision=args.precision)
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae),
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )

    ref = np.load(args.image)[None]  # (1, H, W, 3)
    h, w = ref.shape[1], ref.shape[2]
    out = pipe(
        prompt=args.prompt,
        height=h,
        width=w,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
        image=ref,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
