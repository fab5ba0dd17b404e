"""SDXL / SDXL-Turbo text-to-image with the quantized W8A8 UNet
(counterpart of the reference's examples/v1/sdxl.py and sdxl-turbo.py,
which drive nunchaku's int4 SDXL UNet through diffusers'
StableDiffusionXLPipeline).

Text encoding: SDXL concatenates CLIP-L (768) and OpenCLIP-G (1280)
penultimate hidden states to 2048 channels and takes CLIP-G's pooled
output — precompute them host-side (transformers) and pass the .npy
paths, mirroring how the other examples treat heavyweight encoders.

Turbo preset (--turbo): 4 steps, guidance 0.0, matching sdxl-turbo.py
(num_inference_steps=4, guidance_scale=0).
"""

import argparse

import numpy as np

from nunchaku_tpu import SDXLPipeline, load_autoencoder, load_sdxl_unet


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unet", required=True,
                    help="svdq-int4_r32-sdxl.safetensors (or sdxl-turbo)")
    ap.add_argument("--vae", help="SDXL VAE safetensors (optional; latents "
                                  "are saved when absent)")
    ap.add_argument("--prompt-embeds", required=True,
                    help=".npy (B, 77, 2048) CLIP-L||CLIP-G hidden states")
    ap.add_argument("--pooled-embeds", required=True,
                    help=".npy (B, 1280) CLIP-G pooled output")
    ap.add_argument("--negative-embeds",
                    help=".npy (B, 77, 2048) for the CFG negative branch")
    ap.add_argument("--negative-pooled", help=".npy (B, 1280)")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--guidance", type=float, default=5.0)
    ap.add_argument("--turbo", action="store_true",
                    help="SDXL-Turbo preset: 4 steps, guidance 0.0")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="sdxl.npy")
    args = ap.parse_args()
    if args.turbo:
        args.steps, args.guidance = 4, 0.0

    pipe = SDXLPipeline(
        load_sdxl_unet(args.unet),
        vae=load_autoencoder(args.vae) if args.vae else None,
    )
    out = pipe(
        prompt_embeds=np.load(args.prompt_embeds),
        pooled_prompt_embeds=np.load(args.pooled_embeds),
        negative_prompt_embeds=(
            np.load(args.negative_embeds) if args.negative_embeds else None
        ),
        negative_pooled_prompt_embeds=(
            np.load(args.negative_pooled) if args.negative_pooled else None
        ),
        height=args.size,
        width=args.size,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
