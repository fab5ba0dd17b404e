"""FLUX.1-schnell 4-step text-to-image (counterpart of the reference's
examples/v1/flux.1-schnell.py).

schnell is the timestep-distilled variant: no guidance embedding
(guidance_embeds=False in the checkpoint metadata — the loader picks this
up), 4 steps, guidance_scale 0.
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
                    help="svdq-int4_r32-flux.1-schnell.safetensors")
    ap.add_argument("--vae")
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--prompt", default="A cat holding a sign that says hello world")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--precision", choices=["int4", "nvfp4", "int8", "w4a8"], default=None)
    ap.add_argument("--out", default="flux_schnell.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer, precision=args.precision)
    # fused attention prologue (call after any LoRA application)
    transformer.enable_fused_qkv_prep()
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae) if args.vae else None,
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )
    out = pipe(
        prompt=args.prompt,
        height=args.size,
        width=args.size,
        num_inference_steps=args.steps,
        guidance_scale=0.0,
        seed=args.seed,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
