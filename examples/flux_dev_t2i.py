"""FLUX.1-dev text-to-image (counterpart of the reference's
examples/v1/flux.1-dev.py, running on TPU).

Expects local checkpoint files (the engine is offline-first):
  --transformer  svdq-int4_r32-flux.1-dev.safetensors   (nunchaku format)
  --vae          diffusers AutoencoderKL safetensors
  --t5 / --clip  text encoder state dicts (HF format; T5 may be the 4-bit
                 nunchaku TinyChat file)
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
    ap.add_argument("--transformer", required=True)
    ap.add_argument("--vae")
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--prompt", default="A cat holding a sign that says hello world")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--precision", choices=["int4", "nvfp4", "int8"], default=None,
                    help="int8 = TPU turbo requantization of the same checkpoint")
    ap.add_argument("--cache", choices=["fb", "double_fb", "teacache"], default=None)
    ap.add_argument("--out", default="flux_dev.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer, precision=args.precision)
    # fused attention prologue (call after any LoRA application)
    transformer.enable_fused_qkv_prep()
    vae = load_autoencoder(args.vae) if args.vae else None
    t5 = load_t5_encoder(args.t5) if args.t5 else None
    clip = load_clip_text(args.clip) if args.clip else None
    pipe = FluxPipeline(transformer, vae=vae, text_encoder=clip, text_encoder_2=t5)

    out = pipe(
        prompt=args.prompt,
        height=args.size,
        width=args.size,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
        cache=args.cache,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
