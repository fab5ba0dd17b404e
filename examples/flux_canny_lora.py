"""FLUX.1-Canny via control LoRA on the BASE dev checkpoint (counterpart
of the reference's examples/flux.1-canny-dev-lora.py: load the quantized
canny-dev transformer, fold FLUX.1-Canny-dev-lora on top at strength 0.85,
drive it as a FluxControlPipeline). Works identically for the depth LoRA
(flux.1-depth-dev-lora.py) — pass the depth control map and LoRA instead.

The control map is preprocessed host-side (cv2 Canny / DepthAnything in
the reference) and passed as .npy; ``prepare_control`` VAE-encodes and
channel-concatenates it (in_channels 128 = 64 noise + 64 control).
"""

import argparse

import numpy as np

from nunchaku_tpu import (
    FluxPipeline,
    load_autoencoder,
    load_clip_text,
    load_flux_transformer,
    load_t5_encoder,
    set_lora_strength,
    update_lora_params,
)
from nunchaku_tpu.utils.safetensors import load_safetensors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4_r32-flux.1-canny-dev.safetensors")
    ap.add_argument("--lora", required=True,
                    help="flux1-canny-dev-lora.safetensors (or depth)")
    ap.add_argument("--lora-strength", type=float, default=0.85,
                    help="reference example uses 0.85")
    ap.add_argument("--vae", required=True)
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--control-image", required=True,
                    help=".npy (H, W, 3) canny edge / depth map in [0,1]")
    ap.add_argument("--prompt",
                    default="A robot made of exotic candies and chocolates "
                            "of different kinds.")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=30.0,
                    help="canny uses 30.0; depth uses 10.0")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="flux_canny_lora.npy")
    args = ap.parse_args()

    model = load_flux_transformer(args.transformer)
    sd, _ = load_safetensors(args.lora)
    model = update_lora_params(model, sd)
    model = set_lora_strength(model, args.lora_strength)

    pipe = FluxPipeline(
        model,
        vae=load_autoencoder(args.vae),
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )

    ctrl = np.load(args.control_image)[None]  # (1, H, W, 3)
    h, w = ctrl.shape[1], ctrl.shape[2]
    out = pipe(
        prompt=args.prompt,
        height=h,
        width=w,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
        control_latents=pipe.prepare_control(ctrl),
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
