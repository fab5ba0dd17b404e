"""FLUX.1-Canny/Depth-dev structural control (counterpart of the reference's
examples/v1/flux.1-canny-dev.py / flux.1-depth-dev.py).

These official control variants channel-concatenate the VAE-encoded control
image with the latents (in_channels 128 = 64 noise + 64 control); the
preprocessed control map (canny edges / depth) is produced host-side
(cv2 / DepthAnything in the reference) and passed here as .npy.
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
                    help="svdq-int4_r32-flux.1-canny-dev (or depth) safetensors")
    ap.add_argument("--vae", required=True)
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--control-image", required=True,
                    help=".npy (H, W, 3) preprocessed canny/depth map in [0,1]")
    ap.add_argument("--prompt", default="a robot made of exotic candies")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=30.0,
                    help="canny uses 30.0; depth uses 10.0 (reference defaults)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="flux_control.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer)
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae),
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )

    ctrl = np.load(args.control_image)[None]  # (1, H, W, 3)
    h, w = ctrl.shape[1], ctrl.shape[2]
    control_latents = pipe.prepare_control(ctrl)

    out = pipe(
        prompt=args.prompt,
        height=h,
        width=w,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
        control_latents=control_latents,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
