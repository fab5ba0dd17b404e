"""One-step sketch-to-image with the pix2pix-turbo control module
(counterpart of the reference's app/flux.1/sketch/run.py): binarize+erode a
sketch, VAE-encode, mix with noise at strength alpha, single transformer
evaluation at t=1 (pipeline/pipeline_flux_pix2pix.py)."""

import argparse

import numpy as np

from nunchaku_tpu import (
    FluxPix2pixTurboPipeline,
    load_autoencoder,
    load_clip_text,
    load_flux_transformer,
    load_t5_encoder,
)
from nunchaku_tpu.utils.safetensors import load_safetensors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True, help="schnell checkpoint")
    ap.add_argument("--control", required=True, help="sketch.safetensors LoRA")
    ap.add_argument("--vae", required=True)
    ap.add_argument("--t5", required=True)
    ap.add_argument("--clip", required=True)
    ap.add_argument("--sketch", required=True, help="input sketch (png)")
    ap.add_argument("--prompt", default="a cat")
    ap.add_argument("--alpha", type=float, default=0.4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--output", default="sketch_out.png")
    args = ap.parse_args()

    from PIL import Image

    pipe = FluxPix2pixTurboPipeline(
        load_flux_transformer(args.transformer),
        vae=load_autoencoder(args.vae),
        text_encoder=load_clip_text(args.clip),
        text_encoder_2=load_t5_encoder(args.t5),
    )
    pipe.load_control_module(load_safetensors(args.control)[0], alpha=args.alpha)

    img = Image.open(args.sketch).convert("RGB").resize((1024, 1024))
    x = (np.asarray(img, np.float32) / 255.0)[None]
    out = pipe(x, prompt=args.prompt, alpha=args.alpha, seed=args.seed)
    res = np.clip(np.asarray(out.images[0], np.float32) * 255, 0, 255).astype(np.uint8)
    Image.fromarray(res).save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
