"""FLUX LoRA inference (counterpart of examples/v1/flux.1-dev-lora.py):
load a quantized checkpoint, fold any kohya/diffusers LoRA onto the SVD
branch, optionally compose several with strengths."""

import argparse

import numpy as np

from nunchaku_tpu import (
    FluxPipeline,
    compose_lora,
    load_flux_transformer,
    update_lora_params,
)
from nunchaku_tpu.utils.safetensors import load_safetensors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True)
    ap.add_argument("--lora", action="append", required=True,
                    help="path[:strength], repeatable for composition")
    ap.add_argument("--prompt", default="GHIBSKY style, a serene mountain lake")
    ap.add_argument("--steps", type=int, default=25)
    args = ap.parse_args()

    model = load_flux_transformer(args.transformer)

    loras = []
    for spec in args.lora:
        path, _, s = spec.partition(":")
        sd, _ = load_safetensors(path)
        loras.append((sd, float(s) if s else 1.0))
    if len(loras) == 1:
        model = update_lora_params(model, loras[0][0], strength=loras[0][1])
    else:
        model = update_lora_params(model, compose_lora(loras))

    pipe = FluxPipeline(model)
    out = pipe(
        prompt_embeds=np.load("prompt_embeds.npy"),
        pooled_prompt_embeds=np.load("pooled_embeds.npy"),
        num_inference_steps=args.steps,
    )
    np.save("flux_lora_latents.npy", np.asarray(out.latents, np.float32))


if __name__ == "__main__":
    main()
