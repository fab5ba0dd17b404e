"""FLUX.1-Kontext editing with a style LoRA (counterpart of the
reference's examples/flux.1-kontext-FALAI_lora.py: the Kontext transformer
plus a kohya/diffusers LoRA folded onto the SVD branch before editing).

Apply order matters: fold the LoRA first, then enable the fused qkv
prologue (the prologue permutes q/k channels of the merged weights).
"""

import argparse

import numpy as np

from nunchaku_tpu import (
    FluxPipeline,
    load_autoencoder,
    load_flux_transformer,
    update_lora_params,
)
from nunchaku_tpu.utils.safetensors import load_safetensors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4_r32-flux.1-kontext-dev.safetensors")
    ap.add_argument("--vae", required=True)
    ap.add_argument("--lora", required=True, help="path[:strength]")
    ap.add_argument("--image", required=True, help=".npy (H, W, 3) in [0,1]")
    ap.add_argument("--prompt-embeds", required=True, help=".npy (B, S, 4096)")
    ap.add_argument("--pooled-embeds", required=True, help=".npy (B, 768)")
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--guidance", type=float, default=2.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="kontext_lora.npy")
    args = ap.parse_args()

    model = load_flux_transformer(args.transformer)
    path, _, s = args.lora.partition(":")
    sd, _ = load_safetensors(path)
    model = update_lora_params(model, sd, strength=float(s) if s else 1.0)
    model.enable_fused_qkv_prep()

    pipe = FluxPipeline(model, vae=load_autoencoder(args.vae))
    ref = np.load(args.image)[None]  # (1, H, W, 3)
    out = pipe(
        prompt_embeds=np.load(args.prompt_embeds),
        pooled_prompt_embeds=np.load(args.pooled_embeds),
        image=ref,
        height=ref.shape[1],
        width=ref.shape[2],
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
