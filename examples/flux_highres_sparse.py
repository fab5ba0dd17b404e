"""2048px FLUX generation with block-sparse attention (the reference's
high-resolution path: set_attention_impl("blocksparse"), FluxModel.cpp
mha_fwd_block / Block-Sparse-Attention).

At 2048px the joint sequence is ~16.9K tokens; dense attention is O(S^2).
The pooled top-k block selector keeps each 768-token query block's best
(1 - sparsity_ratio) fraction of 1536-token kv blocks.
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
    ap.add_argument("--prompt", default="an aerial photograph of a coastal city at dawn")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--sparsity", type=float, default=0.5,
                    help="fraction of kv blocks dropped per query block")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="flux_2048.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer)
    if args.sparsity > 0:
        transformer.set_attention_impl("blocksparse", sparsity_ratio=args.sparsity)
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
        guidance_scale=args.guidance,
        seed=args.seed,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
