"""SANA 1.6B text-to-image (counterpart of the reference's
examples/sana1.6b.py / sana1.6b_pag.py).

Stack: Gemma-2 text encoder -> SVDQuant SANA transformer (LiteLA linear
attention + GLUMBConv) -> DC-AE 32x autoencoder. PAG (perturbed-attention
guidance) via --pag-scale.
"""

import argparse

import numpy as np

from nunchaku_tpu import (
    load_dc_ae,
    load_gemma2_encoder,
    load_sana_transformer,
)
from nunchaku_tpu.pipeline.pipeline_sana import SanaPipeline
from nunchaku_tpu.pipeline.tokenizers import gemma_tokenizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4-sana1.6b safetensors")
    ap.add_argument("--dc-ae", help="mit-han-lab/dc-ae-f32c32-sana-1.0 state dict")
    ap.add_argument("--gemma", help="google/gemma-2-2b-it state dict")
    ap.add_argument("--tokenizer", help="gemma tokenizer dir")
    ap.add_argument("--prompt", default="A cute 🐼 eating 🎋, ink drawing style")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--guidance", type=float, default=4.5)
    ap.add_argument("--pag-scale", type=float, default=0.0,
                    help="2.0 enables PAG (the reference's sana1.6b_pag.py)")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cache", choices=["fb"], default=None)
    ap.add_argument("--out", default="sana.npy")
    args = ap.parse_args()

    pipe = SanaPipeline(
        load_sana_transformer(args.transformer),
        vae=load_dc_ae(args.dc_ae) if args.dc_ae else None,
        text_encoder=load_gemma2_encoder(args.gemma) if args.gemma else None,
        tokenizer=gemma_tokenizer(args.tokenizer) if args.tokenizer else None,
    )
    out = pipe(
        prompt=args.prompt,
        height=args.size,
        width=args.size,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        pag_scale=args.pag_scale,
        seed=args.seed,
        cache=args.cache,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
