"""SANA 1.6B with Perturbed-Attention Guidance (counterpart of the
reference's examples/sana1.6b_pag.py: NunchakuSanaTransformer2DModel(
pag_layers=8) inside diffusers' SanaPAGPipeline, pag_scale=2.0).

PAG runs a third batch branch whose attention on the configured layers is
replaced by the learned identity path (pag_to_v value projection,
SanaModel.cpp:108-145) and steers away from it:

    v = v_uncond + guidance*(v_text - v_uncond) + pag_scale*(v_text - v_ptb)

The PAG layer set comes from the checkpoint (cfg.pag_layers — the loader
records which blocks carry real pag_to_v weights).
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
                    help="svdq-int4_r32-sana1.6b safetensors (PAG variant)")
    ap.add_argument("--dc-ae", help="mit-han-lab/dc-ae-f32c32-sana-1.0 state dict")
    ap.add_argument("--gemma", help="google/gemma-2-2b-it state dict")
    ap.add_argument("--tokenizer", help="gemma tokenizer dir")
    ap.add_argument("--prompt", default="A cute 🐼 eating 🎋, ink drawing style")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--guidance", type=float, default=5.0)
    ap.add_argument("--pag-scale", type=float, default=2.0)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="sana_pag.npy")
    args = ap.parse_args()

    transformer = load_sana_transformer(args.transformer)
    if transformer.cfg.pag_layers is None:
        raise SystemExit("checkpoint has no pag_to_v projections — use the "
                         "PAG SANA checkpoint")
    print(f"PAG layers: {list(transformer.cfg.pag_layers)}")

    pipe = SanaPipeline(
        transformer,
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
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
