"""FLUX.1-dev with the 4-bit quantized T5 text encoder (counterpart of the
reference's examples/flux.1-dev-qencoder.py: text_encoder_2 is the nunchaku
AWQ W4A16 TinyChat T5-XXL — ~9 GB of encoder weights drop to ~2.5 GB).

On TPU the AWQ groups decode through the Pallas gemv/GEMM family
(nunchaku_tpu/ops/gemv.py); the encoder rides the same load_t5_encoder
entry point — the file's own metadata selects the 4-bit path.
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
                    help="svdq-int4_r32-flux.1-dev.safetensors")
    ap.add_argument("--qencoder", required=True,
                    help="awq-int4-flux.1-t5xxl.safetensors (TinyChat)")
    ap.add_argument("--clip")
    ap.add_argument("--vae")
    ap.add_argument("--prompt", default="A cat holding a sign that says hello world")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="flux_qencoder.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer)
    transformer.enable_fused_qkv_prep()
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae) if args.vae else None,
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.qencoder),
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
