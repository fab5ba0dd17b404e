"""Z-Image-Turbo text-to-image (counterpart of the reference's
examples/v1/z-image-turbo.py, which drives diffusers' ZImagePipeline with
the nunchaku transformer; here the pipeline is TPU-native too).

Z-Image conditions on a Qwen-family text encoder's hidden states. Pass
them precomputed (--prompt-embeds .npy) or let the transformers encoder
run on CPU (--qwen <dir>).
"""

import argparse

import numpy as np
import jax.numpy as jnp

from nunchaku_tpu import ZImagePipeline, load_autoencoder, load_zimage_transformer


def encode_with_transformers(model_dir: str, prompts: list[str]) -> np.ndarray:
    import torch
    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_dir, local_files_only=True)
    model = AutoModel.from_pretrained(
        model_dir, torch_dtype=torch.float32, local_files_only=True
    )
    inputs = tok(prompts, return_tensors="pt", padding=True)
    with torch.no_grad():
        hs = model(**inputs, output_hidden_states=True).hidden_states[-1]
    return hs.float().numpy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4_r32-z-image-turbo.safetensors")
    ap.add_argument("--vae")
    ap.add_argument("--prompt-embeds", help=".npy (B, S, cap_feat_dim)")
    ap.add_argument("--qwen", help="text encoder dir (CPU transformers encode)")
    ap.add_argument("--prompt", default="a young military male cooking in the kitchen")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--guidance", type=float, default=0.0,
                    help="0 for the Turbo models (reference default)")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=12345)
    ap.add_argument("--precision", choices=["int4", "nvfp4", "int8", "w4a8"], default=None)
    ap.add_argument("--out", default="zimage_turbo.npy")
    args = ap.parse_args()

    if args.prompt_embeds:
        pe = np.load(args.prompt_embeds)
    elif args.qwen:
        pe = encode_with_transformers(args.qwen, [args.prompt])
    else:
        raise SystemExit("pass --prompt-embeds or --qwen")

    pipe = ZImagePipeline(
        load_zimage_transformer(args.transformer, precision=args.precision),
        vae=load_autoencoder(args.vae) if args.vae else None,
    )
    out = pipe(
        prompt_embeds=jnp.asarray(pe, jnp.bfloat16),
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
