"""Qwen-Image + ControlNet-Union (counterpart of the reference's
examples/v1/qwen-image-controlnet.py): a diffusers-format
QwenImageControlNetModel (e.g. InstantX/Qwen-Image-ControlNet-Union,
unquantized bf16) runs next to the quantized transformer every step; its
per-block residuals are added inside the transformer scan with the
ceil-interval rule.

Prompt embeddings come from Qwen2.5-VL — precompute them as .npy or pass
--qwen <dir> to encode on CPU via transformers (see qwen_image_t2i.py).
The control image (depth/canny/pose/...) is a preprocessed (H, W, 3) image
in [0, 1], passed as .npy.
"""

import argparse

import numpy as np
import jax.numpy as jnp

from nunchaku_tpu import QwenImagePipeline, load_autoencoder, load_qwenimage_transformer
from nunchaku_tpu.models.transformers.controlnet_qwenimage import (
    load_qwenimage_controlnet,
)
from examples.qwen_image_t2i import encode_with_transformers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4_r32-qwen-image safetensors")
    ap.add_argument("--controlnet", required=True,
                    help="diffusers QwenImageControlNetModel safetensors")
    ap.add_argument("--vae", required=True,
                    help="Qwen-Image VAE (needed to encode the control image)")
    ap.add_argument("--control-image", required=True,
                    help=".npy (H, W, 3) or (B, H, W, 3) f32 in [0, 1]")
    ap.add_argument("--control-scale", type=float, default=1.0)
    ap.add_argument("--prompt-embeds", help=".npy (B, S, 3584) VL hidden states")
    ap.add_argument("--negative-embeds", help=".npy for true-CFG negative branch")
    ap.add_argument("--qwen", help="Qwen2.5-VL-7B-Instruct dir (CPU encode)")
    ap.add_argument("--prompt", default="A minimalist living room, natural light")
    ap.add_argument("--negative-prompt", default=" ")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--true-cfg", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="qwen_image_controlnet.npy")
    args = ap.parse_args()

    if args.prompt_embeds:
        pe = np.load(args.prompt_embeds)
        ne = np.load(args.negative_embeds) if args.negative_embeds else None
    elif args.qwen:
        pe = encode_with_transformers(args.qwen, [args.prompt])
        ne = encode_with_transformers(args.qwen, [args.negative_prompt])
    else:
        raise SystemExit("pass --prompt-embeds or --qwen")

    control = np.load(args.control_image).astype(np.float32)
    if control.ndim == 3:
        control = control[None]

    pipe = QwenImagePipeline(
        load_qwenimage_transformer(args.transformer),
        vae=load_autoencoder(args.vae),
        controlnet=load_qwenimage_controlnet(args.controlnet),
    )
    out = pipe(
        prompt_embeds=jnp.asarray(pe, jnp.bfloat16),
        negative_prompt_embeds=None if ne is None else jnp.asarray(ne, jnp.bfloat16),
        height=control.shape[1],
        width=control.shape[2],
        num_inference_steps=args.steps,
        true_cfg_scale=args.true_cfg,
        seed=args.seed,
        control_image=jnp.asarray(control),
        controlnet_conditioning_scale=args.control_scale,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
