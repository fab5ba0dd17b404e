"""Qwen-Image-Edit / Edit-2509 image editing (counterpart of the
reference's examples/v1/qwen-image-edit.py, qwen-image-edit-2509.py and
their Lightning variants).

The edit checkpoints share the Qwen-Image transformer; conditioning images
are VAE-encoded and appended to the image token sequence with rope frame
index i+1 (QwenImagePipeline.prepare_edit). Prompt embeds come from
Qwen2.5-VL *with the image(s) in the chat template* — precompute them with
transformers (the reference encodes through diffusers the same way) and
pass --prompt-embeds, or use --qwen for a CPU transformers encode of the
text-only template (approximate: skips the vision tokens).
"""

import argparse

import numpy as np
import jax.numpy as jnp

from nunchaku_tpu import QwenImagePipeline, load_autoencoder, load_qwenimage_transformer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4_r32-qwen-image-edit[-2509] safetensors")
    ap.add_argument("--vae", required=True)
    ap.add_argument("--image", required=True, nargs="+",
                    help=".npy (H, W, 3) in [0,1]; multiple for edit-2509")
    ap.add_argument("--prompt-embeds", required=True,
                    help=".npy (B, S, 3584) Qwen2.5-VL hidden states "
                         "(image+text chat template)")
    ap.add_argument("--negative-embeds")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--true-cfg", type=float, default=4.0)
    ap.add_argument("--lightning", choices=["lightning-4step", "lightning-8step"])
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--precision", choices=["int4", "nvfp4", "int8", "w4a8"],
                    default=None)
    ap.add_argument("--out", default="qwen_image_edit.npy")
    args = ap.parse_args()

    pipe = QwenImagePipeline(
        load_qwenimage_transformer(args.transformer, precision=args.precision),
        vae=load_autoencoder(args.vae),
    )
    pe = jnp.asarray(np.load(args.prompt_embeds), jnp.bfloat16)
    ne = (jnp.asarray(np.load(args.negative_embeds), jnp.bfloat16)
          if args.negative_embeds else None)
    images = [np.load(p)[None] for p in args.image]

    out = pipe(
        pe,
        negative_prompt_embeds=ne,
        height=args.size,
        width=args.size,
        num_inference_steps=args.steps,
        true_cfg_scale=args.true_cfg,
        seed=args.seed,
        lightning=args.lightning,
        image=images,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
