"""Qwen-Image text-to-image (counterpart of the reference's
examples/v1/qwen-image.py family, incl. the Lightning few-step presets).

Qwen-Image conditions on Qwen2.5-VL hidden states. The VL model is a
host-side text encoder (the reference loads it via transformers too);
precompute embeddings with::

    from transformers import Qwen2_5_VLForConditionalGeneration, AutoProcessor
    ...  # encode prompt, save last_hidden_state as .npy

or pass --qwen <dir> to run the transformers encoder on CPU here.
"""

import argparse

import numpy as np
import jax.numpy as jnp

from nunchaku_tpu import QwenImagePipeline, load_autoencoder, load_qwenimage_transformer


def encode_with_transformers(model_dir: str, prompts: list[str]) -> np.ndarray:
    """Reference encode path (diffusers QwenImagePipeline.encode_prompt):
    chat-template wrap, drop the template prefix, keep hidden states."""
    import torch
    from transformers import AutoProcessor, Qwen2_5_VLForConditionalGeneration

    template = (
        "<|im_start|>system\nDescribe the image by detailing the color, shape, "
        "size, texture, quantity, text, spatial relationships of the objects "
        "and background:<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    drop_idx = 34
    proc = AutoProcessor.from_pretrained(model_dir, local_files_only=True)
    model = Qwen2_5_VLForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32, local_files_only=True
    )
    texts = [template.format(p) for p in prompts]
    inputs = proc(text=texts, return_tensors="pt", padding=True)
    with torch.no_grad():
        hs = model(**inputs, output_hidden_states=True).hidden_states[-1]
    return hs[:, drop_idx:].float().numpy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4_r32-qwen-image safetensors")
    ap.add_argument("--vae")
    ap.add_argument("--prompt-embeds", help=".npy (B, S, 3584) Qwen2.5-VL hidden states")
    ap.add_argument("--negative-embeds", help=".npy for true-CFG negative branch")
    ap.add_argument("--qwen", help="Qwen2.5-VL-7B-Instruct dir (CPU transformers encode)")
    ap.add_argument("--prompt", default="A coffee shop entrance with a chalkboard sign")
    ap.add_argument("--negative-prompt", default=" ")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--true-cfg", type=float, default=4.0)
    ap.add_argument("--lightning", choices=["lightning-4step", "lightning-8step"])
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="qwen_image.npy")
    args = ap.parse_args()

    if args.prompt_embeds:
        pe = np.load(args.prompt_embeds)
        ne = np.load(args.negative_embeds) if args.negative_embeds else None
    elif args.qwen:
        pe = encode_with_transformers(args.qwen, [args.prompt])
        ne = encode_with_transformers(args.qwen, [args.negative_prompt])
    else:
        raise SystemExit("pass --prompt-embeds or --qwen")

    pipe = QwenImagePipeline(
        load_qwenimage_transformer(args.transformer),
        vae=load_autoencoder(args.vae) if args.vae else None,
    )
    out = pipe(
        prompt_embeds=jnp.asarray(pe, jnp.bfloat16),
        negative_prompt_embeds=None if ne is None else jnp.asarray(ne, jnp.bfloat16),
        height=args.size,
        width=args.size,
        num_inference_steps=args.steps,
        true_cfg_scale=args.true_cfg,
        seed=args.seed,
        lightning=args.lightning,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
