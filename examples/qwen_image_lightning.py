"""Qwen-Image Lightning few-step generation (counterpart of the
reference's examples/v1/qwen-image-lightning.py: the Lightning-distilled
checkpoints fold a rank-128 distillation LoRA into the quantized weights
and run 4 or 8 steps with true-CFG disabled).

The preset pins the distilled recipe (num_inference_steps + true_cfg_scale
= 1.0, pipeline_qwenimage.LIGHTNING_PRESETS); pass the matching
svdq-int4_r128-qwen-image-lightningv1.0-{4,8}steps checkpoint.
"""

import argparse

import numpy as np

from nunchaku_tpu import (
    QwenImagePipeline,
    load_autoencoder,
    load_qwenimage_transformer,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4_r128-qwen-image-lightningv1.0-4steps"
                         ".safetensors")
    ap.add_argument("--vae")
    ap.add_argument("--prompt-embeds", required=True,
                    help=".npy (B, S, 3584) Qwen2.5-VL hidden states")
    ap.add_argument("--lightning", default="lightning-4step",
                    choices=["lightning-4step", "lightning-8step"])
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="qwen_image_lightning.npy")
    args = ap.parse_args()

    pipe = QwenImagePipeline(
        load_qwenimage_transformer(args.transformer),
        vae=load_autoencoder(args.vae) if args.vae else None,
    )
    out = pipe(
        prompt_embeds=np.load(args.prompt_embeds),
        height=args.size,
        width=args.size,
        lightning=args.lightning,
        seed=args.seed,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape} ({args.lightning})")


if __name__ == "__main__":
    main()
