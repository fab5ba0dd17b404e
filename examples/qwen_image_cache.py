"""Qwen-Image with first-block caching (counterpart of the reference's
examples/v1/qwen-image-cache-dit.py: cache-dit DBCache with
Fn_compute_blocks=8 / Bn=0 — blocks 0..7 are the decision indicator, the
remaining 52 blocks' residual is replayed when the indicator residual is
within the threshold; --fn-blocks selects the indicator depth, 1 = the
FLUX-style first-block variant).

Here the cache is a ``lax.cond`` carry inside the jitted denoise loop
(nunchaku_tpu/caching/fbcache.py qwenimage_fb_cached_forward); each true-CFG
branch keeps its own cache state. Reports the realized hit count.
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
                    help="svdq-int4_r128-qwen-image.safetensors")
    ap.add_argument("--vae")
    ap.add_argument("--prompt-embeds", required=True,
                    help=".npy (B, S, 3584) Qwen2.5-VL hidden states")
    ap.add_argument("--negative-prompt-embeds",
                    help=".npy for the true-CFG negative branch")
    ap.add_argument("--threshold", type=float, default=0.12,
                    help="indicator residual_diff_threshold")
    ap.add_argument("--fn-blocks", type=int, default=8,
                    help="Fn_compute_blocks indicator depth (reference "
                         "qwen example: 8; 1 = FLUX-style first-block)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cfg", type=float, default=4.0)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="qwen_image_cache.npy")
    args = ap.parse_args()

    pipe = QwenImagePipeline(
        load_qwenimage_transformer(args.transformer),
        vae=load_autoencoder(args.vae) if args.vae else None,
    )
    npe = (np.load(args.negative_prompt_embeds)
           if args.negative_prompt_embeds else None)
    out = pipe(
        prompt_embeds=np.load(args.prompt_embeds),
        negative_prompt_embeds=npe,
        height=args.size,
        width=args.size,
        num_inference_steps=args.steps,
        true_cfg_scale=args.cfg,
        seed=args.seed,
        cache="fb",
        residual_diff_threshold=args.threshold,
        fn_blocks=args.fn_blocks,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    # cache_hits sums both CFG branches' independent decisions
    max_hits = (args.steps - 1) * (
        2 if (npe is not None and args.cfg > 1.0) else 1
    )
    print(f"saved {args.out} shape={result.shape} "
          f"cache_hits={int(out.cache_hits)}/{max_hits}")


if __name__ == "__main__":
    main()
