"""FLUX.1-dev with first-block caching (counterpart of the reference's
examples/flux.1-dev-cache.py, flux.1-dev-double_cache.py and the
cache-dit demo flux.1-dev-cache-dit.py — a DBCacheConfig with
Fn_compute_blocks=1, Bn_compute_blocks=0, residual_diff_threshold=0.12 is
exactly this FB cache).

Run block 0 each step; when its residual matches the previous step's
(mean relative L1 < threshold) replay the cached residual of the other 56
blocks. --double adds the independent second decision at single block 0
(double FB cache). The whole denoise loop stays one jitted scan — the
decision is a lax.cond, not a graph break.
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
    ap.add_argument("--prompt",
                    default="A cat holding a sign that says hello world")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--double", action="store_true",
                    help="double FB cache (second decision at single block 0)")
    ap.add_argument("--threshold", type=float, default=0.12)
    ap.add_argument("--single-threshold", type=float, default=0.09)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="flux_dev_cache.npy")
    args = ap.parse_args()

    pipe = FluxPipeline(
        load_flux_transformer(args.transformer),
        vae=load_autoencoder(args.vae) if args.vae else None,
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )
    out = pipe(
        prompt=args.prompt,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
        cache="double_fb" if args.double else "fb",
        residual_diff_threshold=args.threshold,
        single_residual_diff_threshold=args.single_threshold,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape} "
          f"cache_hits={int(out.cache_hits)}/{args.steps}")


if __name__ == "__main__":
    main()
