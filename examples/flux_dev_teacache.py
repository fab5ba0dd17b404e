"""FLUX.1-dev with TeaCache (counterpart of the reference's
examples/flux.1-dev-teacache.py, which wraps the denoise loop in
nunchaku.caching.teacache.TeaCache(model, num_steps, rel_l1_thresh=0.3)).

TeaCache skips the whole transformer on steps where the accumulated,
polynomial-rescaled relative-L1 drift of the modulated first-block input
stays below the threshold, replaying the previous step's residual. Here it
is a cache mode of the pipeline (`cache="teacache"`): the decision is a
lax.cond inside one jitted scanned denoise loop, no module wrapping.
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
    ap.add_argument("--vae")
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--prompt",
                    default="A cute panda holding a sign that says hello world")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--rel-l1-thresh", type=float, default=0.3,
                    help="larger = more skipped steps, lower quality "
                         "(reference example uses 0.3)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="flux_dev_teacache.npy")
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
        cache="teacache",
        teacache_rel_l1_thresh=args.rel_l1_thresh,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape} "
          f"cache_hits={int(out.cache_hits)}/{args.steps}")


if __name__ == "__main__":
    main()
