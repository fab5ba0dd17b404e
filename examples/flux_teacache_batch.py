"""Batched FLUX.1-dev generation under TeaCache (counterpart of the
reference's examples/flux.1-dev-teacache-batch.py: a list of prompts
through one TeaCache-wrapped pipeline call).

The whole batch shares one jitted scanned denoise loop; the TeaCache
decision (accumulated polynomial-rescaled rel-L1 drift vs threshold) is a
lax.cond carried per step — with B > 1 the drift statistic is computed
over the batch, matching the reference's single shared skip decision for
a batched call (caching/teacache.py).
"""

import argparse
import time

import numpy as np

from nunchaku_tpu import (
    FluxPipeline,
    load_autoencoder,
    load_clip_text,
    load_flux_transformer,
    load_t5_encoder,
)

PROMPTS = [
    "A cheerful woman in a pastel dress, holding a basket of colorful "
    "Easter eggs with a sign that says 'Happy Easter'",
    "A young peace activist with a gentle smile, holding a handmade sign "
    "that says 'Peace'",
    "A friendly chef wearing a tall white hat, holding a wooden spoon "
    "with a sign that says 'Let's Cook!'",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True)
    ap.add_argument("--vae")
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--prompt", action="append", default=None,
                    help="repeatable; defaults to the reference's 3 prompts")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--rel-l1-thresh", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="flux_teacache_batch.npy")
    args = ap.parse_args()
    prompts = args.prompt or PROMPTS

    pipe = FluxPipeline(
        load_flux_transformer(args.transformer),
        vae=load_autoencoder(args.vae) if args.vae else None,
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )
    t0 = time.time()
    out = pipe(
        prompt=prompts,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
        cache="teacache",
        teacache_rel_l1_thresh=args.rel_l1_thresh,
    )
    result = out.images if out.images is not None else out.latents
    result = np.asarray(result, np.float32)
    print(f"Time taken: {time.time() - t0:.2f} seconds "
          f"(batch={len(prompts)}, cache_hits={int(out.cache_hits)}/"
          f"{args.steps})")
    np.save(args.out, result)
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
