"""FLUX.1-Kontext editing with TeaCache (counterpart of the reference's
examples/flux.1-kontext-dev-teacache.py: TeaCache(model_name="flux-kontext")
around the FluxKontextPipeline).

The kontext reference image rides the sequence axis (rope frame 1); TeaCache
uses the kontext-specific rescale polynomial (caching/teacache.py
COEFFICIENTS["flux-kontext"], the reference's coefficient set) because the
drift statistics of the edit task differ from t2i.
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
                    help="svdq-int4_r32-flux.1-kontext-dev.safetensors")
    ap.add_argument("--vae", required=True)
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--image", required=True, help=".npy (H, W, 3) in [0,1]")
    ap.add_argument("--prompt", default="Make the sky a dramatic sunset")
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--guidance", type=float, default=2.5)
    ap.add_argument("--rel-l1-thresh", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="kontext_teacache.npy")
    args = ap.parse_args()

    pipe = FluxPipeline(
        load_flux_transformer(args.transformer),
        vae=load_autoencoder(args.vae),
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )
    ref = np.load(args.image)[None]  # (1, H, W, 3)
    out = pipe(
        prompt=args.prompt,
        height=ref.shape[1],
        width=ref.shape[2],
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
        image=ref,
        cache="teacache",
        teacache_rel_l1_thresh=args.rel_l1_thresh,
        teacache_model_name="flux-kontext",
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape} "
          f"cache_hits={int(out.cache_hits)}/{args.steps}")


if __name__ == "__main__":
    main()
