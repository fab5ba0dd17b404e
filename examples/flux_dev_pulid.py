"""FLUX.1-dev + PuLID identity-preserving generation (counterpart of the
reference's examples/flux.1-dev-pulid.py / pipeline_flux_pulid.py:87-771).

The ID image runs through the EVA02-CLIP tower; IDFormer fuses its patch
features with the (host-provided) face-recognition embedding into 32 ID
tokens, which the per-layer pulid_ca cross-attention adapters inject every
2 dual / 4 single layers (FluxModel.cpp:1301,1335 cadence).

Face detection/alignment (insightface in the reference) is a host-side
preprocessing step; pass an aligned 336x336 face crop, or supply
--id-embedding from an external recognition model for the full ante-hoc
path.
"""

import argparse

import numpy as np

from nunchaku_tpu import (
    PuLIDFluxPipeline,
    load_autoencoder,
    load_clip_text,
    load_flux_transformer,
    load_t5_encoder,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True)
    ap.add_argument("--pulid", required=True, help="guozinan/PuLID pulid_flux_v0.9.1.safetensors")
    ap.add_argument("--eva-clip", required=True, help="EVA02-CLIP-L-14-336 state dict")
    ap.add_argument("--id-image", required=True, help=".npy aligned face crop (H, W, 3) in [0,1]")
    ap.add_argument("--id-embedding", help=".npy (512,) antelopev2 recognition embedding")
    ap.add_argument("--vae")
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--prompt", default="portrait, superman costume, city background")
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--id-weight", type=float, default=1.0)
    ap.add_argument("--out", default="flux_pulid.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer)
    pipe = PuLIDFluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae) if args.vae else None,
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    ).load_pulid_weights(args.pulid, args.eva_clip)

    id_image = np.load(args.id_image)
    id_embeddings = None
    if args.id_embedding:
        id_embeddings, _ = pipe.get_id_embedding(
            id_image, id_ante_embedding=np.load(args.id_embedding)
        )
    out = pipe(
        prompt=args.prompt,
        height=args.size,
        width=args.size,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
        id_image=id_image,
        id_embeddings=id_embeddings,
        id_weight=args.id_weight,
    )
    result = out.images if out.images is not None else out.latents
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
