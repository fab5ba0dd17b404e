"""FLUX.1-dev + XLabs IP-Adapter image prompting (counterpart of the
reference's examples/flux.1-dev-IP-adapter.py which drives
apply_IPA_on_pipe; loader schema per nunchaku/models/ip_adapter/utils.py).

The reference image runs through the CLIP vision tower; its pooled
embedding is projected to ip tokens (ImageProjection) and injected as
extra K/V into every dual-stream block's image attention (ipa_forward).
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from nunchaku_tpu import (
    FluxPipeline,
    load_autoencoder,
    load_clip_text,
    load_clip_vision,
    load_flux_ip_adapter,
    load_flux_transformer,
    load_t5_encoder,
    preprocess_clip_image,
)
from nunchaku_tpu.models.ip_adapter.flux import ipa_forward
from nunchaku_tpu.pipeline.pipeline_flux import make_img_ids, unpack_latents
from nunchaku_tpu.pipeline.scheduler import euler_step, flux_sigmas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True)
    ap.add_argument("--ip-adapter", required=True,
                    help="XLabs-AI/flux-ip-adapter(-v2) safetensors")
    ap.add_argument("--clip-vision", required=True,
                    help="openai/clip-vit-large-patch14 state dict")
    ap.add_argument("--image", required=True, help=".npy (H, W, 3) in [0,1]")
    ap.add_argument("--vae")
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--prompt", default="a person in a sunflower field")
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ip-scale", type=float, default=1.0)
    ap.add_argument("--out", default="flux_ipa.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer)
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae) if args.vae else None,
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )
    prompt_embeds, pooled = pipe.encode_prompt(args.prompt)

    vision = load_clip_vision(args.clip_vision)
    pixels = preprocess_clip_image(np.load(args.image))
    image_embeds, _ = vision(pixels)  # pooled CLIP embedding (B, proj_dim)
    ipa = load_flux_ip_adapter(args.ip_adapter, scale=args.ip_scale)

    lh, lw = args.size // 8, args.size // 8
    s_img = (lh // 2) * (lw // 2)
    lat = jax.random.normal(jax.random.PRNGKey(args.seed), (1, s_img, 64), jnp.float32)
    img_ids = make_img_ids(lh // 2, lw // 2)
    txt_ids = jnp.zeros((prompt_embeds.shape[1], 3), jnp.int32)
    guidance = jnp.array([args.guidance], jnp.float32)
    sigmas = flux_sigmas(args.steps, s_img)

    fwd = jax.jit(lambda m, a, ie, *ar: ipa_forward(m, a, ie, *ar))
    for i in range(args.steps):
        t = jnp.full((1,), float(sigmas[i]), jnp.float32)
        vel = fwd(transformer, ipa, image_embeds,
                  lat.astype(jnp.bfloat16), prompt_embeds, pooled, t,
                  img_ids, txt_ids, guidance)
        lat = euler_step(lat, vel.astype(jnp.float32),
                         float(sigmas[i]), float(sigmas[i + 1]))

    result = lat.astype(jnp.bfloat16)
    if pipe.vae is not None:
        result = pipe.vae.decode(unpack_latents(result, lh, lw).astype(jnp.bfloat16))
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
