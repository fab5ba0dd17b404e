"""FLUX.1-dev + ControlNet residual conditioning (counterpart of the
reference's examples/flux.1-dev-controlnet-union-pro.py, which runs
diffusers' FluxControlNetModel alongside the nunchaku transformer).

The ControlNet is itself TPU-native (models/transformers/controlnet_flux.py):
a truncated dual-stream stack with zero-init projections. It depends on the
current latents and timestep, so it runs inside the per-step loop and its
block samples are interleaved into the main transformer
(FluxModel.cpp:1290-1333 rule).
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from nunchaku_tpu import (
    FluxPipeline,
    load_autoencoder,
    load_clip_text,
    load_flux_transformer,
    load_t5_encoder,
)
from nunchaku_tpu.models.transformers.controlnet_flux import load_flux_controlnet
from nunchaku_tpu.pipeline.pipeline_flux import make_img_ids, unpack_latents
from nunchaku_tpu.pipeline.scheduler import euler_step, flux_sigmas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True)
    ap.add_argument("--controlnet", required=True,
                    help="FLUX ControlNet safetensors (e.g. union-pro)")
    ap.add_argument("--vae", required=True)
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--control-image", required=True, help=".npy (H, W, 3) in [0,1]")
    ap.add_argument("--conditioning-scale", type=float, default=0.7)
    ap.add_argument("--prompt", default="a vivid photograph, masterpiece")
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="flux_controlnet.npy")
    args = ap.parse_args()

    transformer = load_flux_transformer(args.transformer)
    cnet = load_flux_controlnet(args.controlnet)
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae),
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )
    prompt_embeds, pooled = pipe.encode_prompt(args.prompt)

    ctrl = np.load(args.control_image)[None]
    h, w = ctrl.shape[1], ctrl.shape[2]
    control_tokens = pipe.encode_image_tokens(jnp.asarray(ctrl, jnp.float32))

    lh, lw = h // 8, w // 8
    s_img = (lh // 2) * (lw // 2)
    lat = jax.random.normal(jax.random.PRNGKey(args.seed), (1, s_img, 64), jnp.float32)
    img_ids = make_img_ids(lh // 2, lw // 2)
    txt_ids = jnp.zeros((prompt_embeds.shape[1], 3), jnp.int32)
    guidance = jnp.array([args.guidance], jnp.float32)
    sigmas = flux_sigmas(args.steps, s_img)

    cnet_fwd = jax.jit(lambda c, lat_, cond, *a: c(lat_, cond, *a))
    fwd = jax.jit(lambda m, *a, **kw: m(*a, **kw))
    scale = jnp.float32(args.conditioning_scale)
    for i in range(args.steps):
        t = jnp.full((1,), float(sigmas[i]), jnp.float32)
        lat_b = lat.astype(jnp.bfloat16)
        samples = cnet_fwd(cnet, lat_b, control_tokens, prompt_embeds, pooled,
                           t, img_ids, txt_ids, guidance)
        vel = fwd(transformer, lat_b, prompt_embeds, pooled, t, img_ids,
                  txt_ids, guidance,
                  controlnet_block_samples=samples * scale)
        lat = euler_step(lat, vel.astype(jnp.float32),
                         float(sigmas[i]), float(sigmas[i + 1]))

    result = lat.astype(jnp.bfloat16)
    result = pipe.vae.decode(unpack_latents(result, lh, lw).astype(jnp.bfloat16))
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
