"""SDXL text-to-image pipeline (W8A8 UNet).

The reference drives its quantized SDXL UNet through diffusers'
StableDiffusionXLPipeline (examples/sdxl-turbo.py pattern); this is the
TPU-native driver for ``SDXLUNet2DConditionModel``: EulerDiscrete sigma
schedule over the SDXL scaled-linear beta table, epsilon prediction, and
the text_time additional conditioning (pooled embeds + size/crop time_ids).

Text encoding: SDXL concatenates CLIP-L (768) and OpenCLIP-G (1280)
penultimate hidden states to 2048 channels and takes CLIP-G's pooled
output. Pass ``prompt_embeds`` (B, 77, 2048) + ``pooled_prompt_embeds``
(B, 1280) precomputed (transformers on host), mirroring how the other
pipelines treat heavyweight encoders.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class SDXLPipelineOutput:
    images: jnp.ndarray | None
    latents: jnp.ndarray  # (B, 4, h, w) NCHW


def sdxl_sigmas(num_steps: int, train_steps: int = 1000):
    """EulerDiscrete sigmas + matching discrete timesteps ("leading"
    spacing, steps_offset=1 — the SDXL scheduler config)."""
    betas = np.linspace(0.00085**0.5, 0.012**0.5, train_steps, dtype=np.float64) ** 2
    alphas_cumprod = np.cumprod(1.0 - betas)
    all_sigmas = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)
    step = train_steps // num_steps
    ts = (np.arange(num_steps) * step + 1).round()[::-1].astype(np.int64)
    sigmas = all_sigmas[ts]
    return (
        np.concatenate([sigmas, [0.0]]).astype(np.float32),
        ts.astype(np.float32),
    )


class SDXLPipeline:
    def __init__(self, unet, vae=None, text_encoder=None, text_encoder_2=None,
                 tokenizer=None, tokenizer_2=None):
        self.unet = unet
        self.vae = vae
        self.text_encoder = text_encoder
        self.text_encoder_2 = text_encoder_2
        self.tokenizer = tokenizer
        self.tokenizer_2 = tokenizer_2

    def __call__(
        self,
        prompt_embeds: jnp.ndarray,  # (B, 77, 2048)
        pooled_prompt_embeds: jnp.ndarray,  # (B, 1280)
        negative_prompt_embeds: jnp.ndarray | None = None,
        negative_pooled_prompt_embeds: jnp.ndarray | None = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 30,
        guidance_scale: float = 5.0,
        seed: int = 0,
        latents: jnp.ndarray | None = None,
    ) -> SDXLPipelineOutput:
        b = prompt_embeds.shape[0]
        lh, lw = height // 8, width // 8
        sigmas, ts = sdxl_sigmas(num_inference_steps)

        if latents is None:
            lat = jax.random.normal(
                jax.random.PRNGKey(seed), (b, 4, lh, lw), jnp.float32
            )
            lat = lat * float(np.sqrt(sigmas[0] ** 2 + 1.0))  # init_noise_sigma
        else:
            lat = latents.astype(jnp.float32)

        # text_time conditioning: (orig_h, orig_w, crop_t, crop_l, tgt_h, tgt_w)
        time_ids = jnp.asarray(
            [[height, width, 0, 0, height, width]] * b, jnp.float32
        )

        use_cfg = negative_prompt_embeds is not None and guidance_scale > 1.0
        sig_steps = jnp.stack(
            [jnp.asarray(sigmas[:-1]), jnp.asarray(sigmas[1:]),
             jnp.asarray(ts)], axis=1
        )
        lat = _sdxl_denoise(
            self.unet, lat, prompt_embeds, pooled_prompt_embeds,
            negative_prompt_embeds if use_cfg else None,
            negative_pooled_prompt_embeds if use_cfg else None,
            jnp.float32(guidance_scale), time_ids, sig_steps,
        )

        images = None
        if self.vae is not None:
            images = self.vae.decode(lat.astype(jnp.bfloat16))
        return SDXLPipelineOutput(images=images, latents=lat)


@jax.jit
def _sdxl_denoise(unet, lat0, pe, pool, ne, npool, cfg_scale, time_ids,
                  sig_steps):
    b = lat0.shape[0]

    def body(lat, row):
        sigma, sigma_next, t = row[0], row[1], row[2]
        # EulerDiscrete input scaling: x / sqrt(sigma^2 + 1)
        x_in = (lat / jnp.sqrt(sigma * sigma + 1.0)).astype(jnp.bfloat16)
        tvec = jnp.full((b,), t, jnp.float32)
        eps = unet(x_in, tvec, pe, pool, time_ids).astype(jnp.float32)
        if ne is not None:
            eps_n = unet(x_in, tvec, ne, npool, time_ids).astype(jnp.float32)
            eps = eps_n + cfg_scale * (eps - eps_n)
        # epsilon prediction: derivative IS eps; x' = x + (s_next - s) * eps
        lat = lat + (sigma_next - sigma) * eps
        return lat, None

    lat, _ = jax.lax.scan(body, lat0, sig_steps)
    return lat
