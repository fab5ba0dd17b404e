"""Z-Image (S3-DiT) text-to-image pipeline.

The reference drives its quantized Z-Image transformer through diffusers'
``ZImagePipeline`` (examples/v1/z-image-turbo.py); this is the TPU-native
equivalent of that driver for ``ZImageTransformer2DModel``.

Conventions follow the Lumina2/Z-Image lineage as implemented by the
diffusers pipeline the reference rides on:
  * flow-matching Euler schedule over sigmas 1 -> 0 with a static shift
    (turbo checkpoints are step-distilled; 8-9 steps, guidance 0);
  * the transformer is conditioned on ``1 - sigma`` (Lumina2's
    ``1 - t/num_train_timesteps`` timestep flip);
  * the model output is the NEGATIVE flow velocity — the euler update uses
    ``-model_out`` (Lumina2Pipeline's ``noise_pred = -noise_pred``).
``velocity_sign`` exposes the sign for checkpoints trained with the
unflipped convention.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .pipeline_flux import make_img_ids, pack_latents, unpack_latents


@dataclass
class ZImagePipelineOutput:
    images: jnp.ndarray | None
    latents: jnp.ndarray  # (B, S_img, in_ch * p^2)


def zimage_sigmas(num_steps: int, shift: float = 3.0) -> np.ndarray:
    """(num_steps + 1,) shifted flow-matching sigmas, sigmas[-1] = 0."""
    s = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    s = shift * s / (1.0 + (shift - 1.0) * s)
    return np.concatenate([s, [0.0]]).astype(np.float32)


class ZImagePipeline:
    def __init__(self, transformer, vae=None, text_encoder=None, tokenizer=None):
        self.transformer = transformer
        self.vae = vae
        self.text_encoder = text_encoder  # Qwen encoder adapter -> cap feats
        self.tokenizer = tokenizer

    def __call__(
        self,
        prompt_embeds: jnp.ndarray,  # (B, S_txt, cap_feat_dim)
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 8,
        guidance_scale: float = 0.0,
        negative_prompt_embeds: jnp.ndarray | None = None,
        shift: float = 3.0,
        seed: int = 0,
        latents: jnp.ndarray | None = None,
        velocity_sign: float = -1.0,
    ) -> ZImagePipelineOutput:
        model = self.transformer
        cfg = model.cfg
        b = prompt_embeds.shape[0]
        lh, lw = height // 8, width // 8
        p = cfg.patch_size
        s_img = (lh // p) * (lw // p)

        if latents is None:
            lat = jax.random.normal(
                jax.random.PRNGKey(seed), (b, cfg.in_channels, lh, lw), jnp.float32
            )
            latents = pack_latents(lat)
        lat_f = latents.astype(jnp.float32)

        img_ids = make_img_ids(lh // p, lw // p)
        txt_ids = jnp.zeros((prompt_embeds.shape[1], 3), jnp.int32)
        sigmas = zimage_sigmas(num_inference_steps, shift)

        use_cfg = negative_prompt_embeds is not None and guidance_scale > 0.0
        sig_pairs = jnp.stack(
            [jnp.asarray(sigmas[:-1]), jnp.asarray(sigmas[1:])], axis=1
        )
        lat_f = _zimage_denoise(
            model, lat_f, prompt_embeds,
            negative_prompt_embeds if use_cfg else None,
            jnp.float32(guidance_scale),
            jnp.float32(velocity_sign), img_ids, txt_ids, sig_pairs,
        )

        out = lat_f.astype(jnp.bfloat16)
        images = None
        if self.vae is not None:
            z = unpack_latents(out, lh, lw).astype(jnp.bfloat16)
            images = self.vae.decode(z)
        return ZImagePipelineOutput(images=images, latents=out)


@jax.jit
def _zimage_denoise(model, lat0, pe, ne, cfg_scale, vel_sign, img_ids, txt_ids,
                    sig_pairs):
    b = lat0.shape[0]

    def body(lat, sig):
        # Lumina2/Z-Image conditioning: t_model = 1 - sigma
        t = jnp.full((b,), 1.0 - sig[0], jnp.float32)
        pred = model(lat.astype(jnp.bfloat16), pe, t, img_ids, txt_ids)
        vel = pred.astype(jnp.float32)
        if ne is not None:  # trace-time CFG branch (ne=None -> single eval)
            neg = model(lat.astype(jnp.bfloat16), ne, t, img_ids, txt_ids)
            neg = neg.astype(jnp.float32)
            vel = neg + cfg_scale * (vel - neg)
        lat = lat + (sig[1] - sig[0]) * (vel_sign * vel)
        return lat, None

    lat, _ = jax.lax.scan(body, lat0, sig_pairs)
    return lat
