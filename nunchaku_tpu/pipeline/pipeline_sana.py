"""SANA text-to-image pipeline (counterpart of the reference's SANA path:
examples/v1/sana1.6b.py + nunchaku/models/transformers/transformer_sana.py
plugged into diffusers' SanaPipeline).

SANA uses a 32x-compressing autoencoder (DC-AE, patch size 1) and flow
matching; the text encoder is Gemma-2 (pluggable here like the others).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .scheduler import euler_step, flux_sigmas


@dataclass
class SanaPipelineOutput:
    images: jnp.ndarray | None
    latents: jnp.ndarray  # (B, C, h, w)


class SanaPipeline:
    def __init__(self, transformer, vae=None, text_encoder=None, tokenizer=None):
        self.transformer = transformer
        self.vae = vae
        self.text_encoder = text_encoder
        self.tokenizer = tokenizer

    def __call__(
        self,
        prompt=None,
        prompt_embeds: jnp.ndarray | None = None,
        prompt_attention_mask: jnp.ndarray | None = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 20,
        guidance_scale: float = 4.5,
        pag_scale: float = 0.0,
        seed: int = 0,
        latents: jnp.ndarray | None = None,
        cache: str | None = None,  # None | "fb" (SanaCachedTransformerBlocks)
        residual_diff_threshold: float = 0.12,
    ) -> SanaPipelineOutput:
        if prompt_embeds is None:
            if self.text_encoder is None:
                raise ValueError("pass prompt_embeds or build with a text encoder")
            ids = self.tokenizer([prompt] if isinstance(prompt, str) else prompt, 300)
            prompt_embeds = self.text_encoder(ids)

        model = self.transformer
        cfg = model.cfg
        b = prompt_embeds.shape[0]
        lh, lw = height // 32, width // 32  # DC-AE f32 stride
        s_img = lh * lw

        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed), (b, s_img, cfg.in_channels), jnp.float32
            )

        sigmas = flux_sigmas(num_inference_steps, use_dynamic_shifting=False, shift=3.0)
        use_cfg = guidance_scale > 1.0
        if cache not in (None, "fb"):
            raise ValueError(f"SANA supports cache=None or 'fb', got {cache!r}")
        if cache == "fb" and pag_scale > 0.0:
            raise ValueError("cache='fb' with PAG is unsupported (as in the "
                             "reference: cached SANA blocks have no pag path)")
        if cache == "fb" and use_cfg:
            # reference refuses batch>2 for cached SANA CFG (caching/utils.py:93);
            # the cached state here is per-batch so CFG would need two states
            raise ValueError("cache='fb' with guidance_scale>1 is unsupported")

        from ..caching.fbcache import init_sana_fb_state, sana_fb_cached_forward

        use_pag = pag_scale > 0.0
        pag_layers = getattr(cfg, "pag_layers", None)
        if use_pag and pag_layers is None:
            raise ValueError(
                "pag_scale > 0 needs a PAG checkpoint (pag_to_v projections; "
                "cfg.pag_layers is set by the loader / SanaConfig)"
            )

        @jax.jit
        def step(m, lat, pe, mask, t, sig, sig_next):
            if use_pag:
                # batch [uncond?, text, text_perturbed] — the reference's
                # SanaPAGPipeline layout (SanaModel.cpp:108-145 splits the
                # trailing rows onto the pag_to_v identity path)
                reps = 3 if use_cfg else 2
                latN = jnp.concatenate([lat] * reps, axis=0)
                peN = jnp.concatenate(
                    ([jnp.zeros_like(pe)] if use_cfg else []) + [pe, pe], axis=0
                )
                tN = jnp.concatenate([t] * reps)
                maskN = None if mask is None else jnp.concatenate([mask] * reps)
                rows = jnp.arange(reps * b) >= (reps - 1) * b
                v = m(latN.astype(jnp.bfloat16), peN, tN, cond_mask=maskN,
                      pag=True, pag_layers=list(pag_layers), pag_rows=rows)
                parts = jnp.split(v.astype(jnp.float32), reps, axis=0)
                if use_cfg:
                    v_unc, v_txt, v_ptb = parts
                    vel = (v_unc + guidance_scale * (v_txt - v_unc)
                           + pag_scale * (v_txt - v_ptb))
                else:
                    v_txt, v_ptb = parts
                    vel = v_txt + pag_scale * (v_txt - v_ptb)
            elif use_cfg:
                lat2 = jnp.concatenate([lat, lat], axis=0)
                pe2 = jnp.concatenate([jnp.zeros_like(pe), pe], axis=0)
                v = m(lat2.astype(jnp.bfloat16), pe2, jnp.concatenate([t, t]),
                      cond_mask=None if mask is None else jnp.concatenate([mask, mask]))
                v_unc, v_txt = jnp.split(v.astype(jnp.float32), 2, axis=0)
                vel = v_unc + guidance_scale * (v_txt - v_unc)
            else:
                vel = m(lat.astype(jnp.bfloat16), pe, t, cond_mask=mask).astype(jnp.float32)
            return euler_step(lat, vel, sig, sig_next)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def cached_step(m, lat, st, pe, mask, t, sig, sig_next):
            vel, st = sana_fb_cached_forward(
                m, st, lat.astype(jnp.bfloat16), pe, t, cond_mask=mask,
                residual_diff_threshold=residual_diff_threshold,
            )
            return euler_step(lat, vel.astype(jnp.float32), sig, sig_next), st

        lat = latents
        cache_state = init_sana_fb_state(b, s_img, cfg.dim) if cache == "fb" else None
        for i in range(num_inference_steps):
            targs = (
                jnp.full((lat.shape[0],), float(sigmas[i]), jnp.float32),
                jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1]),
            )
            if cache == "fb":
                lat, cache_state = cached_step(
                    model, lat, cache_state, prompt_embeds, prompt_attention_mask, *targs
                )
            else:
                lat = step(model, lat, prompt_embeds, prompt_attention_mask, *targs)

        images = None
        z = lat.reshape(b, lh, lw, cfg.out_channels).transpose(0, 3, 1, 2)
        if self.vae is not None:
            # DC-AE latents are scaled by the config factor (diffusers
            # SanaPipeline: latents / vae.config.scaling_factor)
            sf = getattr(getattr(self.vae, "cfg", None), "scaling_factor", None)
            zd = z / sf if sf else z
            images = self.vae.decode(zd.astype(jnp.bfloat16))
        return SanaPipelineOutput(images=images, latents=z)
