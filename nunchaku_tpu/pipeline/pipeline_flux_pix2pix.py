"""FLUX pix2pix-turbo: one-step sketch/edge-to-image generation.

TPU-native counterpart of the reference's sketch demo pipeline
(/root/reference/app/flux.1/sketch/flux_pix2pix_pipeline.py:12-183): a
"control module" — a LoRA trained by pix2pix-turbo — is applied onto the
quantized FLUX.1-schnell transformer at strength ``alpha``; generation is a
SINGLE transformer evaluation at t=1 on a noise/encoded-sketch mixture

    noisy = z * (1 - alpha) + vae_encode(sketch) * alpha     (:132)
    out   = noisy - transformer(noisy, t=1)                  (:163)

so ``alpha`` simultaneously controls the LoRA strength and how strongly the
sketch content anchors the latent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..lora.flux.apply import set_lora_strength, update_lora_params
from .pipeline_flux import (
    FluxPipeline,
    FluxPipelineOutput,
    make_img_ids,
    pack_latents,
    unpack_latents,
)


def preprocess_sketch(image: jnp.ndarray, kernel_size: int = 4) -> jnp.ndarray:
    """(B, H, W, 3) f32 in [0, 1] -> eroded binary ink image in {0, 1}.

    Matches the reference preprocessing (flux_pix2pix_pipeline.py:108-119):
    pixels darker than 0.5 are ink; a ``kernel_size``-wide erosion keeps only
    pixels whose whole window is ink (thins pen strokes to their cores). The
    reference runs the erosion as conv2d(ones) > k^2 - 0.1; a min-reduce
    window is the same morphological operator with SAME boundary handling.
    """
    ink = (image[..., :1] < 0.5).astype(jnp.float32)  # (B, H, W, 1)
    eroded = jax.lax.reduce_window(
        ink,
        1.0,
        jax.lax.min,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    return jnp.broadcast_to(eroded, image.shape)


class FluxPix2pixTurboPipeline(FluxPipeline):
    """One-step image translation on quantized FLUX (sketch2image et al.)."""

    _alpha: float = 1.0

    def load_control_module(self, lora_state_dict: dict, alpha: float = 1.0):
        """Apply a pix2pix-turbo control LoRA onto the transformer
        (reference load_control_module :25-36; any kohya/diffusers/peft
        flavor — lora/flux/convert.py normalizes)."""
        self.transformer = update_lora_params(
            self.transformer, lora_state_dict, strength=alpha
        )
        self._alpha = alpha
        self._has_control = True
        return self

    def update_alpha(self, alpha: float):
        """Retarget the control LoRA strength without reloading (:13-23)."""
        if alpha != self._alpha and getattr(self, "_has_control", False):
            self.transformer = set_lora_strength(self.transformer, alpha)
        self._alpha = alpha

    def __call__(  # type: ignore[override]
        self,
        image: jnp.ndarray,  # (B, H, W, 3) f32 in [0, 1] sketch/edge map
        prompt=None,
        prompt_embeds: jnp.ndarray | None = None,
        pooled_prompt_embeds: jnp.ndarray | None = None,
        alpha: float = 1.0,
        image_type: str = "sketch",  # "sketch" binarizes+erodes; else raw
        seed: int = 0,
    ) -> FluxPipelineOutput:
        self.update_alpha(alpha)
        if prompt_embeds is None:
            prompt_embeds, pooled_prompt_embeds = self.encode_prompt(prompt)

        b, height, width = image.shape[0], image.shape[1], image.shape[2]
        if image_type == "sketch":
            image = preprocess_sketch(image)
        encoded = self.encode_image_tokens(image)  # (B, S, 64) packed

        key = jax.random.PRNGKey(seed)
        z = jax.random.normal(key, encoded.shape, jnp.float32)
        noisy = (z * (1.0 - alpha) + encoded.astype(jnp.float32) * alpha).astype(
            jnp.bfloat16
        )

        img_ids = make_img_ids(height // 16, width // 16)
        txt_ids = jnp.zeros((prompt_embeds.shape[1], 3), jnp.int32)
        t = jnp.full((b,), 1.0, jnp.float32)
        guidance = (
            jnp.full((b,), 0.0, jnp.float32)
            if self.transformer.cfg.guidance_embeds
            else None
        )

        pred = jax.jit(lambda m, *a: m(*a))(
            self.transformer, noisy, prompt_embeds.astype(jnp.bfloat16),
            pooled_prompt_embeds.astype(jnp.bfloat16), t, img_ids, txt_ids,
            guidance,
        )
        out = noisy.astype(jnp.float32) - pred.astype(jnp.float32)

        images = None
        if self.vae is not None:
            lat = unpack_latents(out.astype(jnp.bfloat16), height // 8, width // 8)
            images = self.vae.decode(lat)
        return FluxPipelineOutput(images=images, latents=out)
