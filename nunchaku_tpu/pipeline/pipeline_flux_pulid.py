"""PuLID FLUX pipeline: identity-preserving generation.

Counterpart of nunchaku/pipeline/pipeline_flux_pulid.py (PuLIDPipeline :87
+ PuLIDFluxPipeline :356). The embedding path is EVA02-CLIP-L-14-336 CLS
features + 5 hidden-state scales -> IDFormer -> (B, 32, 2048) ID tokens,
injected into the FLUX graph every 2 dual / 4 single layers
(models/pulid/forward.py).

Face detection / alignment / parsing (insightface antelopev2 + facexlib
retinaface + bisenet in the reference, :178-332) are ONNX host-side stages
with no TPU equivalent here; this pipeline takes a pre-aligned face crop
(and optionally its ArcFace embedding) instead. ``get_id_embedding``
documents the contract: a (512, 512) RGB aligned face like
FaceRestoreHelper.align_warp_face produces. Without an ArcFace embedding
the 512-d slot of id_cond is zero — identity fidelity degrades but the
EVA-CLIP half still conditions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.pulid.encoders import IDFormer, PerceiverAttentionCA, load_pulid
from ..models.pulid.eva_clip import EVAVisionTower, load_eva_vision
from ..models.pulid.forward import pulid_forward
from ..models.text_encoders.clip import preprocess_clip_image
from .pipeline_flux import FluxPipeline, FluxPipelineOutput, make_img_ids, pack_latents, unpack_latents
from .scheduler import euler_step, flux_sigmas


def preprocess_eva_image(image: np.ndarray, size: int = 336) -> jnp.ndarray:
    """Aligned face (H, W, 3) RGB -> (1, 3, size, size) EVA-normalized.

    EVA's OPENAI_DATASET_MEAN/STD (eva_clip/constants.py) are the CLIP
    constants, so this reuses the CLIP preprocessor at EVA's 336 input."""
    return preprocess_clip_image(image, size=size)


class PuLIDFluxPipeline(FluxPipeline):
    """FluxPipeline + PuLID ID conditioning (reference :356-520)."""

    def __init__(self, transformer, vae=None, text_encoder=None,
                 text_encoder_2=None, tokenizer=None, tokenizer_2=None,
                 *, pulid_encoder: IDFormer | None = None,
                 pulid_ca: list | None = None,
                 eva_clip: EVAVisionTower | None = None):
        super().__init__(transformer, vae, text_encoder, text_encoder_2,
                         tokenizer, tokenizer_2)
        self.pulid_encoder = pulid_encoder
        self.pulid_ca = pulid_ca or []
        self.eva_clip = eva_clip

    def load_pulid_weights(self, path_or_tensors, eva_path_or_tensors=None):
        """Load guozinan/PuLID pulid_flux safetensors (+ optionally the
        EVA-CLIP tower)."""
        self.pulid_encoder, self.pulid_ca = load_pulid(path_or_tensors)
        if eva_path_or_tensors is not None:
            self.eva_clip = load_eva_vision(eva_path_or_tensors)
        return self

    def get_id_embedding(
        self,
        aligned_face: np.ndarray,
        id_ante_embedding: np.ndarray | None = None,
        cal_uncond: bool = False,
    ):
        """Aligned face crop -> (B, 32, 2048) ID tokens.

        Mirrors reference get_id_embedding (:266-353) from the EVA-CLIP
        stage onward; detection/alignment/parsing happen before this call.
        ``id_ante_embedding``: optional (512,) ArcFace/antelopev2 vector.
        """
        if self.eva_clip is None or self.pulid_encoder is None:
            raise ValueError("call load_pulid_weights first")
        px = preprocess_eva_image(aligned_face, size=self.eva_clip.patch * 24)
        id_cond_vit, vit_hidden = self.eva_clip(px)  # (1, 768) L2-normalized

        if id_ante_embedding is None:
            ante = jnp.zeros((1, 1280 - id_cond_vit.shape[-1]), jnp.bfloat16)
        else:
            ante = jnp.asarray(
                np.asarray(id_ante_embedding, np.float32).reshape(1, -1), jnp.bfloat16
            )
        id_cond = jnp.concatenate([ante, id_cond_vit], axis=-1)
        id_embedding = self.pulid_encoder(id_cond, vit_hidden)
        if not cal_uncond:
            return id_embedding, None
        uncond = self.pulid_encoder(
            jnp.zeros_like(id_cond), [jnp.zeros_like(h) for h in vit_hidden]
        )
        return id_embedding, uncond

    def __call__(
        self,
        prompt=None,
        prompt_embeds=None,
        pooled_prompt_embeds=None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.5,
        seed: int = 0,
        latents=None,
        id_image: np.ndarray | None = None,
        id_embeddings: jnp.ndarray | None = None,
        id_weight: float = 1.0,
        start_timestep: float | None = None,
        end_timestep: float | None = None,
        **kwargs,
    ) -> FluxPipelineOutput:
        if id_image is None and id_embeddings is None:
            return super().__call__(
                prompt=prompt, prompt_embeds=prompt_embeds,
                pooled_prompt_embeds=pooled_prompt_embeds, height=height,
                width=width, num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, seed=seed, latents=latents,
                **kwargs,
            )
        if id_embeddings is None:
            id_embeddings, _ = self.get_id_embedding(id_image)

        if prompt_embeds is None:
            prompt_embeds, pooled_prompt_embeds = self.encode_prompt(prompt)
        model = self.transformer
        cfg = model.cfg

        b = prompt_embeds.shape[0]
        lh, lw = height // 8, width // 8
        s_img = (lh // 2) * (lw // 2)
        s_txt = prompt_embeds.shape[1]

        if latents is None:
            key = jax.random.PRNGKey(seed)
            lat = jax.random.normal(key, (b, cfg.in_channels // 4, lh, lw), jnp.float32)
            latents = pack_latents(lat).astype(jnp.bfloat16)

        img_ids = make_img_ids(lh // 2, lw // 2)
        txt_ids = jnp.zeros((s_txt, 3), jnp.int32)
        sigmas = flux_sigmas(num_inference_steps, image_seq_len=s_img)
        guidance = (
            jnp.full((b,), guidance_scale, jnp.float32)
            if cfg.guidance_embeds else None
        )

        lat_f = latents.astype(jnp.float32)
        sig_pairs = jnp.stack(
            [jnp.asarray(sigmas[:-1]), jnp.asarray(sigmas[1:])], axis=1
        )
        lo = -np.inf if start_timestep is None else start_timestep
        hi = np.inf if end_timestep is None else end_timestep
        lat_f = _pulid_denoise(
            model, tuple(self.pulid_ca), lat_f, prompt_embeds,
            pooled_prompt_embeds, guidance, id_embeddings,
            jnp.float32(id_weight), jnp.float32(lo), jnp.float32(hi),
            img_ids, txt_ids, sig_pairs,
        )

        latents = lat_f.astype(jnp.bfloat16)
        images = None
        if self.vae is not None:
            z = unpack_latents(latents, lh, lw).astype(jnp.bfloat16)
            images = self.vae.decode(z)
        return FluxPipelineOutput(images=images, latents=latents)


@jax.jit
def _pulid_denoise(model, pulid_ca, lat0, pe, pool, g, id_emb, id_weight,
                   t_lo, t_hi, img_ids, txt_ids, sig_pairs):
    b = lat0.shape[0]

    def body(lat, sig):
        t = jnp.full((b,), sig[0], jnp.float32)
        # reference gating (pulid_forward.py:99-103): ID active for
        # start_timestep <= t <= end_timestep, disabled outside
        w = jnp.where((sig[0] >= t_lo) & (sig[0] <= t_hi), id_weight, 0.0)
        vel = pulid_forward(
            model, list(pulid_ca), id_emb, w,
            lat.astype(jnp.bfloat16), pe, pool, t, img_ids, txt_ids, g,
        )
        return euler_step(lat, vel, sig[0], sig[1]), None

    lat, _ = jax.lax.scan(body, lat0, sig_pairs)
    return lat
