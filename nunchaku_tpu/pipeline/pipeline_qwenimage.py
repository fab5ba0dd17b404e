"""Qwen-Image text-to-image and image-edit pipeline (diffusers-compatible
surface).

Counterpart of the diffusers QwenImagePipeline / QwenImageEditPipeline the
reference plugs its NunchakuQwenImageTransformer2DModel into
(examples/v1/qwen-image.py, qwen-image-edit[-2509].py): flow-match Euler
schedule with Qwen's static shift, true classifier-free guidance (two
transformer evals per step against negative prompt embeds — Qwen has no
guidance embedding), and the Lightning presets (reference
tests/v1/qwenimage/*lightning*: distilled checkpoints run 4/8 steps with
cfg 1.0).

Edit conditioning follows the QwenEmbedRope contract: each conditioning
image is VAE-encoded, packed, and appended to the image token sequence
with rope frame index i+1 (diffusers _compute_video_freqs offsets the
frame axis by the img_shapes list index; the generated image is index 0).
Only the first S_img velocity rows integrate. Edit-2509 ("edit-plus")
passes multiple images — frame indices 1..N.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .pipeline_flux import make_img_ids, pack_latents, unpack_latents
from .scheduler import euler_step, flux_sigmas

# Lightning-distilled checkpoints: fixed few-step recipes (reference
# tests/v1/qwenimage/test_qwenimage_edit_2509_lightning.py presets)
LIGHTNING_PRESETS = {
    "lightning-4step": dict(num_inference_steps=4, true_cfg_scale=1.0),
    "lightning-8step": dict(num_inference_steps=8, true_cfg_scale=1.0),
}


@dataclass
class QwenImagePipelineOutput:
    images: jnp.ndarray | None
    latents: jnp.ndarray
    cache_hits: jnp.ndarray | None = None  # () int32, when an FB cache ran


class QwenImagePipeline:
    def __init__(self, transformer, vae=None, text_encoder=None, tokenizer=None,
                 controlnet=None):
        self.transformer = transformer
        self.vae = vae
        self.text_encoder = text_encoder  # Qwen2.5-VL adapter
        self.tokenizer = tokenizer
        # QwenImageControlNetModel (diffusers QwenImageControlNetPipeline
        # surface: reference examples/v1/qwen-image-controlnet.py)
        self.controlnet = controlnet

    def prepare_edit(self, images) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Edit conditioning image(s) -> (tokens (B, S_cond, C), ids).

        Accepts one (B, H, W, 3) array in [0, 1] or a list of them
        (edit-2509 multi-image). Image i gets rope frame index i+1."""
        if self.vae is None or self.vae.encoder is None:
            raise ValueError("edit conditioning needs a VAE with an encoder")
        if not isinstance(images, (list, tuple)):
            images = [images]
        toks, ids = [], []
        for i, im in enumerate(images):
            z = self.vae.encode(jnp.asarray(im).astype(jnp.bfloat16))
            toks.append(pack_latents(z).astype(jnp.bfloat16))
            h2, w2 = im.shape[1] // 16, im.shape[2] // 16
            ids.append(make_img_ids(h2, w2).at[:, 0].set(i + 1))
        return jnp.concatenate(toks, axis=1), jnp.concatenate(ids, axis=0)

    def __call__(
        self,
        prompt_embeds: jnp.ndarray,  # (B, S_txt, joint_dim)
        negative_prompt_embeds: jnp.ndarray | None = None,
        prompt_embeds_mask: jnp.ndarray | None = None,  # (B, S_txt) bool
        negative_prompt_embeds_mask: jnp.ndarray | None = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 20,
        true_cfg_scale: float = 4.0,
        seed: int = 0,
        latents: jnp.ndarray | None = None,
        lightning: str | None = None,  # "lightning-4step" | "lightning-8step"
        image=None,  # edit: (B, H, W, 3) in [0, 1] or list of them
        cond_tokens: jnp.ndarray | None = None,  # pre-packed edit latents
        cond_ids: jnp.ndarray | None = None,
        control_image=None,  # controlnet: (B, H, W, 3) in [0, 1]
        controlnet_conditioning_scale: float = 1.0,
        cache: str | None = None,  # None | "fb" (reference qwen-image-cache-dit)
        residual_diff_threshold: float = 0.12,
        fn_blocks: int = 8,  # Fn_compute_blocks (reference Qwen example: 8)
    ) -> QwenImagePipelineOutput:
        if lightning is not None:
            preset = LIGHTNING_PRESETS[lightning]
            num_inference_steps = preset["num_inference_steps"]
            true_cfg_scale = preset["true_cfg_scale"]
        model = self.transformer
        cfg = model.cfg
        b = prompt_embeds.shape[0]
        lh, lw = height // 8, width // 8
        s_img = (lh // 2) * (lw // 2)

        if latents is None:
            lat = jax.random.normal(
                jax.random.PRNGKey(seed), (b, cfg.in_channels // 4, lh, lw), jnp.float32
            )
            latents = pack_latents(lat).astype(jnp.bfloat16)

        img_ids = make_img_ids(lh // 2, lw // 2)
        if image is not None:
            cond_tokens, cond_ids = self.prepare_edit(image)
        if cond_tokens is not None:
            img_ids = jnp.concatenate([img_ids, cond_ids], axis=0)
            if cond_tokens.shape[0] < b:
                cond_tokens = jnp.broadcast_to(
                    cond_tokens, (b,) + cond_tokens.shape[1:]
                )
        else:
            cond_tokens = jnp.zeros((b, 0, latents.shape[-1]), jnp.bfloat16)
        ctrl_tokens = None
        if control_image is not None:
            if self.controlnet is None:
                raise ValueError("control_image given but pipeline has no controlnet")
            if self.vae is None or self.vae.encoder is None:
                raise ValueError("controlnet conditioning needs a VAE encoder")
            z = self.vae.encode(jnp.asarray(control_image).astype(jnp.bfloat16))
            ctrl_tokens = pack_latents(z).astype(jnp.bfloat16)
            if ctrl_tokens.shape[0] < b:
                ctrl_tokens = jnp.broadcast_to(
                    ctrl_tokens, (b,) + ctrl_tokens.shape[1:]
                )
        sigmas = flux_sigmas(num_inference_steps, image_seq_len=s_img)
        sig_pairs = jnp.stack([jnp.asarray(sigmas[:-1]), jnp.asarray(sigmas[1:])], axis=1)
        use_cfg = negative_prompt_embeds is not None and true_cfg_scale > 1.0
        neg = negative_prompt_embeds if use_cfg else prompt_embeds

        pe_mask = prompt_embeds_mask
        neg_mask = negative_prompt_embeds_mask if use_cfg else pe_mask
        if (pe_mask is None) != (neg_mask is None):
            raise ValueError("pass masks for both prompt branches or neither")
        cache_hits = None
        if cache is not None:
            if cache != "fb":
                raise ValueError(f"qwen cache supports 'fb', got {cache!r}")
            if ctrl_tokens is not None:
                raise ValueError("qwen fb cache x controlnet is not supported")
            lat_f, cache_hits = _denoise_cached(
                model, latents.astype(jnp.float32), prompt_embeds, neg,
                img_ids, cond_tokens, sig_pairs,
                jnp.float32(residual_diff_threshold), pe_mask, neg_mask,
                cfg_scale=float(true_cfg_scale), use_cfg=use_cfg,
                fn_blocks=int(fn_blocks),
            )
        else:
            lat_f, = _denoise(
                model, latents.astype(jnp.float32), prompt_embeds, neg, img_ids,
                cond_tokens, sig_pairs,
                self.controlnet if ctrl_tokens is not None else None, ctrl_tokens,
                jnp.float32(controlnet_conditioning_scale),
                pe_mask, neg_mask,
                cfg_scale=float(true_cfg_scale), use_cfg=use_cfg,
            )
        latents = lat_f.astype(jnp.bfloat16)
        images = None
        if self.vae is not None:
            z = unpack_latents(latents, lh, lw).astype(jnp.bfloat16)
            images = self.vae.decode(z)
        return QwenImagePipelineOutput(images=images, latents=latents,
                                       cache_hits=cache_hits)


@functools.partial(jax.jit, static_argnames=("cfg_scale", "use_cfg"), donate_argnums=(1,))
def _denoise(model, lat0, pe, npe, img_ids, cond_tokens, sig_pairs,
             cnet, ctrl_tokens, cnet_scale, pe_mask=None, neg_mask=None, *,
             cfg_scale, use_cfg):
    b = lat0.shape[0]
    s_img = lat0.shape[1]

    def one_step(lat, sig, sig_next):
        t = jnp.full((b,), sig, jnp.float32)
        x = lat.astype(jnp.bfloat16)
        if cond_tokens.shape[1]:
            x = jnp.concatenate([x, cond_tokens], axis=1)

        def run(embeds, emask):
            samples = None
            if cnet is not None:
                # controlnet re-runs every step and per CFG branch with that
                # branch's embeds (diffusers QwenImageControlNetPipeline)
                samples = cnet(
                    lat.astype(jnp.bfloat16), ctrl_tokens, embeds, t,
                    img_ids[:s_img], conditioning_scale=cnet_scale,
                    encoder_hidden_states_mask=emask,
                )
            return model(
                x, embeds, t, img_ids, controlnet_block_samples=samples,
                encoder_hidden_states_mask=emask,
            )[:, :s_img]

        vel = run(pe, pe_mask)
        if use_cfg:
            vel_neg = run(npe, neg_mask)
            vel = vel_neg + cfg_scale * (vel - vel_neg)
        return euler_step(lat, vel, sig, sig_next)

    def body(lat, sig):
        return one_step(lat, sig[0], sig[1]), None

    lat, _ = jax.lax.scan(body, lat0, sig_pairs)
    return (lat,)


@functools.partial(
    jax.jit, static_argnames=("cfg_scale", "use_cfg", "fn_blocks"),
    donate_argnums=(1,),
)
def _denoise_cached(model, lat0, pe, npe, img_ids, cond_tokens, sig_pairs,
                    thresh, pe_mask=None, neg_mask=None, *, cfg_scale,
                    use_cfg, fn_blocks=8):
    """FB-cached denoise loop (reference cache-dit DBCache Fn=8/Bn=0 over
    QwenImage, examples/v1/qwen-image-cache-dit.py:25). Each CFG branch
    carries its own cache state — the two branches see different residual
    trajectories. ``thresh`` is a traced f32 scalar so sweeping the
    threshold never recompiles the 60-block loop; ``fn_blocks`` (static)
    selects how many leading indicator blocks run before the decision.

    Returns (latents, hits) where hits sums BOTH CFG branches' realized
    hit counts (each branch decides independently; max = 2*(steps-1) with
    true-CFG, steps-1 without)."""
    from ..caching.fbcache import init_qwen_fb_state, qwenimage_fb_cached_forward

    b = lat0.shape[0]
    s_img = lat0.shape[1]
    s_x = s_img + cond_tokens.shape[1]
    st_pos = init_qwen_fb_state(b, s_x, model.cfg.dim)
    st_neg = init_qwen_fb_state(b, s_x, model.cfg.dim)

    def one_step(carry, sig, sig_next):
        lat, sp, sn = carry
        t = jnp.full((b,), sig, jnp.float32)
        x = lat.astype(jnp.bfloat16)
        if cond_tokens.shape[1]:
            x = jnp.concatenate([x, cond_tokens], axis=1)

        vel, sp = qwenimage_fb_cached_forward(
            model, sp, x, pe, t, img_ids,
            residual_diff_threshold=thresh, fn_blocks=fn_blocks,
            encoder_hidden_states_mask=pe_mask,
        )
        vel = vel[:, :s_img]
        if use_cfg:
            vel_neg, sn = qwenimage_fb_cached_forward(
                model, sn, x, npe, t, img_ids,
                residual_diff_threshold=thresh, fn_blocks=fn_blocks,
                encoder_hidden_states_mask=neg_mask,
            )
            vel = vel_neg[:, :s_img] + cfg_scale * (vel - vel_neg[:, :s_img])
        return (euler_step(lat, vel, sig, sig_next), sp, sn)

    def body(carry, sig):
        return one_step(carry, sig[0], sig[1]), None

    (lat, st_pos, st_neg), _ = jax.lax.scan(
        body, (lat0, st_pos, st_neg), sig_pairs
    )
    hits = st_pos.hits + (st_neg.hits if use_cfg else 0)
    return lat, hits
