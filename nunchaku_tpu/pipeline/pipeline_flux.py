"""FLUX text-to-image pipeline (diffusers-compatible surface, JAX-native).

Counterpart of the diffusers FluxPipeline the reference plugs into
(nunchaku/models/transformers/transformer_flux.py usage) plus the cache
adapters (nunchaku/caching/diffusers_adapters/flux.py:22-150 —
``apply_cache_on_pipe``). The denoise loop runs a jitted step function with
the cache state as an explicit carry; latents follow FLUX's 2x2-packed
convention.

Text encoders / VAE are pluggable modules; with ``vae=None`` the call
returns latents, and prompt embeddings can be passed directly (the
reference's pipelines equally accept prompt_embeds).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..caching.fbcache import FBCacheState, fb_cached_forward, init_fb_state
from ..caching.teacache import TeaCacheState, init_teacache_state, teacache_forward
from .scheduler import euler_step, flux_sigmas


def pack_latents(lat: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, H/2*W/2, C*4) 2x2 patchified tokens."""
    b, c, h, w = lat.shape
    x = lat.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, S, C*4) -> (B, C, H, W)."""
    b, s, c4 = tokens.shape
    c = c4 // 4
    x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


def make_img_ids(h_tokens: int, w_tokens: int) -> jnp.ndarray:
    ids = np.zeros((h_tokens * w_tokens, 3), np.int32)
    ids[:, 1] = np.repeat(np.arange(h_tokens), w_tokens)
    ids[:, 2] = np.tile(np.arange(w_tokens), h_tokens)
    return jnp.asarray(ids)




@functools.partial(
    jax.jit,
    static_argnames=("cache_kind", "thresh", "single_thresh", "tea_thresh",
                     "num_steps", "tea_model_name"),
    donate_argnums=(1, 2),
)
def _denoise_scanned(
    model, lat0, state0, pe, pool, g, cb, csb, img_ids, txt_ids, sig_pairs,
    cond_seq=None, cond_ch=None, force_sched=None,
    *, cache_kind, thresh, single_thresh, tea_thresh, num_steps,
    tea_model_name="flux",
):
    """Entire denoise loop as one device program (stable jit identity —
    per-call closures would retrace + recompile every generation).

    ``cond_seq`` (B, S_cond, 64): sequence-concat conditioning (FLUX
    Kontext reference-image tokens, appended after the latent tokens with
    the velocity sliced back — the reference serves this via diffusers'
    FluxKontextPipeline). ``cond_ch`` (B, S_img, C): channel-concat
    conditioning (flux-canny/depth control latents 64ch, flux-fill
    masked-image+mask 320ch — BASELINE.md quality table variants)."""
    b = lat0.shape[0]
    s_out = lat0.shape[1]

    def one_step(lat, st, sig, sig_next, force):
        t = jnp.full((b,), sig, jnp.float32)
        x = lat.astype(jnp.bfloat16)
        if cond_ch is not None:
            x = jnp.concatenate([x, cond_ch.astype(jnp.bfloat16)], axis=-1)
        if cond_seq is not None:
            x = jnp.concatenate([x, cond_seq.astype(jnp.bfloat16)], axis=1)
        if cache_kind in ("fb", "double_fb"):
            vel, st = fb_cached_forward(
                model, st, x, pe, pool, t, img_ids, txt_ids, g,
                residual_diff_threshold=thresh,
                single_residual_diff_threshold=(
                    single_thresh if cache_kind == "double_fb" else None
                ),
                controlnet_block_samples=cb,
                controlnet_single_block_samples=csb,
                force=force,
            )
        elif cache_kind == "teacache":
            vel, st = teacache_forward(
                model, st, x, pe, pool, t, img_ids, txt_ids, g,
                num_steps=num_steps, rel_l1_thresh=tea_thresh,
                model_name=tea_model_name,
                controlnet_block_samples=cb,
                controlnet_single_block_samples=csb,
            )
        else:
            vel = model(
                x, pe, pool, t, img_ids, txt_ids, g,
                controlnet_block_samples=cb,
                controlnet_single_block_samples=csb,
            )
        if cond_seq is not None:
            vel = vel[:, :s_out]
        return euler_step(lat, vel, sig, sig_next), st

    if force_sched is None:
        force_sched = jnp.full((sig_pairs.shape[0],), -1, jnp.int32)

    def body(carry, xs):
        lat, st = carry
        sig, force = xs
        return one_step(lat, st, sig[0], sig[1], force), None

    (lat, st), _ = jax.lax.scan(body, (lat0, state0), (sig_pairs, force_sched))
    return lat, st


@dataclass
class FluxPipelineOutput:
    images: jnp.ndarray | None  # (B, H, W, 3) f32 in [0, 1], None if no VAE
    latents: jnp.ndarray  # (B, S, 64) packed
    cache_hits: jnp.ndarray | None = None  # () int32, when a cache ran


class FluxPipeline:
    def __init__(
        self,
        transformer,
        vae=None,
        text_encoder=None,  # CLIP -> pooled embeds
        text_encoder_2=None,  # T5 -> sequence embeds
        tokenizer=None,
        tokenizer_2=None,
    ):
        self.transformer = transformer
        self.vae = vae
        self.text_encoder = text_encoder
        self.text_encoder_2 = text_encoder_2
        self.tokenizer = tokenizer
        self.tokenizer_2 = tokenizer_2

    def encode_prompt(self, prompt: str | list[str], max_length: int = 512):
        if self.text_encoder_2 is None or self.tokenizer_2 is None:
            raise ValueError(
                "pipeline was built without text encoders; pass prompt_embeds"
            )
        if isinstance(prompt, str):
            prompt = [prompt]
        t5_ids = self.tokenizer_2(prompt, max_length)
        prompt_embeds = self.text_encoder_2(t5_ids)
        clip_ids = self.tokenizer(prompt, 77)
        pooled, _ = self.text_encoder(clip_ids)
        return prompt_embeds, pooled

    # -- conditioning preparation (FLUX variants) ---------------------------
    def encode_image_tokens(self, image: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) in [0, 1] -> packed latent tokens (B, S, 64)."""
        if self.vae is None or self.vae.encoder is None:
            raise ValueError("image conditioning needs a VAE with an encoder")
        z = self.vae.encode(image.astype(jnp.bfloat16))
        return pack_latents(z).astype(jnp.bfloat16)

    def prepare_kontext(self, image: jnp.ndarray):
        """FLUX.1-Kontext reference image -> (tokens, ids): the conditioning
        tokens ride the sequence axis with rope frame index 1 (the model
        attends to them; only the first S_img velocity rows integrate)."""
        tokens = self.encode_image_tokens(image)
        h2 = image.shape[1] // 16
        w2 = image.shape[2] // 16
        ids = make_img_ids(h2, w2).at[:, 0].set(1)
        return tokens, ids

    def prepare_control(self, control_image: jnp.ndarray) -> jnp.ndarray:
        """flux-canny/depth conditioning: VAE-encoded control image packed
        to (B, S_img, 64), channel-concatenated each step (in_channels 128)."""
        return self.encode_image_tokens(control_image)

    def prepare_fill(self, image: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """flux-fill conditioning (in_channels 384): masked-image latents
        (64) + the binary mask 8x8-patchified to 256 channels.

        image (B, H, W, 3) in [0,1]; mask (B, H, W) with 1 = inpaint."""
        b, h, w = mask.shape
        masked = image * (1.0 - mask[..., None])
        img_tok = self.encode_image_tokens(masked)  # (B, S, 64)
        m = mask.reshape(b, h // 8, 8, w // 8, 8)
        m = m.transpose(0, 1, 3, 2, 4).reshape(b, h // 8, w // 8, 64)
        # 2x2 latent patchify to token resolution -> 256 mask channels
        m = m.reshape(b, h // 16, 2, w // 16, 2, 64)
        m = m.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // 16) * (w // 16), 256)
        return jnp.concatenate(
            [img_tok, m.astype(jnp.bfloat16)], axis=-1
        )  # (B, S, 320)

    def __call__(
        self,
        prompt=None,
        prompt_embeds: jnp.ndarray | None = None,
        pooled_prompt_embeds: jnp.ndarray | None = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.5,
        seed: int = 0,
        latents: jnp.ndarray | None = None,
        cache: str | None = None,  # None | "fb" | "double_fb" | "teacache"
        cache_hit_ratio: float | None = None,  # force an auditable hit count
        residual_diff_threshold: float = 0.12,
        single_residual_diff_threshold: float = 0.09,
        teacache_rel_l1_thresh: float = 0.6,
        teacache_model_name: str = "flux",  # "flux" | "flux-kontext" coefficients
        controlnet_block_samples=None,
        controlnet_single_block_samples=None,
        image: jnp.ndarray | None = None,  # Kontext reference (B, H, W, 3) in [0,1]
        cond_tokens: jnp.ndarray | None = None,  # pre-packed seq conditioning
        cond_ids: jnp.ndarray | None = None,
        control_latents: jnp.ndarray | None = None,  # channel-concat (B, S_img, C)
        scan_steps: bool = True,  # False: python loop (per-step callbacks)
    ) -> FluxPipelineOutput:
        if prompt_embeds is None:
            prompt_embeds, pooled_prompt_embeds = self.encode_prompt(prompt)
        model = self.transformer
        cfg = model.cfg

        b = prompt_embeds.shape[0]
        lh, lw = height // 8, width // 8  # latent dims (VAE stride 8)
        s_img = (lh // 2) * (lw // 2)
        s_txt = prompt_embeds.shape[1]

        if latents is None:
            key = jax.random.PRNGKey(seed)
            # noise is always the 16-channel image latent; conditioning
            # channels (fill 384, canny/depth 128 in_channels) come from
            # control_latents at each step
            lat = jax.random.normal(key, (b, cfg.out_channels // 4, lh, lw), jnp.float32)
            latents = pack_latents(lat).astype(jnp.bfloat16)

        if image is not None:
            cond_tokens, cond_ids = self.prepare_kontext(image)

        img_ids = make_img_ids(lh // 2, lw // 2)
        txt_ids = jnp.zeros((s_txt, 3), jnp.int32)
        s_model = s_img
        if cond_tokens is not None:
            img_ids = jnp.concatenate([img_ids, cond_ids], axis=0)
            s_model = s_img + cond_tokens.shape[1]
        sigmas = flux_sigmas(num_inference_steps, image_seq_len=s_img)
        guidance = (
            jnp.full((b,), guidance_scale, jnp.float32)
            if cfg.guidance_embeds
            else None
        )

        if scan_steps:
            if cache in ("fb", "double_fb"):
                state = init_fb_state(b, s_model, s_txt, cfg.dim)
            elif cache == "teacache":
                state = init_teacache_state(b, s_model, cfg.dim)
            else:
                state = jnp.zeros(())
        else:
            if cond_tokens is not None or control_latents is not None:
                raise ValueError(
                    "image/control conditioning requires scan_steps=True"
                )
            step_fn, state = self._make_step(
                cache, b, s_img, s_txt, num_inference_steps,
                residual_diff_threshold, single_residual_diff_threshold,
                teacache_rel_l1_thresh,
            )

        lat_f = latents.astype(jnp.float32)
        if scan_steps:
            sig_pairs = jnp.stack(
                [jnp.asarray(sigmas[:-1]), jnp.asarray(sigmas[1:])], axis=1
            )
            force_sched = None
            if cache_hit_ratio is not None:
                if cache not in ("fb", "double_fb"):
                    raise ValueError("cache_hit_ratio needs an FB cache")
                from ..caching.fbcache import make_hit_schedule

                force_sched = jnp.asarray(
                    make_hit_schedule(num_inference_steps, cache_hit_ratio)
                )
            lat_f, state = _denoise_scanned(
                model, lat_f, state, prompt_embeds, pooled_prompt_embeds,
                guidance, controlnet_block_samples, controlnet_single_block_samples,
                img_ids, txt_ids, sig_pairs,
                cond_tokens, control_latents, force_sched,
                cache_kind=cache, thresh=residual_diff_threshold,
                single_thresh=single_residual_diff_threshold,
                tea_thresh=teacache_rel_l1_thresh,
                num_steps=num_inference_steps,
                tea_model_name=teacache_model_name,
            )
        else:
            for i in range(num_inference_steps):
                lat_f, state = step_fn(
                    model,
                    lat_f,
                    state,
                    prompt_embeds,
                    pooled_prompt_embeds,
                    jnp.full((b,), float(sigmas[i]), jnp.float32),
                    img_ids,
                    txt_ids,
                    guidance,
                    jnp.float32(sigmas[i]),
                    jnp.float32(sigmas[i + 1]),
                    controlnet_block_samples,
                    controlnet_single_block_samples,
                )

        latents = lat_f.astype(jnp.bfloat16)
        images = None
        if self.vae is not None:
            z = unpack_latents(latents, lh, lw).astype(jnp.bfloat16)
            images = self.vae.decode(z)
        hits = getattr(state, "hits", None)
        return FluxPipelineOutput(images=images, latents=latents,
                                  cache_hits=hits)

    def _make_step(
        self, cache, b, s_img, s_txt, num_steps,
        thresh, single_thresh, tea_thresh,
    ):
        cfg = self.transformer.cfg

        if cache in ("fb", "double_fb"):
            state = init_fb_state(b, s_img, s_txt, cfg.dim)
            kw = dict(
                residual_diff_threshold=thresh,
                single_residual_diff_threshold=(
                    single_thresh if cache == "double_fb" else None
                ),
            )

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def step(model, lat, st, pe, pool, t, iids, tids, g, sig, sig_next, cb, csb):
                vel, st = fb_cached_forward(
                    model, st, lat.astype(jnp.bfloat16), pe, pool, t, iids, tids, g,
                    controlnet_block_samples=cb,
                    controlnet_single_block_samples=csb, **kw
                )
                return euler_step(lat, vel, sig, sig_next), st

            return step, state

        if cache == "teacache":
            state = init_teacache_state(b, s_img, cfg.dim)

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def step(model, lat, st, pe, pool, t, iids, tids, g, sig, sig_next, cb, csb):
                vel, st = teacache_forward(
                    model, st, lat.astype(jnp.bfloat16), pe, pool, t, iids, tids, g,
                    num_steps=num_steps, rel_l1_thresh=tea_thresh,
                    controlnet_block_samples=cb,
                    controlnet_single_block_samples=csb,
                )
                return euler_step(lat, vel, sig, sig_next), st

            return step, state

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(model, lat, st, pe, pool, t, iids, tids, g, sig, sig_next, cb, csb):
            vel = model(
                lat.astype(jnp.bfloat16), pe, pool, t, iids, tids, g,
                controlnet_block_samples=cb,
                controlnet_single_block_samples=csb,
            )
            return euler_step(lat, vel, sig, sig_next), st

        return step, jnp.zeros(())


def apply_cache_on_pipe(pipe: FluxPipeline, **kwargs):
    """Reference-API-compatible shim (caching/diffusers_adapters/__init__.py:8):
    caching here is selected per call via ``pipe(..., cache=...)``; this sets
    the defaults on the pipeline object."""
    use_double = kwargs.get("use_double_fb_cache", False)
    pipe.default_cache = "double_fb" if use_double else "fb"
    pipe.default_thresholds = (
        kwargs.get("residual_diff_threshold", 0.12),
        kwargs.get("single_residual_diff_threshold", 0.09),
    )
    return pipe
