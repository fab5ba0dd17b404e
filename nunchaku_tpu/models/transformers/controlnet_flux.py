"""FLUX ControlNet, TPU-native.

The reference consumes diffusers' FluxControlNetModel outputs and interleaves
the residuals into its C++ graph (FluxModel.cpp:1290-1333, tested by
tests/flux/test_flux_txt2img_cache_controlnet.py). Here the ControlNet
itself is also TPU-native: a truncated stack of the same (optionally
quantized) dual-stream blocks plus zero-initialized output projections,
producing the ``controlnet_block_samples`` tensors the main transformer's
scan consumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Module
from ..embeddings import CombinedTimestepEmbeddings, rope_table
from ..linear import Linear
from .transformer_flux import FluxConfig, FluxTransformerBlock, stack_modules


class FluxControlNetModel(Module):
    def __init__(self, cfg, x_embedder, controlnet_x_embedder, context_embedder,
                 time_text_embed, blocks, controlnet_blocks):
        self.cfg = cfg
        self.x_embedder = x_embedder
        self.controlnet_x_embedder = controlnet_x_embedder  # conditioning input
        self.context_embedder = context_embedder
        self.time_text_embed = time_text_embed
        self.blocks = blocks  # stacked FluxTransformerBlock (num_layers deep)
        self.controlnet_blocks = controlnet_blocks  # stacked zero-init Linear

    @classmethod
    def random_init(cls, key, cfg: FluxConfig, num_layers: int = 5):
        ccfg = FluxConfig(
            num_layers=num_layers, num_single_layers=0,
            attention_head_dim=cfg.attention_head_dim,
            num_attention_heads=cfg.num_attention_heads,
            joint_attention_dim=cfg.joint_attention_dim,
            pooled_projection_dim=cfg.pooled_projection_dim,
            in_channels=cfg.in_channels, guidance_embeds=cfg.guidance_embeds,
            axes_dims_rope=cfg.axes_dims_rope, rank=cfg.rank,
            precision=cfg.precision,
        )
        ks = jax.random.split(key, 6)
        dim = cfg.dim
        blocks = stack_modules(
            [FluxTransformerBlock.random_init(k, ccfg)
             for k in jax.random.split(ks[0], num_layers)]
        )
        # zero-init output projections (standard ControlNet init)
        ctrl = stack_modules(
            [Linear(jnp.zeros((dim, dim), jnp.bfloat16), jnp.zeros((dim,), jnp.bfloat16))
             for _ in range(num_layers)]
        )
        return cls(
            ccfg,
            Linear.random_init(ks[1], cfg.in_channels, dim),
            Linear(jnp.zeros((cfg.in_channels, dim), jnp.bfloat16),
                   jnp.zeros((dim,), jnp.bfloat16)),  # zero-init cond embedder
            Linear.random_init(ks[2], cfg.joint_attention_dim, dim),
            CombinedTimestepEmbeddings.random_init(
                ks[3], dim, cfg.pooled_projection_dim, cfg.guidance_embeds
            ),
            blocks,
            ctrl,
        )

    def __call__(
        self,
        hidden_states,  # (B, S_img, in_ch) latents
        controlnet_cond,  # (B, S_img, in_ch) packed conditioning latents
        encoder_hidden_states,
        pooled_projections,
        timestep,
        img_ids,
        txt_ids,
        guidance=None,
        conditioning_scale: float = 1.0,
    ) -> jnp.ndarray:
        """Returns controlnet_block_samples (L, B, S_img, dim)."""
        cfg = self.cfg
        img = (
            self.x_embedder(hidden_states).astype(jnp.float32)
            + self.controlnet_x_embedder(controlnet_cond).astype(jnp.float32)
        )
        txt = self.context_embedder(encoder_hidden_states).astype(jnp.float32)
        temb = self.time_text_embed(timestep, pooled_projections, guidance)
        temb = temb.astype(jnp.bfloat16)
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rot = rope_table(ids, cfg.axes_dims_rope)

        def body(carry, layer):
            block, proj = layer
            im, tx = block(*carry, temb, rot)
            sample = proj(im.astype(jnp.bfloat16)).astype(jnp.float32)
            return (im, tx), sample

        (_, _), samples = jax.lax.scan(
            body, (img, txt), (self.blocks, self.controlnet_blocks)
        )
        return (samples * conditioning_scale).astype(jnp.bfloat16)
