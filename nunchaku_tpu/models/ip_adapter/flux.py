"""IP-Adapter for FLUX: image-prompt conditioning via per-layer
image cross-attention.

Counterpart of nunchaku/models/ip_adapter/ (IPA_TransformerBlocks
utils.py:25-491 + apply_IPA_on_pipe diffusers_adapters/flux.py:20-130).
The reference runs a per-layer C++ callback returning ip_query and adds a
per-layer image cross-attention; here the per-layer K/V projections of the
image embeddings are precomputed once per generation and ride the dual
blocks' scan as stacked xs — the blocks themselves already accept
``ip_kv`` (models/transformers/transformer_flux.py).

A perceiver resampler for CLIP image embeds is the usual image_proj; a
linear projection stands in until real IPA weights are loadable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Module
from ..linear import Linear


class FluxIPAdapter(Module):
    """Per-dual-layer K/V projections of the image prompt embeddings."""

    def __init__(self, to_k_ip: Linear, to_v_ip: Linear, image_proj: Linear | None,
                 *, scale: float = 1.0):
        # to_k_ip/to_v_ip weights are stacked (L, cross_dim, inner)
        self.to_k_ip = to_k_ip
        self.to_v_ip = to_v_ip
        self.image_proj = image_proj
        self.scale = scale

    @classmethod
    def random_init(cls, key, num_layers, cross_dim, inner):
        ks = jax.random.split(key, 3)
        import math

        std = 1.0 / math.sqrt(cross_dim)
        return cls(
            Linear(jax.random.normal(ks[0], (num_layers, cross_dim, inner), jnp.bfloat16) * std,
                   jnp.zeros((num_layers, inner), jnp.bfloat16)),
            Linear(jax.random.normal(ks[1], (num_layers, cross_dim, inner), jnp.bfloat16) * std,
                   jnp.zeros((num_layers, inner), jnp.bfloat16)),
            Linear.random_init(ks[2], cross_dim, cross_dim),
        )

    def project(self, image_embeds: jnp.ndarray):
        """(B, S_ip, cross_dim) -> stacked (L, B, S_ip, inner) k/v for scan xs."""
        x = image_embeds
        if self.image_proj is not None:
            x = self.image_proj(x)
        k_ip = jnp.einsum(
            "bsc,lci->lbsi", x.astype(jnp.bfloat16), self.to_k_ip.weight
        ) + self.to_k_ip.bias[:, None, None]
        v_ip = jnp.einsum(
            "bsc,lci->lbsi", x.astype(jnp.bfloat16), self.to_v_ip.weight
        ) + self.to_v_ip.bias[:, None, None]
        return k_ip.astype(jnp.bfloat16), v_ip.astype(jnp.bfloat16)


def ipa_forward(model, ip_adapter: FluxIPAdapter, image_embeds, *model_args):
    """FLUX forward with IP-Adapter conditioning on every dual block."""
    (hidden_states, encoder_hidden_states, pooled_projections, timestep,
     img_ids, txt_ids, guidance) = model_args
    img, txt, temb, rot = model.embed(
        hidden_states, encoder_hidden_states, pooled_projections,
        timestep, img_ids, txt_ids, guidance,
    )
    k_ip, v_ip = ip_adapter.project(image_embeds)

    def body(carry, layer):
        block, kl, vl = layer
        im, tx = block(*carry, temb, rot, ip_kv=(kl, vl), ip_scale=ip_adapter.scale)
        return (im, tx), None

    (img, txt), _ = jax.lax.scan(
        body, (img, txt), (model.transformer_blocks, k_ip, v_ip)
    )
    s_txt = txt.shape[1]
    x = jnp.concatenate([txt, img], axis=1)
    x = model.run_singles(x, temb, rot, s_txt)
    return model.head(x[:, s_txt:], temb)
