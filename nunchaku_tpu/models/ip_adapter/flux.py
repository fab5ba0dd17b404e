"""IP-Adapter for FLUX: image-prompt conditioning via per-layer
image cross-attention.

Counterpart of nunchaku/models/ip_adapter/ (IPA_TransformerBlocks
utils.py:25-491 + apply_IPA_on_pipe diffusers_adapters/flux.py:20-130).
The reference runs a per-layer C++ callback returning ip_query and adds a
per-layer image cross-attention; here the per-layer K/V projections of the
image embeddings are precomputed once per generation and ride the dual
blocks' scan as stacked xs — the blocks themselves already accept
``ip_kv`` (models/transformers/transformer_flux.py).

The real-weights path: CLIP-ViT-L/14 image embeds (text_encoders/clip.py
CLIPVisionModel) -> ImageProjection (diffusers FluxIPAdapterMixin's
image_proj: Linear 768 -> num_tokens x 4096 + LayerNorm) -> per-layer K/V
projections loaded from the XLabs flux-ip-adapter safetensors
(reference load_ip_adapter_weights_per_layer, utils.py:381-446).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module
from ..linear import Linear


class ImageProjection(Module):
    """diffusers ImageProjection: Linear(embed_dim -> T*cross) + LayerNorm.

    Projects the CLIP image_embeds vector into T image-prompt tokens of the
    joint attention dim (XLabs flux IPA: T=4, cross=4096)."""

    def __init__(self, proj: Linear, norm_w, norm_b, *, num_tokens: int):
        self.proj = proj
        self.norm_w, self.norm_b = norm_w, norm_b
        self.num_tokens = num_tokens

    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        b = image_embeds.shape[0]
        x = self.proj(image_embeds).reshape(b, self.num_tokens, -1)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        out = out * self.norm_w.astype(jnp.float32) + self.norm_b.astype(jnp.float32)
        return out.astype(jnp.bfloat16)


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
        """Image embeds -> stacked (L, B, S_ip, inner) k/v for scan xs.

        2-D (B, clip_proj_dim) input runs through ImageProjection first
        (the diffusers encode_image contract); 3-D input is taken as
        already-projected (B, S_ip, cross_dim) prompt tokens."""
        x = image_embeds
        if image_embeds.ndim == 2:
            if not isinstance(self.image_proj, ImageProjection):
                raise ValueError("2-D image_embeds need loaded image_proj weights")
            x = self.image_proj(image_embeds)
        elif self.image_proj is not None and not isinstance(self.image_proj, ImageProjection):
            x = self.image_proj(x)
        k_ip = jnp.einsum(
            "bsc,lci->lbsi", x.astype(jnp.bfloat16), self.to_k_ip.weight
        ) + self.to_k_ip.bias[:, None, None]
        v_ip = jnp.einsum(
            "bsc,lci->lbsi", x.astype(jnp.bfloat16), self.to_v_ip.weight
        ) + self.to_v_ip.bias[:, None, None]
        return k_ip.astype(jnp.bfloat16), v_ip.astype(jnp.bfloat16)


def load_flux_ip_adapter(path_or_tensors, *, scale: float = 1.0) -> FluxIPAdapter:
    """Load an XLabs-AI/flux-ip-adapter(-v2) safetensors file.

    Per-layer key schema (reference load_ip_adapter_weights_per_layer,
    nunchaku/models/ip_adapter/utils.py:417-430):
      double_blocks.{i}.processor.ip_adapter_double_stream_{k,v}_proj.{weight,bias}
    image_proj schema: either the diffusers-converted ``image_proj.proj`` /
    ``image_proj.norm`` or the raw XLabs ``ip_adapter_proj_model.proj`` /
    ``ip_adapter_proj_model.norm`` prefixes.
    """
    if isinstance(path_or_tensors, dict):
        sd = path_or_tensors
    else:
        from ...utils.safetensors import load_safetensors

        sd, _ = load_safetensors(path_or_tensors)

    layer_ids = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("double_blocks.")}
    )
    if not layer_ids:
        raise ValueError("no double_blocks.* IP-Adapter keys found")

    def t(key):  # torch Linear weight (out, in) -> (in, out)
        return np.asarray(sd[key]).astype(np.float32)

    kw, kb, vw, vb = [], [], [], []
    for i in layer_ids:
        base = f"double_blocks.{i}.processor.ip_adapter_double_stream"
        kw.append(t(f"{base}_k_proj.weight").T)
        kb.append(t(f"{base}_k_proj.bias"))
        vw.append(t(f"{base}_v_proj.weight").T)
        vb.append(t(f"{base}_v_proj.bias"))

    to_k = Linear(jnp.asarray(np.stack(kw), jnp.bfloat16),
                  jnp.asarray(np.stack(kb), jnp.bfloat16))
    to_v = Linear(jnp.asarray(np.stack(vw), jnp.bfloat16),
                  jnp.asarray(np.stack(vb), jnp.bfloat16))

    image_proj = None
    for prefix in ("image_proj", "ip_adapter_proj_model"):
        if f"{prefix}.proj.weight" in sd:
            pw = t(f"{prefix}.proj.weight").T  # (embed, T*cross)
            pb = t(f"{prefix}.proj.bias")
            nw = t(f"{prefix}.norm.weight")
            nb = t(f"{prefix}.norm.bias")
            cross = kw[0].shape[0]
            image_proj = ImageProjection(
                Linear(jnp.asarray(pw, jnp.bfloat16), jnp.asarray(pb, jnp.bfloat16)),
                jnp.asarray(nw, jnp.bfloat16), jnp.asarray(nb, jnp.bfloat16),
                num_tokens=pw.shape[1] // cross,
            )
            break
    return FluxIPAdapter(to_k, to_v, image_proj, scale=scale)


def ipa_forward(model, ip_adapter: FluxIPAdapter, image_embeds, *model_args):
    """FLUX forward with IP-Adapter conditioning on every dual block."""
    (hidden_states, encoder_hidden_states, pooled_projections, timestep,
     img_ids, txt_ids, guidance) = model_args
    img, txt, temb, rot = model.embed(
        hidden_states, encoder_hidden_states, pooled_projections,
        timestep, img_ids, txt_ids, guidance,
    )
    kv = ip_adapter.project(image_embeds)
    img, txt = model.run_dual(
        img, txt, temb, rot, ip_kv=kv, ip_scale=ip_adapter.scale
    )
    s_txt = txt.shape[1]
    x = jnp.concatenate([txt, img], axis=1)
    x = model.run_singles(x, temb, rot, s_txt)
    return model.head(x[:, s_txt:], temb)


def ipa_fb_cached_forward(
    model, ip_adapter: FluxIPAdapter, image_embeds, state, *model_args,
    residual_diff_threshold: float = 0.12,
    single_residual_diff_threshold: float | None = None,
    force=None,
):
    """IP-Adapter composed with (double) FB cache: per-layer image K/V ride
    every computed dual block; hits replay residuals that already carry the
    conditioning — the reference's IPA_TransformerBlocks extends the cached
    blocks class (nunchaku/models/ip_adapter/utils.py:25-491), so IPA and
    caching are one path there too. Returns (velocity, new_state)."""
    from ...caching.fbcache import fb_cached_forward

    kv = ip_adapter.project(image_embeds)
    return fb_cached_forward(
        model, state, *model_args,
        residual_diff_threshold=residual_diff_threshold,
        single_residual_diff_threshold=single_residual_diff_threshold,
        force=force, ip_kv=kv, ip_scale=ip_adapter.scale,
    )
