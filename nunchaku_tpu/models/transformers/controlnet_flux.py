"""FLUX ControlNet, TPU-native.

The reference consumes diffusers' FluxControlNetModel outputs and interleaves
the residuals into its C++ graph (FluxModel.cpp:1290-1333, tested by
tests/flux/test_flux_txt2img_cache_controlnet.py). Here the ControlNet
itself is also TPU-native: a truncated stack of the same dual-stream blocks
(optionally followed by single-stream blocks — the InstantX/union layout)
plus zero-initialized output projections, producing the
``controlnet_block_samples`` / ``controlnet_single_block_samples`` tensors
the main transformer's scan consumes.

``load_flux_controlnet`` reads a diffusers-format FluxControlNetModel
safetensors file (bf16, torch (out, in) weights) — the reference runs these
checkpoints unquantized alongside the quantized main model, and so do we:
blocks are built from plain ``Linear`` layers (every block path is
duck-typed over its linears).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module
from ...utils.safetensors import SafeTensors
from ..embeddings import CombinedTimestepEmbeddings, MLPEmbedder, rope_table
from ..linear import Linear
from ..attention import FeedForward, FluxAttention
from ..normalization import AdaLayerNormZero, AdaLayerNormZeroSingle
from .transformer_flux import (
    FluxConfig,
    FluxSingleTransformerBlock,
    FluxTransformerBlock,
    stack_modules,
)


class FluxControlNetModel(Module):
    def __init__(self, cfg, x_embedder, controlnet_x_embedder, context_embedder,
                 time_text_embed, blocks, controlnet_blocks,
                 single_blocks=None, controlnet_single_blocks=None,
                 mode_embedder=None):
        self.cfg = cfg
        self.x_embedder = x_embedder
        self.controlnet_x_embedder = controlnet_x_embedder  # conditioning input
        self.context_embedder = context_embedder
        self.time_text_embed = time_text_embed
        self.blocks = blocks  # stacked FluxTransformerBlock (num_layers deep)
        self.controlnet_blocks = controlnet_blocks  # stacked zero-init Linear
        self.single_blocks = single_blocks  # stacked FluxSingleTransformerBlock
        self.controlnet_single_blocks = controlnet_single_blocks
        self.mode_embedder = mode_embedder  # union: (num_modes, dim) embedding

    @classmethod
    def random_init(cls, key, cfg: FluxConfig, num_layers: int = 5,
                    num_single_layers: int = 0):
        ccfg = FluxConfig(
            num_layers=num_layers, num_single_layers=num_single_layers,
            attention_head_dim=cfg.attention_head_dim,
            num_attention_heads=cfg.num_attention_heads,
            joint_attention_dim=cfg.joint_attention_dim,
            pooled_projection_dim=cfg.pooled_projection_dim,
            in_channels=cfg.in_channels, guidance_embeds=cfg.guidance_embeds,
            axes_dims_rope=cfg.axes_dims_rope, rank=cfg.rank,
            precision=cfg.precision,
        )
        ks = jax.random.split(key, 8)
        dim = cfg.dim
        blocks = stack_modules(
            [FluxTransformerBlock.random_init(k, ccfg)
             for k in jax.random.split(ks[0], num_layers)]
        )
        # zero-init output projections (standard ControlNet init)
        zero_proj = lambda: Linear(
            jnp.zeros((dim, dim), jnp.bfloat16), jnp.zeros((dim,), jnp.bfloat16)
        )
        ctrl = stack_modules([zero_proj() for _ in range(num_layers)])
        singles = ctrl_single = None
        if num_single_layers:
            singles = stack_modules(
                [FluxSingleTransformerBlock.random_init(k, ccfg)
                 for k in jax.random.split(ks[4], num_single_layers)]
            )
            ctrl_single = stack_modules(
                [zero_proj() for _ in range(num_single_layers)]
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
            singles,
            ctrl_single,
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
        controlnet_mode=None,  # union: (B,) int32 mode ids
    ):
        """Returns controlnet_block_samples (L, B, S_img, dim), or a
        (block_samples, single_block_samples) pair when the checkpoint has
        single-stream blocks (diffusers union layout)."""
        cfg = self.cfg
        img = (
            self.x_embedder(hidden_states).astype(jnp.float32)
            + self.controlnet_x_embedder(controlnet_cond).astype(jnp.float32)
        )
        txt = self.context_embedder(encoder_hidden_states).astype(jnp.float32)
        if self.mode_embedder is not None:
            if controlnet_mode is None:
                raise ValueError("union ControlNet requires controlnet_mode")
            mode_tok = jnp.take(self.mode_embedder, controlnet_mode, axis=0)
            txt = jnp.concatenate(
                [mode_tok.astype(jnp.float32)[:, None], txt], axis=1
            )
            txt_ids = jnp.concatenate([txt_ids[:1], txt_ids], axis=0)
        temb = self.time_text_embed(timestep, pooled_projections, guidance)
        temb = temb.astype(jnp.bfloat16)
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rot = rope_table(ids, cfg.axes_dims_rope)

        def body(carry, layer):
            block, proj = layer
            im, tx = block(*carry, temb, rot)
            sample = proj(im.astype(jnp.bfloat16)).astype(jnp.float32)
            return (im, tx), sample

        (img, txt), samples = jax.lax.scan(
            body, (img, txt), (self.blocks, self.controlnet_blocks)
        )
        samples = (samples * conditioning_scale).astype(jnp.bfloat16)
        if self.single_blocks is None:
            return samples

        s_txt = txt.shape[1]
        x = jnp.concatenate([txt, img], axis=1)

        def sbody(carry, layer):
            block, proj = layer
            x = block(carry, temb, rot)
            sample = proj(x[:, s_txt:].astype(jnp.bfloat16)).astype(jnp.float32)
            return x, sample

        _, ssamples = jax.lax.scan(
            sbody, x, (self.single_blocks, self.controlnet_single_blocks)
        )
        return samples, (ssamples * conditioning_scale).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# diffusers-format loader


def _lin(sd, prefix, dtype=jnp.bfloat16) -> Linear:
    """torch nn.Linear '{prefix}.weight' (out, in) -> Linear (in, out)."""
    w = jnp.asarray(np.ascontiguousarray(sd.tensor(prefix + ".weight").T), dtype)
    b = None
    if (prefix + ".bias") in sd:
        b = jnp.asarray(sd.tensor(prefix + ".bias"), dtype)
    return Linear(w, b)


def _fused_qkv(sd, base, names=("to_q", "to_k", "to_v")) -> Linear:
    ws = [np.ascontiguousarray(sd.tensor(f"{base}.{n}.weight").T) for n in names]
    bs = [sd.tensor(f"{base}.{n}.bias") for n in names]
    return Linear(
        jnp.asarray(np.concatenate(ws, axis=1), jnp.bfloat16),
        jnp.asarray(np.concatenate(bs, axis=0), jnp.bfloat16),
    )


def _vec(sd, key):
    return jnp.asarray(sd.tensor(key), jnp.bfloat16)


def _dual_block(sd, p, head_dim) -> FluxTransformerBlock:
    attn = FluxAttention(
        _fused_qkv(sd, f"{p}.attn"),
        _vec(sd, f"{p}.attn.norm_q.weight"),
        _vec(sd, f"{p}.attn.norm_k.weight"),
        to_out=_lin(sd, f"{p}.attn.to_out.0"),
        add_qkv_proj=_fused_qkv(
            sd, f"{p}.attn", ("add_q_proj", "add_k_proj", "add_v_proj")
        ),
        norm_added_q=_vec(sd, f"{p}.attn.norm_added_q.weight"),
        norm_added_k=_vec(sd, f"{p}.attn.norm_added_k.weight"),
        to_add_out=_lin(sd, f"{p}.attn.to_add_out"),
        heads=sd.tensor(f"{p}.attn.to_q.weight").shape[0] // head_dim,
        head_dim=head_dim,
    )
    return FluxTransformerBlock(
        AdaLayerNormZero(_lin(sd, f"{p}.norm1.linear")),
        AdaLayerNormZero(_lin(sd, f"{p}.norm1_context.linear")),
        attn,
        FeedForward(_lin(sd, f"{p}.ff.net.0.proj"), _lin(sd, f"{p}.ff.net.2")),
        FeedForward(
            _lin(sd, f"{p}.ff_context.net.0.proj"), _lin(sd, f"{p}.ff_context.net.2")
        ),
    )


def _single_block(sd, p, head_dim) -> FluxSingleTransformerBlock:
    dim = sd.tensor(f"{p}.proj_out.weight").shape[0]
    proj_out = np.ascontiguousarray(sd.tensor(f"{p}.proj_out.weight").T)  # (5D, D)
    proj_b = sd.tensor(f"{p}.proj_out.bias")
    attn = FluxAttention(
        _fused_qkv(sd, f"{p}.attn"),
        _vec(sd, f"{p}.attn.norm_q.weight"),
        _vec(sd, f"{p}.attn.norm_k.weight"),
        heads=sd.tensor(f"{p}.attn.to_q.weight").shape[0] // head_dim,
        head_dim=head_dim,
    )
    return FluxSingleTransformerBlock(
        AdaLayerNormZeroSingle(_lin(sd, f"{p}.norm.linear")),
        attn,
        _lin(sd, f"{p}.proj_mlp"),
        # diffusers proj_out acts on [attn | mlp]: split K into the
        # attn-out (K=dim) and mlp-out (K=4*dim) halves
        # (transformer_flux_v2.py:283-289 split rule)
        Linear(jnp.asarray(proj_out[dim:], jnp.bfloat16),
               jnp.asarray(proj_b, jnp.bfloat16)),
        Linear(jnp.asarray(proj_out[:dim], jnp.bfloat16), None),
    )


def load_flux_controlnet(path, *, head_dim: int = 128,
                         axes_dims_rope=(16, 56, 56)) -> FluxControlNetModel:
    """Load a diffusers-format FluxControlNetModel safetensors file (e.g.
    InstantX/FLUX.1-dev-Controlnet-Union[-Pro], Shakker-Labs variants).

    Key schema is diffusers' FluxControlNetModel state dict; the reference
    runs these through diffusers in bf16 next to the quantized transformer
    (examples/flux.1-dev-controlnet-union-pro.py) — here they map onto the
    same TPU block graph with plain Linears.
    """
    sd = SafeTensors(path)
    n_dual = 0
    while f"transformer_blocks.{n_dual}.norm1.linear.weight" in sd:
        n_dual += 1
    n_single = 0
    while f"single_transformer_blocks.{n_single}.norm.linear.weight" in sd:
        n_single += 1
    if n_dual == 0:
        raise ValueError(f"{path}: no transformer_blocks.* keys — not a "
                         "diffusers FLUX ControlNet state dict")

    dim = sd.tensor("x_embedder.weight").shape[0]
    in_ch = sd.tensor("x_embedder.weight").shape[1]
    joint_dim = sd.tensor("context_embedder.weight").shape[1]
    pooled_dim = sd.tensor(
        "time_text_embed.text_embedder.linear_1.weight"
    ).shape[1]
    guidance = "time_text_embed.guidance_embedder.linear_1.weight" in sd
    heads = dim // head_dim

    cfg = FluxConfig(
        num_layers=n_dual, num_single_layers=n_single,
        attention_head_dim=head_dim, num_attention_heads=heads,
        joint_attention_dim=joint_dim, pooled_projection_dim=pooled_dim,
        in_channels=in_ch, guidance_embeds=guidance,
        axes_dims_rope=tuple(axes_dims_rope), precision="int4",
    )

    temb = CombinedTimestepEmbeddings(
        MLPEmbedder(_lin(sd, "time_text_embed.timestep_embedder.linear_1"),
                    _lin(sd, "time_text_embed.timestep_embedder.linear_2")),
        MLPEmbedder(_lin(sd, "time_text_embed.text_embedder.linear_1"),
                    _lin(sd, "time_text_embed.text_embedder.linear_2")),
        MLPEmbedder(_lin(sd, "time_text_embed.guidance_embedder.linear_1"),
                    _lin(sd, "time_text_embed.guidance_embedder.linear_2"))
        if guidance else None,
    )
    blocks = stack_modules(
        [_dual_block(sd, f"transformer_blocks.{i}", head_dim)
         for i in range(n_dual)]
    )
    ctrl = stack_modules(
        [_lin(sd, f"controlnet_blocks.{i}") for i in range(n_dual)]
    )
    singles = ctrl_single = None
    if n_single:
        singles = stack_modules(
            [_single_block(sd, f"single_transformer_blocks.{i}", head_dim)
             for i in range(n_single)]
        )
        ctrl_single = stack_modules(
            [_lin(sd, f"controlnet_single_blocks.{i}") for i in range(n_single)]
        )
    mode_emb = None
    if "controlnet_mode_embedder.weight" in sd:
        mode_emb = jnp.asarray(
            sd.tensor("controlnet_mode_embedder.weight"), jnp.bfloat16
        )
    return FluxControlNetModel(
        cfg,
        _lin(sd, "x_embedder"),
        _lin(sd, "controlnet_x_embedder"),
        _lin(sd, "context_embedder"),
        temb,
        blocks,
        ctrl,
        singles,
        ctrl_single,
        mode_emb,
    )
