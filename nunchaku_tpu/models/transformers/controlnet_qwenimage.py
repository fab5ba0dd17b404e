"""Qwen-Image ControlNet, TPU-native.

The reference drives diffusers' QwenImageControlNetModel next to its
quantized transformer (examples/v1/qwen-image-controlnet.py, tested by
tests/v1/qwenimage/test_qwenimage_controlnet.py) and adds the per-block
residuals inside its forward with the ceil-interval rule
(transformer_qwenimage.py:546-550). Here the ControlNet is TPU-native: a
truncated stack of the same joint MMDiT blocks the Qwen transformer scans
(structurally the FLUX dual-stream block — see transformer_qwenimage.py's
module docstring) plus zero-initialized per-block output projections and a
zero-initialized conditioning embedder, producing the
``controlnet_block_samples`` tensor ``QwenImageTransformer2DModel`` consumes.

``load_qwenimage_controlnet`` reads a diffusers-format
QwenImageControlNetModel safetensors file (e.g.
InstantX/Qwen-Image-ControlNet-Union) — the reference runs these unquantized
in bf16 alongside the quantized main model, and so do we: blocks are built
from plain ``Linear`` layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Module
from ...utils.safetensors import SafeTensors
from ..attention import FeedForward, FluxAttention
from ..embeddings import MLPEmbedder, rope_table, timestep_embedding
from ..linear import Linear
from ..normalization import AdaLayerNormZero
from .controlnet_flux import _fused_qkv, _lin, _vec
from .transformer_flux import FluxTransformerBlock, stack_modules
from .transformer_qwenimage import QwenImageConfig


class QwenImageControlNetModel(Module):
    def __init__(self, cfg, img_in, controlnet_x_embedder, txt_in, time_embed,
                 blocks, controlnet_blocks, txt_norm=None):
        self.cfg = cfg
        self.img_in = img_in
        self.controlnet_x_embedder = controlnet_x_embedder  # zero-init cond input
        self.txt_in = txt_in
        self.time_embed = time_embed
        self.blocks = blocks  # stacked FluxTransformerBlock (num_layers deep)
        self.controlnet_blocks = controlnet_blocks  # stacked zero-init Linear
        self.txt_norm = txt_norm  # RMSNorm weight on raw text states

    @classmethod
    def random_init(cls, key, cfg: QwenImageConfig, num_layers: int = 5):
        ccfg = QwenImageConfig(
            num_layers=num_layers,
            attention_head_dim=cfg.attention_head_dim,
            num_attention_heads=cfg.num_attention_heads,
            joint_attention_dim=cfg.joint_attention_dim,
            in_channels=cfg.in_channels, out_channels=cfg.out_channels,
            axes_dims_rope=cfg.axes_dims_rope, rank=cfg.rank,
            precision=cfg.precision,
        )
        ks = jax.random.split(key, 5)
        dim = cfg.dim
        fcfg = ccfg.as_flux()
        blocks = stack_modules(
            [FluxTransformerBlock.random_init(k, fcfg)
             for k in jax.random.split(ks[0], num_layers)]
        )
        zero_proj = lambda: Linear(
            jnp.zeros((dim, dim), jnp.bfloat16), jnp.zeros((dim,), jnp.bfloat16)
        )
        return cls(
            ccfg,
            Linear.random_init(ks[1], cfg.in_channels, dim),
            Linear(jnp.zeros((cfg.in_channels, dim), jnp.bfloat16),
                   jnp.zeros((dim,), jnp.bfloat16)),
            Linear.random_init(ks[2], cfg.joint_attention_dim, dim),
            MLPEmbedder.random_init(ks[3], 256, dim),
            blocks,
            stack_modules([zero_proj() for _ in range(num_layers)]),
            txt_norm=jnp.ones((cfg.joint_attention_dim,), jnp.bfloat16),
        )

    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, S_img, in_ch) packed latents
        controlnet_cond: jnp.ndarray,  # (B, S_img, in_ch) packed cond latents
        encoder_hidden_states: jnp.ndarray,  # (B, S_txt, joint_dim)
        timestep: jnp.ndarray,  # (B,) in [0, 1]
        img_ids: jnp.ndarray,  # (S_img, 3)
        txt_ids: jnp.ndarray | None = None,
        conditioning_scale: float = 1.0,
        encoder_hidden_states_mask: jnp.ndarray | None = None,  # (B, S_txt)
    ) -> jnp.ndarray:
        """Returns controlnet_block_samples (L, B, S_img, dim)."""
        cfg = self.cfg
        img = (
            self.img_in(hidden_states).astype(jnp.float32)
            + self.controlnet_x_embedder(controlnet_cond).astype(jnp.float32)
        )
        if self.txt_norm is not None:
            from ...ops.reference import rmsnorm

            encoder_hidden_states = rmsnorm(
                encoder_hidden_states, self.txt_norm
            ).astype(encoder_hidden_states.dtype)
        txt = self.txt_in(encoder_hidden_states).astype(jnp.float32)
        temb = self.time_embed(timestep_embedding(timestep * 1000.0, 256)).astype(
            jnp.bfloat16
        )
        s_txt = txt.shape[1]
        if txt_ids is None:
            # Qwen text rope follows token index on every axis
            pos = jnp.arange(s_txt, dtype=jnp.int32)[:, None]
            txt_ids = jnp.tile(pos, (1, 3))
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rot = rope_table(ids, cfg.axes_dims_rope)

        kv_mask = None
        if encoder_hidden_states_mask is not None:
            kv_mask = jnp.concatenate(
                [
                    encoder_hidden_states_mask.astype(jnp.bool_),
                    jnp.ones((img.shape[0], img.shape[1]), jnp.bool_),
                ],
                axis=1,
            )

        def body(carry, layer):
            block, proj = layer
            im, tx = block(*carry, temb, rot, kv_mask=kv_mask)
            sample = proj(im.astype(jnp.bfloat16)).astype(jnp.float32)
            return (im, tx), sample

        (img, txt), samples = jax.lax.scan(
            body, (img, txt), (self.blocks, self.controlnet_blocks)
        )
        return (samples * conditioning_scale).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# diffusers-format loader


def _qwen_dual_block(sd, p, head_dim) -> FluxTransformerBlock:
    """diffusers QwenImageTransformerBlock keys -> the shared joint block.

    Key map (diffusers controlnet_qwenimage / reference
    transformer_qwenimage.py:176-194): img_mod.1 -> norm1.linear,
    txt_mod.1 -> norm1_context.linear, img_mlp/txt_mlp -> ff/ff_context;
    attention names (to_q/add_q_proj/...) match FLUX exactly. Modulation
    chunk order is shift/scale/gate per half (:214-217) — AdaLayerNormZero's.
    """
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
        AdaLayerNormZero(_lin(sd, f"{p}.img_mod.1")),
        AdaLayerNormZero(_lin(sd, f"{p}.txt_mod.1")),
        attn,
        FeedForward(_lin(sd, f"{p}.img_mlp.net.0.proj"),
                    _lin(sd, f"{p}.img_mlp.net.2")),
        FeedForward(_lin(sd, f"{p}.txt_mlp.net.0.proj"),
                    _lin(sd, f"{p}.txt_mlp.net.2")),
    )


def load_qwenimage_controlnet(path, *, head_dim: int = 128,
                              axes_dims_rope=(16, 56, 56)) -> QwenImageControlNetModel:
    """Load a diffusers-format QwenImageControlNetModel safetensors file
    (e.g. InstantX/Qwen-Image-ControlNet-Union)."""
    sd = SafeTensors(path)
    n = 0
    while f"transformer_blocks.{n}.img_mod.1.weight" in sd:
        n += 1
    if n == 0:
        raise ValueError(f"{path}: no transformer_blocks.*.img_mod keys — not "
                         "a diffusers QwenImage ControlNet state dict")

    dim = sd.tensor("img_in.weight").shape[0]
    in_ch = sd.tensor("img_in.weight").shape[1]
    joint_dim = sd.tensor("txt_in.weight").shape[1]
    cfg = QwenImageConfig(
        num_layers=n, attention_head_dim=head_dim,
        num_attention_heads=dim // head_dim, joint_attention_dim=joint_dim,
        in_channels=in_ch, axes_dims_rope=tuple(axes_dims_rope),
        # inert: loaded blocks are plain bf16 Linears (controlnet_flux.py rule)
        precision="int4",
    )
    blocks = stack_modules(
        [_qwen_dual_block(sd, f"transformer_blocks.{i}", head_dim)
         for i in range(n)]
    )
    ctrl = stack_modules(
        [_lin(sd, f"controlnet_blocks.{i}") for i in range(n)]
    )
    txt_norm = (
        jnp.asarray(sd.tensor("txt_norm.weight"), jnp.bfloat16)
        if "txt_norm.weight" in sd else None
    )
    return QwenImageControlNetModel(
        cfg,
        _lin(sd, "img_in"),
        _lin(sd, "controlnet_x_embedder"),
        _lin(sd, "txt_in"),
        MLPEmbedder(_lin(sd, "time_text_embed.timestep_embedder.linear_1"),
                    _lin(sd, "time_text_embed.timestep_embedder.linear_2")),
        blocks,
        ctrl,
        txt_norm=txt_norm,
    )
