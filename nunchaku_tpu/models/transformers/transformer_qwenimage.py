"""Qwen-Image transformer (20B MMDiT), TPU-native.

Counterpart of nunchaku/models/transformers/transformer_qwenimage.py
(NunchakuQwenImageTransformerBlock :159-310, NunchakuQwenImageTransformer2DModel
:310+). Architecturally the Qwen-Image block is the FLUX dual-stream block
(per-stream AdaLN-Zero modulation -> joint attention -> gated GELU MLPs;
the reference even reuses NunchakuFeedForward), so the TPU build shares
FluxTransformerBlock wholesale: 60 joint blocks, no single-stream stack,
timestep-only conditioning, and text rope positions that follow the token
index instead of zeros.

Structural parity now; checkpoint loading lands with a real Qwen-Image
artifact to validate against (the on-disk schema matches the FLUX v1 block
naming via the same C++ module registry).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...core.module import Module
from ..embeddings import CombinedTimestepEmbeddings, MLPEmbedder, rope_table
from ..linear import Linear
from ..normalization import AdaLayerNormContinuous
from ..linear import attach_stacked_weights
from .transformer_flux import FluxConfig, FluxTransformerBlock, stack_modules


@dataclass(frozen=True)
class QwenImageConfig:
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584  # Qwen2.5-VL hidden size
    in_channels: int = 64
    out_channels: int = 16
    axes_dims_rope: tuple = (16, 56, 56)
    rank: int = 32
    precision: str = "int4"

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def proj_out_channels(self) -> int:
        # packed 2x2 patches: proj_out emits patch_size^2 * out_channels
        # (diffusers QwenImageTransformer2DModel proj_out)
        return self.out_channels * 4

    def as_flux(self) -> FluxConfig:
        return FluxConfig(
            num_layers=self.num_layers,
            num_single_layers=0,
            attention_head_dim=self.attention_head_dim,
            num_attention_heads=self.num_attention_heads,
            joint_attention_dim=self.joint_attention_dim,
            pooled_projection_dim=0,
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            guidance_embeds=False,
            axes_dims_rope=self.axes_dims_rope,
            rank=self.rank,
            precision=self.precision,
        )


class QwenImageTransformer2DModel(Module):
    def __init__(self, cfg, img_in, txt_in, time_embed, blocks, norm_out, proj_out,
                 txt_norm=None):
        self.cfg = cfg
        self.img_in = img_in
        self.txt_in = txt_in
        self.time_embed = time_embed
        self.blocks = blocks  # stacked FluxTransformerBlock (Qwen == joint MMDiT)
        self.norm_out = norm_out
        self.proj_out = proj_out
        # model-level RMSNorm on the raw text states (reference
        # transformer_qwenimage.py:505 txt_norm before txt_in)
        self.txt_norm = txt_norm

    def enable_fused_qkv_prep(self, producer: bool = True):
        """Fused attention prologue for the Qwen MMDiT (shares the FLUX
        dual block): half-split q/k weight permutation + the head-gridded
        Pallas qkv_rope_producer. See FluxTransformer2DModel for the
        measured wins. Call once after load (before parallelize)."""
        from ..attention import permute_qk_halfsplit

        permute_qk_halfsplit(self.blocks.attn)
        if producer:
            self.blocks.attn.prep_producer = True
        self._rope_halfsplit = True
        return self

    @classmethod
    def random_init(cls, key, cfg: QwenImageConfig):
        ks = jax.random.split(key, 6)
        fcfg = cfg.as_flux()
        blocks = stack_modules(
            [
                FluxTransformerBlock.random_init(k, fcfg)
                for k in jax.random.split(ks[0], cfg.num_layers)
            ]
        )
        return cls(
            cfg,
            Linear.random_init(ks[1], cfg.in_channels, cfg.dim),
            Linear.random_init(ks[2], cfg.joint_attention_dim, cfg.dim),
            MLPEmbedder.random_init(ks[3], 256, cfg.dim),
            blocks,
            AdaLayerNormContinuous.random_init(ks[4], cfg.dim),
            Linear.random_init(ks[5], cfg.dim, cfg.proj_out_channels),
        )

    def embed(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        timestep: jnp.ndarray,
        img_ids: jnp.ndarray,
        txt_ids: jnp.ndarray | None = None,
    ):
        """Input projections + conditioning -> (img, txt, temb, rot)."""
        from ..embeddings import timestep_embedding

        cfg = self.cfg
        img = self.img_in(hidden_states).astype(jnp.float32)
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
        if getattr(self, "_rope_halfsplit", False):
            from ...ops.attention import rope_table_halfsplit

            rot = rope_table_halfsplit(rot)
        return img, txt, temb, rot

    def head(self, img: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        out = self.norm_out(img.astype(jnp.bfloat16), temb)
        return self.proj_out(out).astype(jnp.bfloat16)

    def kv_mask_for(self, img, encoder_hidden_states_mask):
        """Joint [txt; img] kv-validity mask from a padded-prompt mask.

        Reference ``encoder_hidden_states_mask`` (transformer_qwenimage.py
        forward): every query ignores padded text keys, so valid rows match
        the unpadded computation exactly."""
        if encoder_hidden_states_mask is None:
            return None
        b = img.shape[0]
        return jnp.concatenate(
            [
                encoder_hidden_states_mask.astype(jnp.bool_),
                jnp.ones((b, img.shape[1]), jnp.bool_),
            ],
            axis=1,
        )

    def run_blocks(self, img, txt, temb, rot, start=0, stop=None,
                   controlnet_block_samples=None, kv_mask=None):
        """Scan joint blocks [start, stop) (static bounds).

        Mirrors FluxTransformer2DModel.run_dual so the FB cache can run
        block 0 alone as its decision indicator (reference cache-dit DBCache
        over QwenImage, examples/v1/qwen-image-cache-dit.py)."""
        stop = self.cfg.num_layers if stop is None else stop
        blocks = jax.tree.map(lambda a: a[start:stop], self.blocks)

        # stacked-weight prefetch (see FluxTransformer2DModel.run_dual):
        # int8 threads the fc1/fc2 chain stacks; 4-bit modes attach every
        # Pallas linear's stack so no per-block weight-slice copy runs
        stk = (
            (blocks.ff.fc1.qweight, blocks.ff.fc2.qweight),
            (blocks.ff_context.fc1.qweight, blocks.ff_context.fc2.qweight),
        ) if getattr(blocks.ff.fc1, "precision", None) in ("int8", "w4a8") else None
        pallas_w = getattr(blocks.ff.fc1, "precision", None) in (
            "w4a8", "int4", "nvfp4"
        )

        # ControlNet residuals spread with the ceil-interval rule the
        # reference applies per block (transformer_qwenimage.py:546-550 —
        # identical to the FLUX rule, so _expand_controlnet is shared)
        from .transformer_flux import _expand_controlnet

        ctrl = _expand_controlnet(controlnet_block_samples, self.cfg.num_layers)
        if ctrl is not None:
            ctrl = ctrl[start:stop]

        n = stop - start

        def body(carry, layer):
            block, c, i = layer
            ffs = None
            if stk is not None:
                ffs = ((*stk[0], i), (*stk[1], i))
            if pallas_w:
                block = attach_stacked_weights(block, blocks, i)
            im, tx = block(*carry, temb, rot, ff_stacked=ffs, kv_mask=kv_mask)
            if c is not None:
                if c.shape[1] != im.shape[1]:
                    # edit-mode streams append cond tokens after the S_img
                    # latents; residuals only target the generated rows
                    im = im.at[:, : c.shape[1]].add(c.astype(im.dtype))
                else:
                    im = im + c.astype(im.dtype)
            return (im, tx), None

        (img, txt), _ = jax.lax.scan(
            body, (img, txt),
            (blocks, ctrl, jnp.arange(n, dtype=jnp.int32)),
        )
        return img, txt

    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, S_img, in_channels)
        encoder_hidden_states: jnp.ndarray,  # (B, S_txt, joint_dim)
        timestep: jnp.ndarray,  # (B,)
        img_ids: jnp.ndarray,  # (S_img, 3)
        txt_ids: jnp.ndarray | None = None,  # (S_txt, 3); default: index rope
        controlnet_block_samples: jnp.ndarray | None = None,  # (L, B, S_img, D)
        encoder_hidden_states_mask: jnp.ndarray | None = None,  # (B, S_txt) bool
    ) -> jnp.ndarray:
        img, txt, temb, rot = self.embed(
            hidden_states, encoder_hidden_states, timestep, img_ids, txt_ids
        )
        img, txt = self.run_blocks(
            img, txt, temb, rot,
            controlnet_block_samples=controlnet_block_samples,
            kv_mask=self.kv_mask_for(img, encoder_hidden_states_mask),
        )
        return self.head(img, temb)
