"""SANA checkpoint loader (v1 key schema from the C++ module registry).

Key schema per block (src/SanaModel.cpp:17-231 registerChildren/Params under
``transformer_blocks.{i}`` — SanaModel.cpp:335):

  attn.qkv_proj.* attn.out_proj.* [attn.pag_to_v.*]   GEMM_W4A4 tensors
  cross_attn.q_linear.* cross_attn.out_proj.*         GEMM_W4A4
  cross_attn.kv_linear.{weight,bias}                  GEMM_F16 (16-bit)
  ff.inverted_conv.* ff.point_conv.*                  GEMM_W4A4
  ff.depth_conv.{weight,bias}                         DWCONV (16-bit)
  scale_shift_table                                   (6, dim)

plus the unquantized diffusers part (the reference splits the state dict,
transformer_sana.py): ``patch_embed.proj`` (1x1 conv), ``caption_projection
.linear_1/linear_2`` (gelu-tanh MLP), ``adaln_single.emb.timestep_embedder
.linear_1/2`` + ``adaln_single.linear``, model-level ``scale_shift_table``
(2, dim) and ``proj_out``.

GLU channel order: our fuse_glu quantize consumes half-split [value | gate]
(the diffusers GLUMBConv chunk convention); the reference kernel consumes
interleaved pairs with pre-interleaved converted weights (gemm_base.cuh:622)
— real artifacts may need a de-interleave permutation on point_conv's K and
inverted/depth channel axes; synthesized-checkpoint tests pin the half-split
schema until a real artifact is mountable.
"""

from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module
from ...utils.safetensors import SafeTensors
from ..embeddings import MLPEmbedder
from ..linear import Linear
from .loader import _Reader, _decode_linear, _decode_svdq, _f32
from .transformer_flux import stack_modules
from .transformer_sana import (
    SanaConfig,
    SanaCrossAttention,
    SanaGLUMBConv,
    SanaLinearAttention,
    SanaTransformer2DModel,
    SanaTransformerBlock,
)


class CaptionProjection(Module):
    """PixArtAlphaTextProjection: linear_2(gelu_tanh(linear_1(x)))."""

    def __init__(self, fc1: Linear, fc2: Linear):
        self.fc1 = fc1
        self.fc2 = fc2

    def __call__(self, x):
        h = self.fc1(x)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True)
        return self.fc2(h.astype(jnp.bfloat16))


def _conv1x1_as_linear(r: _Reader, name: str) -> Linear:
    w = _f32(r(f"{name}.weight"))  # (O, I, kh, kw)
    assert w.shape[-1] == w.shape[-2] == 1, f"{name}: only 1x1 patch embed supported"
    b = jnp.asarray(_f32(r(f"{name}.bias")), jnp.bfloat16) if r.has(f"{name}.bias") else None
    return Linear(jnp.asarray(w[:, :, 0, 0].T, jnp.bfloat16), b)


def load_sana_transformer(path, precision: str | None = None) -> SanaTransformer2DModel:
    st = SafeTensors(path)
    config = json.loads(st.metadata.get("config", "{}"))
    qcfg = json.loads(st.metadata.get("quantization_config", "{}"))
    ckpt_precision = "nvfp4" if "fp4" in str(qcfg.get("weight", {})) else "int4"
    out_precision = precision or ckpt_precision
    if out_precision == "w4a8" and ckpt_precision != "int4":
        out_precision = "int8"

    cfg = SanaConfig(
        num_layers=config.get("num_layers", 20),
        num_attention_heads=config.get("num_attention_heads", 70),
        attention_head_dim=config.get("attention_head_dim", 32),
        num_cross_attention_heads=config.get("num_cross_attention_heads", 20),
        cross_attention_head_dim=config.get("cross_attention_head_dim", 112),
        caption_channels=config.get("caption_channels", 2304),
        in_channels=config.get("in_channels", 32),
        out_channels=config.get("out_channels", 32),
        expand_ratio=config.get("expand_ratio", 2.5),
        rank=qcfg.get("rank", 32),
        precision=out_precision,
    )
    root = _Reader(st)
    kw = dict(precision=ckpt_precision, out_precision=out_precision)

    blocks = []
    for i in range(cfg.num_layers):
        b = _Reader(st, f"transformer_blocks.{i}.")

        def svdq(name):
            return _decode_svdq(b.sub(name), **kw)

        attn = SanaLinearAttention(
            svdq("attn.qkv_proj"),
            svdq("attn.out_proj"),
            svdq("attn.pag_to_v") if b.has("attn.pag_to_v.qweight") else None,
        )
        cross = SanaCrossAttention(
            svdq("cross_attn.q_linear"),
            _decode_linear(b, "cross_attn.kv_linear"),
            svdq("cross_attn.out_proj"),
            heads=cfg.num_cross_attention_heads,
            head_dim=cfg.dim // cfg.num_cross_attention_heads,
        )
        dw = _f32(b("ff.depth_conv.weight"))  # (C, 1, 3, 3)
        ff = SanaGLUMBConv(
            svdq("ff.inverted_conv"),
            jnp.asarray(dw, jnp.bfloat16),
            jnp.asarray(_f32(b("ff.depth_conv.bias")), jnp.bfloat16)
            if b.has("ff.depth_conv.bias")
            else jnp.zeros((dw.shape[0],), jnp.bfloat16),
            svdq("ff.point_conv"),
        )
        blocks.append(
            SanaTransformerBlock(
                jnp.asarray(_f32(b("scale_shift_table")), jnp.float32), attn, cross, ff
            )
        )

    # PAG blocks may make the stacked pytrees ragged (pag_to_v only on some
    # layers) — pad missing pag projections with zero-initialized clones and
    # record which layers are real (cfg.pag_layers drives the pipeline's
    # per-layer perturbed-pass selection, the reference's pag_layers)
    if any(blk.attn.pag_to_v is not None for blk in blocks):
        import copy
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            pag_layers=tuple(
                i for i, b in enumerate(blocks) if b.attn.pag_to_v is not None
            ),
        )
        template = next(b.attn.pag_to_v for b in blocks if b.attn.pag_to_v is not None)
        for blk in blocks:
            if blk.attn.pag_to_v is None:
                blk.attn.pag_to_v = jax.tree.map(jnp.zeros_like, copy.deepcopy(template))

    caption = (
        CaptionProjection(
            _decode_linear(root, "caption_projection.linear_1"),
            _decode_linear(root, "caption_projection.linear_2"),
        )
        if root.has("caption_projection.linear_1.weight")
        else _decode_linear(root, "caption_projection")
    )
    return SanaTransformer2DModel(
        cfg,
        _conv1x1_as_linear(root, "patch_embed.proj")
        if root.has("patch_embed.proj.weight")
        else _decode_linear(root, "patch_embed"),
        caption,
        MLPEmbedder(
            _decode_linear(root, "adaln_single.emb.timestep_embedder.linear_1"),
            _decode_linear(root, "adaln_single.emb.timestep_embedder.linear_2"),
        ),
        _decode_linear(root, "adaln_single.linear"),
        stack_modules(blocks),
        jnp.asarray(_f32(root("scale_shift_table")), jnp.float32),
        _decode_linear(root, "proj_out"),
    )
