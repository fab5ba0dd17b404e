"""Qwen-Image checkpoint loader (v2 / Python-backend key schema).

Key map from the reference's patching
(/root/reference/nunchaku/models/transformers/transformer_qwenimage.py:
159-310 NunchakuQwenImageTransformerBlock, :64-95 NunchakuQwenAttention):

  transformer_blocks.{i}.attn.{to_qkv,to_out.0,add_qkv_proj,to_add_out}.*
      -> SVDQ v2 tensors (shared decode with Z-Image)
  transformer_blocks.{i}.attn.{norm_q,norm_k,norm_added_q,norm_added_k}.weight
  transformer_blocks.{i}.{img_mod,txt_mod}.1.*   -> AWQ W4A16 modulation
      (6-way interleaved columns -> part-major, like FLUX v1; the +1 scale
      shift is NOT folded in v2 checkpoints -> scale_shift=1.0)
  transformer_blocks.{i}.{img_mlp,txt_mlp}.net.{0.proj,2}.*  -> GELU MLP
  img_in / txt_in / txt_norm / time_text_embed.timestep_embedder.linear_1,2
  norm_out.linear / proj_out

The Qwen block is structurally the FLUX dual-stream block (the reference
reuses NunchakuFeedForward and the joint-attention pattern), so decoded
blocks load into FluxTransformerBlock directly.
"""

from __future__ import annotations

import json

import jax.numpy as jnp

from ...utils.safetensors import SafeTensors
from ..attention import FeedForward, FluxAttention
from ..embeddings import MLPEmbedder
from ..normalization import AdaLayerNormContinuous, AdaLayerNormZero
from .loader import _Reader, _decode_awq, _decode_linear, _f32
from .loader_zimage import decode_svdq_v2
from .transformer_flux import FluxTransformerBlock, stack_modules
from .transformer_qwenimage import QwenImageConfig, QwenImageTransformer2DModel


def _bf16(r: _Reader, name: str):
    return jnp.asarray(_f32(r(name)), jnp.bfloat16)


def load_qwenimage_transformer(path, precision: str | None = None) -> QwenImageTransformer2DModel:
    st = SafeTensors(path)
    config = json.loads(st.metadata.get("config", "{}"))
    qcfg = json.loads(st.metadata.get("quantization_config", "{}"))
    ckpt_precision = "nvfp4" if "fp4" in str(qcfg.get("weight", {})) else "int4"
    out_precision = precision or ckpt_precision
    if out_precision == "w4a8" and ckpt_precision != "int4":
        out_precision = "int8"

    cfg = QwenImageConfig(
        num_layers=config.get("num_layers", 60),
        attention_head_dim=config.get("attention_head_dim", 128),
        num_attention_heads=config.get("num_attention_heads", 24),
        joint_attention_dim=config.get("joint_attention_dim", 3584),
        in_channels=config.get("in_channels", 64),
        out_channels=config.get("out_channels", 16),
        axes_dims_rope=tuple(config.get("axes_dims_rope", (16, 56, 56))),
        rank=qcfg.get("rank", 32),
        precision=out_precision,
    )
    root = _Reader(st)
    kw = dict(precision=ckpt_precision, out_precision=out_precision)

    blocks = []
    for i in range(cfg.num_layers):
        b = _Reader(st, f"transformer_blocks.{i}.")

        def svdq(name):
            return decode_svdq_v2(b.sub(name), **kw)

        attn = FluxAttention(
            to_qkv=svdq("attn.to_qkv"),
            norm_q=_bf16(b, "attn.norm_q.weight"),
            norm_k=_bf16(b, "attn.norm_k.weight"),
            to_out=svdq("attn.to_out.0"),
            add_qkv_proj=svdq("attn.add_qkv_proj"),
            norm_added_q=_bf16(b, "attn.norm_added_q.weight"),
            norm_added_k=_bf16(b, "attn.norm_added_k.weight"),
            to_add_out=svdq("attn.to_add_out"),
            heads=cfg.num_attention_heads,
            head_dim=cfg.attention_head_dim,
        )
        blk = FluxTransformerBlock(
            # v2 checkpoints do NOT fold the +1 into the modulation weights
            norm1=AdaLayerNormZero(
                _decode_awq(b.sub("img_mod.1"), parts=6, out_precision=out_precision),
                scale_shift=1.0,
            ),
            norm1_context=AdaLayerNormZero(
                _decode_awq(b.sub("txt_mod.1"), parts=6, out_precision=out_precision),
                scale_shift=1.0,
            ),
            attn=attn,
            ff=FeedForward(svdq("img_mlp.net.0.proj"), svdq("img_mlp.net.2")),
            ff_context=FeedForward(svdq("txt_mlp.net.0.proj"), svdq("txt_mlp.net.2")),
        )
        blk.ff.fc2.act_unsigned = ckpt_precision == "int4"
        blk.ff_context.fc2.act_unsigned = ckpt_precision == "int4"
        blocks.append(blk)

    return QwenImageTransformer2DModel(
        cfg,
        _decode_linear(root, "img_in"),
        _decode_linear(root, "txt_in"),
        MLPEmbedder(
            _decode_linear(root, "time_text_embed.timestep_embedder.linear_1"),
            _decode_linear(root, "time_text_embed.timestep_embedder.linear_2"),
        ),
        stack_modules(blocks),
        AdaLayerNormContinuous(_decode_linear(root, "norm_out.linear")),
        _decode_linear(root, "proj_out"),
        txt_norm=_bf16(root, "txt_norm.weight") if root.has("txt_norm.weight") else None,
    )
