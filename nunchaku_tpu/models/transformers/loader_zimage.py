"""Z-Image checkpoint loader (v2 / Python-backend key schema).

The reference builds the diffusers graph from the checkpoint's ``config``
metadata, patches blocks with quantized modules, and loads the state dict
directly (transformer_zimage.py:169-232 from_pretrained + utils.py
patch_scale_key). v2 checkpoints store each SVDQW4A4Linear's tensors under
its module path with the *kernel* layouts (reference linear.py:96-122):

  qweight (O, I/2) int8 MMA-packed, wscales (I/G, O) swizzled,
  smooth_factor/smooth_orig (I,), proj_down (I, R), proj_up (O, R),
  [wtscale, wcscales for nvfp4], bias (O,).

qweight/wscales reuse the v1 MMA codecs (utils/nunchaku_format.py —
identical CUDA kernel consumes both generations); proj_down/up are stored
plain in v2 (reference packer packs only the *fused-lora* path). Key map,
from the reference's patching (transformer_zimage.py:56-62, 119-167):

  layers.{i}.attention.{to_qkv,to_out.0}.*      -> quantized linears
  layers.{i}.attention.{norm_q,norm_k}.weight   -> per-head RMSNorm
  layers.{i}.feed_forward.net.{0.proj,2}.*      -> SwiGLU w1||w3, w2
  layers.{i}.{attention_norm1,attention_norm2,ffn_norm1,ffn_norm2}.weight
  layers.{i}.adaLN_modulation.1.{weight,bias}   -> 16-bit modulation
  noise_refiner.{i}.* / context_refiner.{i}.*   -> same schema
  x_embedder.* t_embedder.mlp.{0,2}.* cap_embedder.{0,1}.*
  norm_out.weight final_layer.* (adaLN_modulation.1 + linear)
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp
import ml_dtypes

from ...core.packing import pack_int4
from ...utils import nunchaku_format as NF
from ...utils.safetensors import SafeTensors
from ..linear import Linear, SVDQW4A4Linear
from .loader import _Reader, _decode_linear, _f32, _np
from .transformer_zimage import (
    ZImageAttention,
    ZImageConfig,
    ZImageFeedForward,
    ZImageTransformer2DModel,
    ZImageTransformerBlock,
)
from .transformer_flux import stack_modules


def decode_svdq_v2(r: _Reader, *, precision: str, out_precision: str) -> SVDQW4A4Linear:
    """Decode a v2-schema SVDQW4A4Linear (kernel-layout tensors)."""
    qw_packed = _np(r("qweight"))
    n, k = qw_packed.shape[0], qw_packed.shape[1] * 2
    vals = NF.unpack_weight_int4(qw_packed, n, k)  # (N, K) signed codes
    if precision == "nvfp4":
        ws = NF.unpack_micro_scale(_np(r("wscales")).view(np.uint8), n)
        ws = ws.view(ml_dtypes.float8_e4m3fn).astype(np.float32)
        if r.has("wtscale"):
            ws = ws * float(_f32(r("wtscale")))
        if r.has("wcscales"):
            wcs = NF.unpack_scale(_np(r("wcscales")).view(np.uint8), n)
            ws = ws * wcs.view(ml_dtypes.float8_e4m3fn).astype(np.float32).reshape(1, n)
    else:
        ws = NF.unpack_scale(_f32(r("wscales")), n)  # (K/G, N)

    smooth = _f32(r("smooth_factor" if r.has("smooth_factor") else "smooth"))
    pd = _f32(r("proj_down"))  # (K, R) plain
    pu = _f32(r("proj_up")).T  # (O, R) -> (R, O)
    bias = _f32(r("bias")) if r.has("bias") else None

    if out_precision == "int8":
        from ...core.dtypes import dequantize_e2m1

        v = (
            np.asarray(dequantize_e2m1(jnp.asarray(vals)))
            if precision == "nvfp4"
            else vals.astype(np.float32)
        )
        g = k // ws.shape[0]
        w_deq = (v.T.reshape(k // g, g, n) * ws[:, None, :]).reshape(k, n)
        absmax = np.abs(w_deq).max(axis=0)
        scale = np.where(absmax == 0, 1.0, absmax / 127.0)
        q8 = np.clip(np.round(w_deq / scale[None, :]), -127, 127).astype(np.int8)
        return SVDQW4A4Linear(
            jnp.asarray(q8),
            jnp.asarray(scale.reshape(1, n), jnp.float32),
            jnp.asarray(smooth, jnp.bfloat16),
            jnp.asarray(pd, jnp.bfloat16),
            jnp.asarray(pu, jnp.bfloat16),
            None if bias is None else jnp.asarray(bias, jnp.bfloat16),
            precision="int8",
        )
    if out_precision == "w4a8" and precision == "int4":
        s8 = np.maximum(ws.max(axis=0) * 7.0 / 127.0, 1e-12)
        rs = ws / s8[None, :]
        return SVDQW4A4Linear(
            pack_int4(jnp.asarray(vals.T), axis=0),
            jnp.asarray(s8.reshape(1, n), jnp.float32),
            jnp.asarray(smooth, jnp.bfloat16),
            jnp.asarray(pd, jnp.bfloat16),
            jnp.asarray(pu, jnp.bfloat16),
            None if bias is None else jnp.asarray(bias, jnp.bfloat16),
            rescales=jnp.asarray(rs, jnp.bfloat16),
            precision="w4a8",
        )
    return SVDQW4A4Linear(
        pack_int4(jnp.asarray(vals.T), axis=0),
        jnp.asarray(ws, jnp.bfloat16),
        jnp.asarray(smooth, jnp.bfloat16),
        jnp.asarray(pd, jnp.bfloat16),
        jnp.asarray(pu, jnp.bfloat16),
        None if bias is None else jnp.asarray(bias, jnp.bfloat16),
        precision=precision,
    )


def _bf16(r: _Reader, name: str) -> jnp.ndarray:
    return jnp.asarray(_f32(r(name)), jnp.bfloat16)


def _decode_block(b: _Reader, cfg: ZImageConfig, *, precision, out_precision,
                  modulated: bool, quantized: bool) -> ZImageTransformerBlock:
    def svdq(name):
        return decode_svdq_v2(b.sub(name), precision=precision, out_precision=out_precision)

    def lin16(name):
        return _decode_linear(b, name)

    attn = ZImageAttention(
        svdq("attention.to_qkv") if quantized else lin16("attention.to_qkv"),
        _bf16(b, "attention.norm_q.weight"),
        _bf16(b, "attention.norm_k.weight"),
        svdq("attention.to_out.0") if quantized else lin16("attention.to_out.0"),
        heads=cfg.num_attention_heads, head_dim=cfg.head_dim,
    )
    ff = ZImageFeedForward(
        svdq("feed_forward.net.0.proj") if quantized else lin16("feed_forward.net.0.proj"),
        svdq("feed_forward.net.2") if quantized else lin16("feed_forward.net.2"),
    )
    adaln = _decode_linear(b, "adaLN_modulation.1") if modulated else None
    return ZImageTransformerBlock(
        attn, ff,
        _bf16(b, "attention_norm1.weight"),
        _bf16(b, "attention_norm2.weight"),
        _bf16(b, "ffn_norm1.weight"),
        _bf16(b, "ffn_norm2.weight"),
        adaln, eps=cfg.norm_eps,
    )


def load_zimage_transformer(path, precision: str | None = None) -> ZImageTransformer2DModel:
    st = SafeTensors(path)
    config = json.loads(st.metadata.get("config", "{}"))
    qcfg = json.loads(st.metadata.get("quantization_config", "{}"))
    ckpt_precision = "nvfp4" if "fp4" in str(qcfg.get("weight", {})) else "int4"
    out_precision = precision or ckpt_precision
    if out_precision == "w4a8" and ckpt_precision != "int4":
        out_precision = "int8"
    skip_refiners = bool(qcfg.get("skip_refiners", False))

    cfg = ZImageConfig(
        dim=config.get("dim", 1024),
        num_layers=config.get("num_layers", 4),
        num_refiner_layers=config.get("num_refiner_layers", 2),
        num_attention_heads=config.get("num_attention_heads", 8),
        in_channels=config.get("in_channels", 16),
        patch_size=config.get("patch_size", 2),
        cap_feat_dim=config.get("cap_feat_dim", 1024),
        norm_eps=config.get("norm_eps", 1e-5),
        axes_dims_rope=tuple(config.get("axes_dims_rope", (32, 48, 48))),
        rank=qcfg.get("rank", 32),
        precision=out_precision,
        ffn_inner=config.get("ffn_inner"),
    )
    root = _Reader(st)
    kw = dict(precision=ckpt_precision, out_precision=out_precision)
    layers = stack_modules([
        _decode_block(root.sub(f"layers.{i}"), cfg, **kw, modulated=True, quantized=True)
        for i in range(cfg.num_layers)
    ])
    noise_ref = stack_modules([
        _decode_block(root.sub(f"noise_refiner.{i}"), cfg, **kw,
                      modulated=True, quantized=not skip_refiners)
        for i in range(cfg.num_refiner_layers)
    ])
    ctx_ref = stack_modules([
        _decode_block(root.sub(f"context_refiner.{i}"), cfg, **kw,
                      modulated=False, quantized=not skip_refiners)
        for i in range(cfg.num_refiner_layers)
    ])
    return ZImageTransformer2DModel(
        cfg,
        _decode_linear(root, "x_embedder"),
        _decode_linear(root, "t_embedder.mlp.0"),
        _decode_linear(root, "t_embedder.mlp.2"),
        _bf16(root, "cap_embedder.0.weight"),
        _decode_linear(root, "cap_embedder.1"),
        noise_ref, ctx_ref, layers,
        _bf16(root, "norm_out.weight"),
        _decode_linear(root, "final_layer.linear"),
        _decode_linear(root, "final_layer.adaLN_modulation.1"),
    )
