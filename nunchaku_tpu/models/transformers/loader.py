"""Load nunchaku FLUX checkpoints into the TPU model.

Reads the reference's single-file safetensors format (v1 key schema from the
C++ module registry, FluxModel.cpp:1239-1261 + csrc naming; metadata keys
``config`` / ``quantization_config``, nunchaku/models/transformers/utils.py:
32-60), decodes the CUDA MMA-swizzled tensors (utils/nunchaku_format.py) and
repacks into the TPU layouts. The AdaLN +1 scale shift is pre-folded in
these checkpoints (FluxModel.cpp:91 applies offset 0.0), so loaded models
use ``scale_shift = 0``.

``precision="int8"`` requantizes the dequantized 4-bit residual weights to
per-channel int8 at load (the TPU turbo mode — same checkpoint, int8 MXU).
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp
import ml_dtypes

from ...core.packing import pack_int4
from ...models.attention import FeedForward, FluxAttention
from ...models.embeddings import CombinedTimestepEmbeddings, MLPEmbedder
from ...models.linear import AWQW4A16Linear, Linear, SVDQW4A4Linear
from ...models.normalization import (
    AdaLayerNormContinuous,
    AdaLayerNormZero,
    AdaLayerNormZeroSingle,
)
from ...utils import nunchaku_format as NF
from ...utils.safetensors import SafeTensors
from .transformer_flux import (
    FluxConfig,
    FluxSingleTransformerBlock,
    FluxTransformer2DModel,
    FluxTransformerBlock,
    stack_modules,
)


def _np(t) -> np.ndarray:
    return np.asarray(t)


def _f32(t) -> np.ndarray:
    return _np(t).astype(np.float32)


class _Reader:
    def __init__(self, st: SafeTensors, prefix: str = ""):
        self.st = st
        self.prefix = prefix

    def sub(self, name):
        return _Reader(self.st, f"{self.prefix}{name}.")

    def __call__(self, name):
        return self.st.tensor(self.prefix + name)

    def has(self, name):
        return (self.prefix + name) in self.st


def _decode_svdq(r: _Reader, *, precision: str, out_precision: str) -> SVDQW4A4Linear:
    """Decode one GEMM_W4A4 module's tensors into an SVDQW4A4Linear."""
    qw_packed = _np(r("qweight"))
    n, k = qw_packed.shape[0], qw_packed.shape[1] * 2
    vals = NF.unpack_weight_int4(qw_packed, n, k)  # (N, K) signed codes
    if precision == "nvfp4":
        ws = NF.unpack_micro_scale(_np(r("wscales")).view(np.uint8), n)
        ws = ws.view(ml_dtypes.float8_e4m3fn).astype(np.float32)
        alpha = float(_f32(r("wtscale"))) if r.has("wtscale") else 1.0
        ws = ws * alpha
        if r.has("wcscales"):
            wcs = NF.unpack_scale(
                _np(r("wcscales")).view(np.uint8), n
            ).view(ml_dtypes.float8_e4m3fn).astype(np.float32)
            ws = ws * wcs.reshape(1, n)
    else:
        ws = NF.unpack_scale(_f32(r("wscales")), n)  # (K/G, N)

    smooth = _f32(r("smooth"))  # (K,)
    pd = NF.unpack_lowrank_weight(_f32(r("lora_down")), down=True).T  # (K, R)
    pu = NF.unpack_lowrank_weight(_f32(r("lora_up")), down=False).T  # (R, N)
    bias = _f32(r("bias")) if r.has("bias") else None

    if out_precision == "int8":
        # requantize the dequantized residual to per-channel int8
        from ...core.dtypes import dequantize_e2m1

        if precision == "nvfp4":
            v = np.asarray(dequantize_e2m1(jnp.asarray(vals)))
        else:
            v = vals.astype(np.float32)
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

    if out_precision == "w4a8":
        # 4-bit storage + int8 MXU: keep the packed weights, add per-channel
        # int8 scale + in-kernel rescale factors (ops/gemm.py w4a8 path).
        # nvfp4 checkpoints keep their e2m1 codes (wcodes="e2m1"): the
        # dequant pass decodes the fp4 grid (max |value| 6.0) before the
        # rescale, with the fp8-e4m3 group scales already folded into ws
        cmax = 6.0 if precision == "nvfp4" else 7.0
        s8 = np.maximum(ws.max(axis=0) * cmax / 127.0, 1e-12)
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
            wcodes="e2m1" if precision == "nvfp4" else "int4",
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


def _mod_perm(d: int, parts: int) -> np.ndarray:
    """Column permutation: interleaved [c*parts + p] -> part-major [p*d + c].

    The checkpoint's AdaLN linear emits part-interleaved columns consumed by
    split_mod (misc_kernels.h; normalization.py:90 view(B,-1,6).permute);
    our AdaLayerNormZero splits contiguous chunks instead.
    """
    perm = np.empty(d * parts, np.int64)
    for p in range(parts):
        perm[p * d : (p + 1) * d] = np.arange(d) * parts + p
    return perm


def _decode_awq(r: _Reader, parts: int | None = None, out_precision: str = "int4"):
    """Decode a GEMV_AWQ module (AdaLN modulation linear).

    In int8 turbo mode the dequantized weight is requantized to a
    per-channel int8 SVDQ linear (zero low-rank branch): the AWQ gemv is
    VPU-bound at modulation batch sizes while the int8 MXU path is pure
    HBM bandwidth.
    """
    qw = _np(r("qweight"))
    oc4, icp = qw.shape
    oc = oc4 * 4
    ic = icp // 4 * 8
    codes = NF.unpack_awq_gemv(qw, oc, ic)  # (N, K) unsigned
    ws = _f32(r("wscales"))  # (K/G, N) plain
    wz = -_f32(r("wzeros"))  # stored scaled-negated; ours: w = q*s - z
    bias = _f32(r("bias")) if r.has("bias") else None
    if parts:  # reorder interleaved modulation chunks to contiguous
        d = oc // parts
        perm = _mod_perm(d, parts)
        codes = codes[perm]
        ws = ws[:, perm]
        wz = wz[:, perm]
        if bias is not None:
            bias = bias[perm]

    if out_precision in ("int8", "w4a8"):
        g = ic // ws.shape[0]
        s_full = np.repeat(ws, g, axis=0)  # (K, N)
        z_full = np.repeat(wz, g, axis=0)
        w_deq = codes.T.astype(np.float32) * s_full - z_full  # (K, N)
        absmax = np.abs(w_deq).max(axis=0)
        scale = np.where(absmax == 0, 1.0, absmax / 127.0)
        q8 = np.clip(np.round(w_deq / scale[None, :]), -127, 127).astype(np.int8)
        lin = SVDQW4A4Linear(
            jnp.asarray(q8),
            jnp.asarray(scale.reshape(1, oc), jnp.float32),
            jnp.ones((ic,), jnp.bfloat16),
            jnp.zeros((ic, 16), jnp.bfloat16),
            jnp.zeros((16, oc), jnp.bfloat16),
            None if bias is None else jnp.asarray(bias, jnp.bfloat16),
            precision="int8",
        )
        return lin

    return AWQW4A16Linear(
        pack_int4(jnp.asarray(codes.T), axis=0),
        jnp.asarray(ws, jnp.bfloat16),
        jnp.asarray(wz, jnp.bfloat16),
        None if bias is None else jnp.asarray(bias, jnp.bfloat16),
    )


def _decode_linear(r: _Reader, name: str) -> Linear:
    w = _f32(r(f"{name}.weight")).T  # torch (out,in) -> (in,out)
    b = (
        jnp.asarray(_f32(r(f"{name}.bias")), jnp.bfloat16)
        if r.has(f"{name}.bias")
        else None
    )
    return Linear(jnp.asarray(w, jnp.bfloat16), b)


def load_flux_transformer(
    path,
    precision: str | None = None,
) -> FluxTransformer2DModel:
    """Build a FluxTransformer2DModel from a nunchaku single-file checkpoint.

    ``precision`` overrides the on-disk precision ("int8" selects the TPU
    turbo requantization; None keeps the checkpoint's own int4/nvfp4).
    """
    st = SafeTensors(path)
    config = json.loads(st.metadata.get("config", "{}"))
    qcfg = json.loads(st.metadata.get("quantization_config", "{}"))
    ckpt_precision = "nvfp4" if "fp4" in str(qcfg.get("weight", {})) else "int4"
    out_precision = precision or ckpt_precision

    cfg = FluxConfig(
        num_layers=config.get("num_layers", 19),
        num_single_layers=config.get("num_single_layers", 38),
        attention_head_dim=config.get("attention_head_dim", 128),
        num_attention_heads=config.get("num_attention_heads", 24),
        joint_attention_dim=config.get("joint_attention_dim", 4096),
        pooled_projection_dim=config.get("pooled_projection_dim", 768),
        in_channels=config.get("in_channels", 64),
        out_channels=config.get("out_channels", 64) or 64,
        guidance_embeds=config.get("guidance_embeds", True),
        axes_dims_rope=tuple(config.get("axes_dims_rope", (16, 56, 56))),
        precision=out_precision,
    )
    root = _Reader(st)
    dim = cfg.dim

    def svdq(prefix):
        return _decode_svdq(
            root.sub(prefix), precision=ckpt_precision, out_precision=out_precision
        )

    dual = []
    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        b = _Reader(st, p + ".")
        attn = FluxAttention(
            to_qkv=svdq(f"{p}.qkv_proj"),
            norm_q=jnp.asarray(_f32(b("norm_q.weight")), jnp.bfloat16),
            norm_k=jnp.asarray(_f32(b("norm_k.weight")), jnp.bfloat16),
            to_out=svdq(f"{p}.out_proj"),
            add_qkv_proj=svdq(f"{p}.qkv_proj_context"),
            norm_added_q=jnp.asarray(_f32(b("norm_added_q.weight")), jnp.bfloat16),
            norm_added_k=jnp.asarray(_f32(b("norm_added_k.weight")), jnp.bfloat16),
            to_add_out=svdq(f"{p}.out_proj_context"),
            heads=cfg.num_attention_heads,
            head_dim=cfg.attention_head_dim,
        )
        blk = FluxTransformerBlock(
            norm1=AdaLayerNormZero(
                _decode_awq(b.sub("norm1.linear"), parts=6, out_precision=out_precision), scale_shift=0.0
            ),
            norm1_context=AdaLayerNormZero(
                _decode_awq(b.sub("norm1_context.linear"), parts=6, out_precision=out_precision), scale_shift=0.0
            ),
            attn=attn,
            ff=FeedForward(svdq(f"{p}.mlp_fc1"), svdq(f"{p}.mlp_fc2")),
            ff_context=FeedForward(
                svdq(f"{p}.mlp_context_fc1"), svdq(f"{p}.mlp_context_fc2")
            ),
        )
        # fc2 runs on unsigned shifted GELU output. int4 *checkpoints* bake
        # the +0.171875 shift compensation (shift * sum(residual_w)) into the
        # fc2 bias (reference gemm_w4a4_launch_impl.cuh:286 applies the shift
        # unconditionally for int4) — so the shift must be applied whenever
        # the checkpoint was int4, even when running int8/w4a8 turbo modes
        # (quantize_w4a4_act_fuse_lora adds GELU_SHIFT before those branches).
        blk.ff.fc2.act_unsigned = ckpt_precision == "int4"
        blk.ff_context.fc2.act_unsigned = ckpt_precision == "int4"
        dual.append(blk)

    single = []
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}"
        b = _Reader(st, p + ".")
        attn = FluxAttention(
            to_qkv=svdq(f"{p}.qkv_proj"),
            norm_q=jnp.asarray(_f32(b("norm_q.weight")), jnp.bfloat16),
            norm_k=jnp.asarray(_f32(b("norm_k.weight")), jnp.bfloat16),
            heads=cfg.num_attention_heads,
            head_dim=cfg.attention_head_dim,
        )
        blk = FluxSingleTransformerBlock(
            norm=AdaLayerNormZeroSingle(
                _decode_awq(b.sub("norm.linear"), parts=3, out_precision=out_precision), scale_shift=0.0
            ),
            attn=attn,
            mlp_fc1=svdq(f"{p}.mlp_fc1"),
            mlp_fc2=svdq(f"{p}.mlp_fc2"),
            attn_out=svdq(f"{p}.out_proj"),
        )
        blk.mlp_fc2.act_unsigned = ckpt_precision == "int4"
        single.append(blk)

    time_text = CombinedTimestepEmbeddings(
        MLPEmbedder(
            _decode_linear(root, "time_text_embed.timestep_embedder.linear_1"),
            _decode_linear(root, "time_text_embed.timestep_embedder.linear_2"),
        ),
        MLPEmbedder(
            _decode_linear(root, "time_text_embed.text_embedder.linear_1"),
            _decode_linear(root, "time_text_embed.text_embedder.linear_2"),
        ),
        MLPEmbedder(
            _decode_linear(root, "time_text_embed.guidance_embedder.linear_1"),
            _decode_linear(root, "time_text_embed.guidance_embedder.linear_2"),
        )
        if root.has("time_text_embed.guidance_embedder.linear_1.weight")
        else None,
    )

    return FluxTransformer2DModel(
        cfg,
        _decode_linear(root, "x_embedder"),
        _decode_linear(root, "context_embedder"),
        time_text,
        stack_modules(dual),
        stack_modules(single),
        AdaLayerNormContinuous(_decode_linear(root, "norm_out.linear")),
        _decode_linear(root, "proj_out"),
    )
