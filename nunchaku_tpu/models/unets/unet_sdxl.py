"""SDXL UNet with quantized transformer blocks, TPU-native.

Counterpart of the reference's NunchakuSDXLUNet2DConditionModel
(/root/reference/nunchaku/models/unets/unet_sdxl.py:35-526): the UNet's
BasicTransformerBlocks are quantized — self-attention gets a fused
SVDQ QKV, cross-attention a quantized to_q (+16-bit to_k/to_v over the
text context), GEGLU feed-forward both projections (unet_sdxl.py:49-160) —
while resnets/convs/embeddings stay 16-bit. The reference also ships the
deepcompressor shifted-conv patch (NunchakuSDXLShiftedConv2d /
ConcatShiftedConv2d, unet_sdxl.py:291-380) which its engine does not enable
by default; ``ShiftedConv2d`` here implements the same
add-shift-then-pad-with-shift trick for checkpoints that require it.

Convs run NHWC (TPU-native layout); the public forward takes/returns NCHW
(the diffusers contract). GEGLU's gate product is computed inside the
activation-quantize kernel (ops/quantize.py fuse_glu glu_act='gelu'), so
ff.net.2 consumes an already-quantized input.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ...core.module import Module
from ...ops.attention import flash_attention
from ...ops.quantize import quantize_w4a4_act_fuse_lora
from ..embeddings import timestep_embedding
from ..linear import Linear, SVDQW4A4Linear, pad_rows


# --------------------------------------------------------------------------
# conv / norm primitives (NHWC)
# --------------------------------------------------------------------------

def conv2d(x, w, b=None, *, stride=1, padding="SAME", feature_group_count=1):
    """x (B,H,W,Cin), w (kh,kw,Cin/g,Cout) -> (B,H,W,Cout)."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


class Conv2d(Module):
    def __init__(self, weight, bias=None, *, stride=1, padding="SAME"):
        self.weight = weight  # (kh, kw, Cin, Cout)
        self.bias = bias
        self.stride = stride
        self.padding = padding

    @classmethod
    def random_init(cls, key, cin, cout, k=3, stride=1, padding="SAME"):
        w = jax.random.normal(key, (k, k, cin, cout), jnp.bfloat16) / math.sqrt(k * k * cin)
        return cls(w, jnp.zeros((cout,), jnp.bfloat16), stride=stride, padding=padding)

    def __call__(self, x):
        return conv2d(x, self.weight, self.bias, stride=self.stride, padding=self.padding)


class ShiftedConv2d(Module):
    """Quantization-aware conv (deepcompressor ShiftedConv2d; reference
    unet_sdxl.py:291-341): adds a scalar shift to the input and pads with
    the shift value so the conv sees a bias-free zero point."""

    def __init__(self, conv: Conv2d, shift):
        self.conv = conv
        self.shift = shift  # scalar

    def __call__(self, x):
        kh = self.conv.weight.shape[0]
        pad = kh // 2
        shift = self.shift.astype(jnp.float32)
        if pad and self.conv.padding == "SAME":
            # zero-pad first, add shift after: interior = x + shift,
            # border = shift (the deepcompressor pad-with-shift semantics)
            x = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad), (pad, pad), (0, 0))) + shift
            return conv2d(x.astype(jnp.bfloat16), self.conv.weight, self.conv.bias,
                          stride=self.conv.stride, padding="VALID")
        return conv2d((x.astype(jnp.float32) + shift).astype(jnp.bfloat16),
                      self.conv.weight, self.conv.bias,
                      stride=self.conv.stride, padding=self.conv.padding)


def group_norm(x, gamma, beta, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


class GroupNorm(Module):
    def __init__(self, gamma, beta, groups=32, eps=1e-5):
        self.gamma = gamma
        self.beta = beta
        self.groups = groups
        self.eps = eps

    @classmethod
    def random_init(cls, key, c, groups=32):
        return cls(jnp.ones((c,), jnp.bfloat16), jnp.zeros((c,), jnp.bfloat16), groups)

    def __call__(self, x):
        return group_norm(x, self.gamma, self.beta, self.groups, self.eps)


def layer_norm_affine(x, gamma, beta, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


class LayerNorm(Module):
    def __init__(self, gamma, beta):
        self.gamma = gamma
        self.beta = beta

    @classmethod
    def random_init(cls, key, d):
        return cls(jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16))

    def __call__(self, x):
        return layer_norm_affine(x, self.gamma, self.beta)


# --------------------------------------------------------------------------
# quantized transformer block (reference NunchakuSDXLTransformerBlock)
# --------------------------------------------------------------------------

class SDXLAttention(Module):
    """Self-attention: fused quantized QKV. Cross-attention: quantized to_q,
    16-bit to_k/to_v over the text context (reference unet_sdxl.py:49-68)."""

    def __init__(self, to_qkv=None, to_q=None, to_k=None, to_v=None, to_out=None,
                 *, heads, head_dim):
        self.to_qkv = to_qkv
        self.to_q = to_q
        self.to_k = to_k
        self.to_v = to_v
        self.to_out = to_out
        self.heads = heads
        self.head_dim = head_dim

    @classmethod
    def random_init(cls, key, dim, heads, cross_dim=None, rank=32, precision="int4"):
        ks = jax.random.split(key, 4)
        hd = dim // heads
        if cross_dim is None:
            return cls(
                to_qkv=SVDQW4A4Linear.random_init(ks[0], dim, 3 * dim, rank=rank, precision=precision),
                to_out=SVDQW4A4Linear.random_init(ks[1], dim, dim, rank=rank, precision=precision),
                heads=heads, head_dim=hd,
            )
        return cls(
            to_q=SVDQW4A4Linear.random_init(ks[0], dim, dim, rank=rank, precision=precision),
            to_k=Linear.random_init(ks[1], cross_dim, dim),
            to_v=Linear.random_init(ks[2], cross_dim, dim),
            to_out=SVDQW4A4Linear.random_init(ks[3], dim, dim, rank=rank, precision=precision),
            heads=heads, head_dim=hd,
        )

    def __call__(self, x, context=None):
        b, s, _ = x.shape
        hd = self.head_dim

        def heads_first(t):
            return t.reshape(b, t.shape[1], -1, hd).transpose(0, 2, 1, 3)

        if context is None:
            qkv = self.to_qkv(x)
            q, k, v = (heads_first(t) for t in jnp.split(qkv, 3, axis=-1))
        else:
            q = heads_first(self.to_q(x))
            k = heads_first(self.to_k(context))
            v = heads_first(self.to_v(context))
        o = flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                            v.astype(jnp.bfloat16))
        o = o.transpose(0, 2, 1, 3).reshape(b, s, -1)
        return self.to_out(o)


class SDXLFeedForward(Module):
    """GEGLU FF: net.0.proj (d -> 2*inner), hidden * gelu(gate), net.2
    (inner -> d); both projections quantized (unet_sdxl.py:126-160), the
    GLU product fused into net.2's activation quantize."""

    def __init__(self, proj: SVDQW4A4Linear, out: SVDQW4A4Linear):
        self.proj = proj
        self.out = out

    @classmethod
    def random_init(cls, key, dim, mult=4, rank=32, precision="int4"):
        k1, k2 = jax.random.split(key)
        inner = dim * mult
        return cls(
            SVDQW4A4Linear.random_init(k1, dim, 2 * inner, rank=rank, precision=precision),
            SVDQW4A4Linear.random_init(k2, inner, dim, rank=rank, precision=precision),
        )

    def __call__(self, x):
        h = self.proj(x)
        lead = h.shape[:-1]
        m = math.prod(lead)
        h2 = pad_rows(h.reshape(m, h.shape[-1]), 8 if m <= 8 else 256)
        qact, asc, la = quantize_w4a4_act_fuse_lora(
            h2, self.out.proj_down, self.out.smooth,
            precision=self.out.precision, fuse_glu=True, glu_act="gelu",
        )
        out = self.out.forward_quant(qact, asc, la)
        return out[:m].reshape(*lead, out.shape[-1])


class SDXLTransformerBlock(Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU FF, all residual
    (reference NunchakuSDXLTransformerBlock.forward, unet_sdxl.py:187-289)."""

    def __init__(self, norm1, attn1, norm2, attn2, norm3, ff):
        self.norm1 = norm1
        self.attn1 = attn1
        self.norm2 = norm2
        self.attn2 = attn2
        self.norm3 = norm3
        self.ff = ff

    @classmethod
    def random_init(cls, key, dim, heads, cross_dim, rank=32, precision="int4"):
        ks = jax.random.split(key, 6)
        return cls(
            LayerNorm.random_init(ks[0], dim),
            SDXLAttention.random_init(ks[1], dim, heads, rank=rank, precision=precision),
            LayerNorm.random_init(ks[2], dim),
            SDXLAttention.random_init(ks[3], dim, heads, cross_dim=cross_dim,
                                      rank=rank, precision=precision),
            LayerNorm.random_init(ks[4], dim),
            SDXLFeedForward.random_init(ks[5], dim, rank=rank, precision=precision),
        )

    def __call__(self, x, context):
        x = x + self.attn1(self.norm1(x)).astype(x.dtype)
        x = x + self.attn2(self.norm2(x), context).astype(x.dtype)
        x = x + self.ff(self.norm3(x)).astype(x.dtype)
        return x


class SpatialTransformer(Module):
    """diffusers Transformer2DModel: GN -> proj_in -> blocks -> proj_out + res."""

    def __init__(self, norm, proj_in, blocks: list, proj_out):
        self.norm = norm
        self.proj_in = proj_in
        self.blocks = blocks
        self.proj_out = proj_out

    @classmethod
    def random_init(cls, key, dim, heads, depth, cross_dim, rank=32, precision="int4"):
        ks = jax.random.split(key, depth + 3)
        return cls(
            GroupNorm.random_init(ks[0], dim),
            Linear.random_init(ks[1], dim, dim),
            [SDXLTransformerBlock.random_init(ks[2 + i], dim, heads, cross_dim,
                                              rank=rank, precision=precision)
             for i in range(depth)],
            Linear.random_init(ks[-1], dim, dim),
        )

    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        t = self.norm(x).reshape(b, h * w, c)
        t = self.proj_in(t)
        for blk in self.blocks:
            t = blk(t, context)
        t = self.proj_out(t)
        return res + t.reshape(b, h, w, c).astype(res.dtype)


# --------------------------------------------------------------------------
# resnet / sampling blocks (16-bit, diffusers semantics)
# --------------------------------------------------------------------------

class ResnetBlock2D(Module):
    def __init__(self, norm1, conv1, time_emb_proj, norm2, conv2, conv_shortcut=None):
        self.norm1 = norm1
        self.conv1 = conv1
        self.time_emb_proj = time_emb_proj
        self.norm2 = norm2
        self.conv2 = conv2
        self.conv_shortcut = conv_shortcut

    @classmethod
    def random_init(cls, key, cin, cout, temb_dim):
        ks = jax.random.split(key, 6)
        return cls(
            GroupNorm.random_init(ks[0], cin),
            Conv2d.random_init(ks[1], cin, cout, 3),
            Linear.random_init(ks[2], temb_dim, cout),
            GroupNorm.random_init(ks[3], cout),
            Conv2d.random_init(ks[4], cout, cout, 3),
            Conv2d.random_init(ks[5], cin, cout, 1) if cin != cout else None,
        )

    def __call__(self, x, temb):
        h = self.conv1(jax.nn.silu(self.norm1(x).astype(jnp.float32)).astype(x.dtype))
        t = self.time_emb_proj(jax.nn.silu(temb.astype(jnp.float32)).astype(jnp.bfloat16))
        h = h + t[:, None, None, :].astype(h.dtype)
        h = self.conv2(jax.nn.silu(self.norm2(h).astype(jnp.float32)).astype(h.dtype))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sc + h


class Downsample(Module):
    def __init__(self, conv):
        self.conv = conv

    @classmethod
    def random_init(cls, key, c):
        return cls(Conv2d.random_init(key, c, c, 3, stride=2, padding=((1, 1), (1, 1))))

    def __call__(self, x):
        return self.conv(x)


class Upsample(Module):
    def __init__(self, conv):
        self.conv = conv

    @classmethod
    def random_init(cls, key, c):
        return cls(Conv2d.random_init(key, c, c, 3))

    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return self.conv(x)


# --------------------------------------------------------------------------
# the UNet
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class SDXLConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280)
    layers_per_block: int = 2
    transformer_layers: tuple = (0, 2, 10)  # per level; 0 = plain DownBlock2D
    cross_attention_dim: int = 2048
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    head_dim: int = 64
    rank: int = 32
    precision: str = "int4"

    @property
    def temb_dim(self) -> int:
        return self.block_out_channels[0] * 4


class SDXLUNet2DConditionModel(Module):
    """SDXL base UNet (down [plain, x-attn, x-attn] / mid / up mirrored),
    text_time additional embeddings (reference relies on diffusers
    UNet2DConditionModel for everything it doesn't quantize)."""

    def __init__(self, cfg, conv_in, time_lin1, time_lin2, add_lin1, add_lin2,
                 down_resnets, down_attns, downsamplers,
                 mid_resnets, mid_attn,
                 up_resnets, up_attns, upsamplers,
                 norm_out, conv_out):
        self.cfg = cfg
        self.conv_in = conv_in
        self.time_lin1 = time_lin1
        self.time_lin2 = time_lin2
        self.add_lin1 = add_lin1
        self.add_lin2 = add_lin2
        self.down_resnets = down_resnets  # list[list[ResnetBlock2D]]
        self.down_attns = down_attns  # list[list[SpatialTransformer | None]]
        self.downsamplers = downsamplers  # list[Downsample | None]
        self.mid_resnets = mid_resnets
        self.mid_attn = mid_attn
        self.up_resnets = up_resnets
        self.up_attns = up_attns
        self.upsamplers = upsamplers
        self.norm_out = norm_out
        self.conv_out = conv_out

    @classmethod
    def random_init(cls, key, cfg: SDXLConfig):
        ks = iter(jax.random.split(key, 256))
        ch = cfg.block_out_channels
        temb = cfg.temb_dim
        kw = dict(rank=cfg.rank, precision=cfg.precision)

        down_resnets, down_attns, downsamplers = [], [], []
        cin = ch[0]
        for lvl, cout in enumerate(ch):
            resnets, attns = [], []
            for i in range(cfg.layers_per_block):
                resnets.append(ResnetBlock2D.random_init(next(ks), cin if i == 0 else cout, cout, temb))
                attns.append(
                    SpatialTransformer.random_init(
                        next(ks), cout, cout // cfg.head_dim, cfg.transformer_layers[lvl],
                        cfg.cross_attention_dim, **kw)
                    if cfg.transformer_layers[lvl] else None
                )
            down_resnets.append(resnets)
            down_attns.append(attns)
            downsamplers.append(
                Downsample.random_init(next(ks), cout) if lvl < len(ch) - 1 else None
            )
            cin = cout

        mid_resnets = [
            ResnetBlock2D.random_init(next(ks), ch[-1], ch[-1], temb),
            ResnetBlock2D.random_init(next(ks), ch[-1], ch[-1], temb),
        ]
        mid_attn = SpatialTransformer.random_init(
            next(ks), ch[-1], ch[-1] // cfg.head_dim, cfg.transformer_layers[-1],
            cfg.cross_attention_dim, **kw)

        up_resnets, up_attns, upsamplers = [], [], []
        rev = list(reversed(ch))
        for lvl, cout in enumerate(rev):
            prev = rev[max(lvl - 1, 0)]
            skips = [rev[min(lvl + 1, len(ch) - 1)] if i == cfg.layers_per_block else cout
                     for i in range(cfg.layers_per_block + 1)]
            resnets, attns = [], []
            for i in range(cfg.layers_per_block + 1):
                rin = (prev if i == 0 else cout) + skips[i]
                resnets.append(ResnetBlock2D.random_init(next(ks), rin, cout, temb))
                tl = cfg.transformer_layers[len(ch) - 1 - lvl]
                attns.append(
                    SpatialTransformer.random_init(
                        next(ks), cout, cout // cfg.head_dim, tl,
                        cfg.cross_attention_dim, **kw)
                    if tl else None
                )
            up_resnets.append(resnets)
            up_attns.append(attns)
            upsamplers.append(
                Upsample.random_init(next(ks), cout) if lvl < len(ch) - 1 else None
            )

        return cls(
            cfg,
            Conv2d.random_init(next(ks), cfg.in_channels, ch[0], 3),
            Linear.random_init(next(ks), ch[0], temb),
            Linear.random_init(next(ks), temb, temb),
            Linear.random_init(next(ks), cfg.projection_class_embeddings_input_dim, temb),
            Linear.random_init(next(ks), temb, temb),
            down_resnets, down_attns, downsamplers,
            mid_resnets, mid_attn,
            up_resnets, up_attns, upsamplers,
            GroupNorm.random_init(next(ks), ch[0]),
            Conv2d.random_init(next(ks), ch[0], cfg.out_channels, 3),
        )

    def __call__(self, sample, timestep, encoder_hidden_states, text_embeds, time_ids):
        """sample (B, C, H, W) NCHW; timestep (B,); encoder_hidden_states
        (B, S, cross_dim); text_embeds (B, 1280); time_ids (B, 6)."""
        cfg = self.cfg
        x = sample.transpose(0, 2, 3, 1).astype(jnp.bfloat16)  # NHWC
        ctx = encoder_hidden_states.astype(jnp.bfloat16)

        temb = self.time_lin2(jax.nn.silu(
            self.time_lin1(timestep_embedding(timestep, cfg.block_out_channels[0])
                           .astype(jnp.bfloat16)).astype(jnp.float32)
        ).astype(jnp.bfloat16))
        # text_time additional embeddings (SDXL micro-conditioning)
        b = time_ids.shape[0]
        tids = timestep_embedding(time_ids.reshape(-1), cfg.addition_time_embed_dim)
        add = jnp.concatenate([text_embeds, tids.reshape(b, -1).astype(text_embeds.dtype)], axis=-1)
        temb = temb + self.add_lin2(jax.nn.silu(
            self.add_lin1(add.astype(jnp.bfloat16)).astype(jnp.float32)).astype(jnp.bfloat16))

        x = self.conv_in(x)
        skips = [x]
        for lvl in range(len(cfg.block_out_channels)):
            for res, attn in zip(self.down_resnets[lvl], self.down_attns[lvl]):
                x = res(x, temb)
                if attn is not None:
                    x = attn(x, ctx)
                skips.append(x)
            if self.downsamplers[lvl] is not None:
                x = self.downsamplers[lvl](x)
                skips.append(x)

        x = self.mid_resnets[0](x, temb)
        x = self.mid_attn(x, ctx)
        x = self.mid_resnets[1](x, temb)

        for lvl in range(len(cfg.block_out_channels)):
            for res, attn in zip(self.up_resnets[lvl], self.up_attns[lvl]):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = res(x, temb)
                if attn is not None:
                    x = attn(x, ctx)
            if self.upsamplers[lvl] is not None:
                x = self.upsamplers[lvl](x)

        x = jax.nn.silu(self.norm_out(x).astype(jnp.float32)).astype(jnp.bfloat16)
        x = self.conv_out(x)
        return x.transpose(0, 3, 1, 2)  # NCHW


def load_sdxl_unet(path, precision: str | None = None) -> SDXLUNet2DConditionModel:
    """Load a nunchaku SDXL checkpoint: quantized transformer-block tensors
    (v2 schema after convert_sdxl_state_dict, unet_sdxl.py:507-526) + 16-bit
    everything else. Implemented as: build random-init graph from config
    metadata, then overwrite leaves present in the file."""
    import json as _json

    from ...utils.safetensors import SafeTensors
    from ..transformers.loader import _Reader, _decode_linear
    from ..transformers.loader_zimage import decode_svdq_v2

    st = SafeTensors(path)
    config = _json.loads(st.metadata.get("config", "{}"))
    qcfg = _json.loads(st.metadata.get("quantization_config", "{}"))
    ckpt_precision = "nvfp4" if "fp4" in str(qcfg.get("weight", {})) else "int4"
    out_precision = precision or ckpt_precision
    if out_precision == "w4a8" and ckpt_precision != "int4":
        out_precision = "int8"
    cfg = SDXLConfig(
        in_channels=config.get("in_channels", 4),
        out_channels=config.get("out_channels", 4),
        block_out_channels=tuple(config.get("block_out_channels", (320, 640, 1280))),
        layers_per_block=config.get("layers_per_block", 2),
        transformer_layers=tuple(config.get("transformer_layers_per_block", (0, 2, 10))),
        cross_attention_dim=config.get("cross_attention_dim", 2048),
        rank=qcfg.get("rank", 32),
        precision=out_precision,
    )
    model = SDXLUNet2DConditionModel.random_init(jax.random.PRNGKey(0), cfg)
    root = _Reader(st)
    kw = dict(precision=ckpt_precision, out_precision=out_precision)

    def want(name):
        return name in st

    def conv(mod: Conv2d, prefix):
        if want(f"{prefix}.weight"):
            import numpy as np

            w = np.asarray(st.tensor(f"{prefix}.weight")).astype("float32")
            mod.weight = jnp.asarray(w.transpose(2, 3, 1, 0), jnp.bfloat16)  # OIHW->HWIO
            if want(f"{prefix}.bias"):
                mod.bias = jnp.asarray(
                    np.asarray(st.tensor(f"{prefix}.bias")).astype("float32"), jnp.bfloat16
                )

    def lin(prefix):
        return _decode_linear(root, prefix)

    def patch_spatial(attn: SpatialTransformer, prefix):
        import numpy as np

        g = f"{prefix}.norm"
        if want(f"{g}.weight"):
            attn.norm.gamma = jnp.asarray(np.asarray(st.tensor(f"{g}.weight")).astype("float32"), jnp.bfloat16)
            attn.norm.beta = jnp.asarray(np.asarray(st.tensor(f"{g}.bias")).astype("float32"), jnp.bfloat16)
        if want(f"{prefix}.proj_in.weight"):
            attn.proj_in = lin(f"{prefix}.proj_in")
        if want(f"{prefix}.proj_out.weight"):
            attn.proj_out = lin(f"{prefix}.proj_out")
        for i, blk in enumerate(attn.blocks):
            bp = f"{prefix}.transformer_blocks.{i}"
            for nm in ("norm1", "norm2", "norm3"):
                if want(f"{bp}.{nm}.weight"):
                    ln = getattr(blk, nm)
                    ln.gamma = jnp.asarray(np.asarray(st.tensor(f"{bp}.{nm}.weight")).astype("float32"), jnp.bfloat16)
                    ln.beta = jnp.asarray(np.asarray(st.tensor(f"{bp}.{nm}.bias")).astype("float32"), jnp.bfloat16)
            if want(f"{bp}.attn1.to_qkv.qweight"):
                blk.attn1.to_qkv = decode_svdq_v2(root.sub(f"{bp}.attn1.to_qkv"), **kw)
                blk.attn1.to_out = decode_svdq_v2(root.sub(f"{bp}.attn1.to_out.0"), **kw)
            if want(f"{bp}.attn2.to_q.qweight"):
                blk.attn2.to_q = decode_svdq_v2(root.sub(f"{bp}.attn2.to_q"), **kw)
                blk.attn2.to_k = lin(f"{bp}.attn2.to_k")
                blk.attn2.to_v = lin(f"{bp}.attn2.to_v")
                blk.attn2.to_out = decode_svdq_v2(root.sub(f"{bp}.attn2.to_out.0"), **kw)
            if want(f"{bp}.ff.net.0.proj.qweight"):
                blk.ff.proj = decode_svdq_v2(root.sub(f"{bp}.ff.net.0.proj"), **kw)
                blk.ff.out = decode_svdq_v2(root.sub(f"{bp}.ff.net.2"), **kw)

    # quantized transformer blocks inside down/mid/up attentions
    for lvl, attns in enumerate(model.down_attns):
        for i, attn in enumerate(attns):
            if attn is not None:
                patch_spatial(attn, f"down_blocks.{lvl}.attentions.{i}")
    patch_spatial(model.mid_attn, "mid_block.attentions.0")
    for lvl, attns in enumerate(model.up_attns):
        for i, attn in enumerate(attns):
            if attn is not None:
                patch_spatial(attn, f"up_blocks.{lvl}.attentions.{i}")

    # 16-bit trunk, when present in the file
    conv(model.conv_in, "conv_in")
    conv(model.conv_out, "conv_out")
    model.refresh_pytree()
    return model
