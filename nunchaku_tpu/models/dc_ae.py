"""DC-AE (Deep Compression Autoencoder, f32c32) for SANA, bf16 JAX.

The reference consumes diffusers' ``AutoencoderDC``
(mit-han-lab/dc-ae-f32c32-sana-1.1, see reference examples/v1/sana1.6b.py
via SanaPipeline); this is a standalone TPU rebuild of that architecture:

  encoder: conv_in -> [ResBlock x n | EfficientViTBlock x n] stages with
           stride-2 conv downsamples (+ pixel-unshuffle averaging shortcut),
           conv_out to 32 latent channels (+ channel-group-mean shortcut)
  decoder: conv_in from latents (+ channel-repeat shortcut), mirrored
           stages with interpolate-upsamples (+ repeat + pixel-shuffle
           shortcut), RMSNorm -> SiLU -> conv_out

EfficientViTBlock = SANA's multiscale relu linear attention (the LiteLA
math shared with transformer_sana.lite_la) + GLUMBConv. All convs run as
XLA lax.conv in NCHW; the 1x1s are matmuls on the MXU.

Loader follows the diffusers AutoencoderDC state-dict layout
(encoder.down_blocks.{stage}.{idx}.*, decoder.up_blocks.{stage}.{idx}.*);
synthesized-checkpoint tests pin the schema until real artifacts mount.
Known-unverifiable detail in this sandbox (zero egress, no diffusers): the
qkv head-group layout after the to_q/to_k/to_v concat. This implementation
groups channels as heads x (q|k|v) of head_dim each (the original
EfficientViT LiteMLA single-conv layout); if real checkpoints use the
plain [q|k|v] concat order, the fix is a row permutation of the three
projection weights in load_dc_ae, not a graph change.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module

# dc-ae-f32c32-sana-1.1 (diffusers AutoencoderDC config)
_SANA_CHANNELS = (128, 256, 512, 512, 1024, 1024)


@dataclass(frozen=True)
class DCAEConfig:
    in_channels: int = 3
    latent_channels: int = 32
    attention_head_dim: int = 32
    block_out_channels: tuple = _SANA_CHANNELS
    encoder_block_types: tuple = ("res", "res", "res", "vit", "vit", "vit")
    decoder_block_types: tuple = ("res", "res", "res", "vit", "vit", "vit")
    encoder_layers_per_block: tuple = (2, 2, 2, 3, 3, 3)
    decoder_layers_per_block: tuple = (3, 3, 3, 3, 3, 3)
    qkv_multiscales: tuple = ((), (), (), (5,), (5,), (5,))
    scaling_factor: float = 0.41407


def _conv(x, w, b=None, *, stride=1, groups=1):
    """NCHW conv, weight (O, I/g, kh, kw) torch layout."""
    kh = w.shape[2]
    pad = kh // 2
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.astype(out.dtype)[None, :, None, None]
    return out


def _rms_norm_c(x, w, eps=1e-5):
    """RMSNorm over the channel axis of NCHW (diffusers applies it
    channel-last; equivalent)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


def _pixel_unshuffle(x, r):
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // r, r, w // r, r)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, c * r * r, h // r, w // r)


def _pixel_shuffle(x, r):
    b, c, h, w = x.shape
    x = x.reshape(b, c // (r * r), r, r, h, w)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, c // (r * r), h * r, w * r)


class ResBlock(Module):
    """conv3x3 -> SiLU -> conv3x3(no bias) -> RMSNorm, + residual."""

    def __init__(self, conv1_w, conv1_b, conv2_w, norm_w):
        self.conv1_w, self.conv1_b = conv1_w, conv1_b
        self.conv2_w = conv2_w
        self.norm_w = norm_w

    def __call__(self, x):
        h = _conv(x, self.conv1_w, self.conv1_b)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(jnp.bfloat16)
        h = _conv(h, self.conv2_w)
        return x + _rms_norm_c(h, self.norm_w)


class GLUMBConv(Module):
    """1x1 expand(x2) -> SiLU -> 3x3 depthwise -> GLU -> 1x1 (no bias)
    -> RMSNorm, + residual (diffusers GLUMBConv with norm_type=rms_norm)."""

    def __init__(self, inv_w, inv_b, depth_w, depth_b, point_w, norm_w):
        self.inv_w, self.inv_b = inv_w, inv_b
        self.depth_w, self.depth_b = depth_w, depth_b
        self.point_w = point_w
        self.norm_w = norm_w

    def __call__(self, x):
        h = _conv(x, self.inv_w, self.inv_b)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(jnp.bfloat16)
        h = _conv(h, self.depth_w, self.depth_b, groups=h.shape[1])
        a, gate = jnp.split(h, 2, axis=1)
        h = a * jax.nn.silu(gate.astype(jnp.float32)).astype(a.dtype)
        h = _conv(h, self.point_w)
        return x + _rms_norm_c(h, self.norm_w)


class MultiscaleLinearAttention(Module):
    """SanaMultiscaleLinearAttention (relu-kernel linear attention over
    pixels, plus depthwise-conv multiscale qkv branches), residual add."""

    def __init__(self, q_w, k_w, v_w, ms_in_w, ms_out_w, out_w, norm_w,
                 *, head_dim: int):
        self.q_w, self.k_w, self.v_w = q_w, k_w, v_w  # (C, C) linear, no bias
        self.ms_in_w = ms_in_w    # list of depthwise (3C,1,k,k)
        self.ms_out_w = ms_out_w  # list of grouped 1x1 (3C, C/heads*3/..., 1, 1)
        self.out_w = out_w        # (C, C*(1+n)) linear, no bias
        self.norm_w = norm_w
        self.head_dim = head_dim

    def __call__(self, x):
        b, c, hh, ww = x.shape
        n = hh * ww
        t = x.reshape(b, c, n).transpose(0, 2, 1).astype(jnp.bfloat16)  # (B,N,C)
        q = t @ self.q_w.T
        k = t @ self.k_w.T
        v = t @ self.v_w.T
        qkv = jnp.concatenate([q, k, v], axis=-1)  # (B,N,3C)
        branches = [qkv]
        qkv_img = qkv.transpose(0, 2, 1).reshape(b, 3 * c, hh, ww)
        for wi, wo in zip(self.ms_in_w, self.ms_out_w):
            y = _conv(qkv_img, wi, groups=3 * c)  # depthwise kxk
            heads_groups = wo.shape[0] // wo.shape[1]
            y = _conv(y, wo, groups=heads_groups)  # grouped 1x1
            branches.append(y.reshape(b, 3 * c, n).transpose(0, 2, 1))

        outs = []
        hd = self.head_dim
        for br in branches:
            # (B, N, 3C) -> heads of (q|k|v) each hd wide
            z = br.reshape(b, n, -1, 3 * hd)
            qh = jax.nn.relu(z[..., :hd].astype(jnp.float32))
            kh = jax.nn.relu(z[..., hd : 2 * hd].astype(jnp.float32))
            vh = z[..., 2 * hd :].astype(jnp.float32)
            # linear attention with ones-padded v (transformer_sana.lite_la math)
            vk = jnp.einsum("bnhd,bnhe->bhde", kh, jnp.concatenate(
                [vh, jnp.ones_like(vh[..., :1])], axis=-1))
            num = jnp.einsum("bnhd,bhde->bnhe", qh, vk)
            out = num[..., :-1] / (num[..., -1:] + 1e-15)
            outs.append(out.reshape(b, n, -1))
        o = jnp.concatenate(outs, axis=-1).astype(jnp.bfloat16) @ self.out_w.T
        o = o.transpose(0, 2, 1).reshape(b, c, hh, ww)
        return x + _rms_norm_c(o, self.norm_w)


class EfficientViTBlock(Module):
    def __init__(self, attn: MultiscaleLinearAttention, conv_out: GLUMBConv):
        self.attn = attn
        self.conv_out = conv_out

    def __call__(self, x):
        return self.conv_out(self.attn(x))


class DCDownBlock(Module):
    """stride-2 conv3x3 + pixel-unshuffle group-mean shortcut."""

    def __init__(self, conv_w, conv_b):
        self.conv_w, self.conv_b = conv_w, conv_b

    def __call__(self, x):
        h = _conv(x, self.conv_w, self.conv_b, stride=2)
        y = _pixel_unshuffle(x, 2)  # (B, 4*Cin, H/2, W/2)
        group = y.shape[1] // h.shape[1]
        y = y.reshape(y.shape[0], h.shape[1], group, *y.shape[2:]).mean(axis=2)
        return h + y.astype(h.dtype)


class DCUpBlock(Module):
    """nearest-interpolate + conv3x3, + repeat + pixel-shuffle shortcut."""

    def __init__(self, conv_w, conv_b):
        self.conv_w, self.conv_b = conv_w, conv_b

    def __call__(self, x):
        b, c, hh, ww = x.shape
        up = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        h = _conv(up, self.conv_w, self.conv_b)
        out_c = h.shape[1]
        repeats = out_c * 4 // c
        y = jnp.repeat(x, repeats, axis=1)
        y = _pixel_shuffle(y, 2)
        return h + y.astype(h.dtype)


class DCAE(Module):
    """AutoencoderDC counterpart: 32x spatial, 32 latent channels."""

    def __init__(self, cfg: DCAEConfig, enc_conv_in_w, enc_conv_in_b,
                 enc_stages, enc_downs, enc_conv_out_w, enc_conv_out_b,
                 dec_conv_in_w, dec_conv_in_b, dec_stages, dec_ups,
                 dec_norm_w, dec_conv_out_w, dec_conv_out_b):
        self.cfg = cfg
        self.enc_conv_in_w, self.enc_conv_in_b = enc_conv_in_w, enc_conv_in_b
        self.enc_stages = enc_stages  # list[list[block]]
        self.enc_downs = enc_downs    # list[DCDownBlock | None]
        self.enc_conv_out_w, self.enc_conv_out_b = enc_conv_out_w, enc_conv_out_b
        self.dec_conv_in_w, self.dec_conv_in_b = dec_conv_in_w, dec_conv_in_b
        self.dec_stages = dec_stages
        self.dec_ups = dec_ups        # list[DCUpBlock | None]
        self.dec_norm_w = dec_norm_w
        self.dec_conv_out_w, self.dec_conv_out_b = dec_conv_out_w, dec_conv_out_b

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, H, W) in [-1, 1] -> (B, latent, H/32, W/32) (unscaled)."""
        x = _conv(images.astype(jnp.bfloat16), self.enc_conv_in_w, self.enc_conv_in_b)
        for blocks, down in zip(self.enc_stages, self.enc_downs):
            for blk in blocks:
                x = blk(x)
            if down is not None:
                x = down(x)
        z = _conv(x, self.enc_conv_out_w, self.enc_conv_out_b)
        # channel-group-mean shortcut (DC-AE encoder out_shortcut)
        group = x.shape[1] // z.shape[1]
        y = x.reshape(x.shape[0], z.shape[1], group, *x.shape[2:]).mean(axis=2)
        return z + y.astype(z.dtype)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(B, latent, h, w) (unscaled) -> (B, H, W, 3) f32 in [0, 1]."""
        z = latents.astype(jnp.bfloat16)
        x = _conv(z, self.dec_conv_in_w, self.dec_conv_in_b)
        # channel-repeat shortcut (DC-AE decoder in_shortcut)
        repeats = x.shape[1] // z.shape[1]
        x = x + jnp.repeat(z, repeats, axis=1).astype(x.dtype)
        for blocks, up in zip(self.dec_stages, self.dec_ups):
            if up is not None:
                x = up(x)
            for blk in blocks:
                x = blk(x)
        x = _rms_norm_c(x, self.dec_norm_w)
        x = jax.nn.silu(x.astype(jnp.float32)).astype(jnp.bfloat16)
        x = _conv(x, self.dec_conv_out_w, self.dec_conv_out_b)
        img = jnp.clip(x.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
        return img.transpose(0, 2, 3, 1)

    @classmethod
    def random_init(cls, key, cfg: DCAEConfig | None = None):
        cfg = cfg or DCAEConfig()
        sd = synthesize_dcae_state_dict(cfg, seed=int(jax.random.randint(key, (), 0, 2**31 - 1)))
        return load_dc_ae(sd, cfg)


# ---------------------------------------------------------------------------
# loader (diffusers AutoencoderDC state-dict layout)
# ---------------------------------------------------------------------------


def _t(sd, key):
    return jnp.asarray(np.asarray(sd[key]).astype(np.float32), jnp.bfloat16)


def _build_block(sd, prefix, kind, cfg, channels, scales):
    if kind == "res":
        return ResBlock(
            _t(sd, f"{prefix}.conv1.weight"), _t(sd, f"{prefix}.conv1.bias"),
            _t(sd, f"{prefix}.conv2.weight"), _t(sd, f"{prefix}.norm.weight"),
        )
    a = f"{prefix}.attn"
    ms_in = [_t(sd, f"{a}.to_qkv_multiscale.{j}.proj_in.weight") for j in range(len(scales))]
    ms_out = [_t(sd, f"{a}.to_qkv_multiscale.{j}.proj_out.weight") for j in range(len(scales))]
    attn = MultiscaleLinearAttention(
        _t(sd, f"{a}.to_q.weight"), _t(sd, f"{a}.to_k.weight"), _t(sd, f"{a}.to_v.weight"),
        ms_in, ms_out, _t(sd, f"{a}.to_out.weight"), _t(sd, f"{a}.norm_out.weight"),
        head_dim=cfg.attention_head_dim,
    )
    c = f"{prefix}.conv_out"
    glu = GLUMBConv(
        _t(sd, f"{c}.conv_inverted.weight"), _t(sd, f"{c}.conv_inverted.bias"),
        _t(sd, f"{c}.conv_depth.weight"), _t(sd, f"{c}.conv_depth.bias"),
        _t(sd, f"{c}.conv_point.weight"), _t(sd, f"{c}.norm.weight"),
    )
    return EfficientViTBlock(attn, glu)


def load_dc_ae(path_or_tensors, cfg: DCAEConfig | None = None) -> DCAE:
    """Load a diffusers AutoencoderDC state dict (dc-ae-f32c32-sana)."""
    cfg = cfg or DCAEConfig()
    if isinstance(path_or_tensors, dict):
        sd = path_or_tensors
    else:
        from ..utils.safetensors import load_safetensors

        sd, _ = load_safetensors(path_or_tensors)

    n = len(cfg.block_out_channels)
    enc_stages, enc_downs = [], []
    for i in range(n):
        blocks = [
            _build_block(sd, f"encoder.down_blocks.{i}.{j}",
                         cfg.encoder_block_types[i], cfg,
                         cfg.block_out_channels[i], cfg.qkv_multiscales[i])
            for j in range(cfg.encoder_layers_per_block[i])
        ]
        enc_stages.append(blocks)
        if i < n - 1:
            j = cfg.encoder_layers_per_block[i]
            enc_downs.append(DCDownBlock(
                _t(sd, f"encoder.down_blocks.{i}.{j}.conv.weight"),
                _t(sd, f"encoder.down_blocks.{i}.{j}.conv.bias"),
            ))
        else:
            enc_downs.append(None)

    # decoder.up_blocks.{i} = stage i (channels block_out[i], i=0 outermost);
    # for i < n-1 element 0 is the upsampler entering the stage
    # (block_out[i+1] -> block_out[i]), blocks follow at 1..layers.
    dec_stages, dec_ups = [], []
    for i in range(n):
        has_up = i < n - 1
        off = 1 if has_up else 0
        blocks = [
            _build_block(sd, f"decoder.up_blocks.{i}.{j + off}",
                         cfg.decoder_block_types[i], cfg,
                         cfg.block_out_channels[i], cfg.qkv_multiscales[i])
            for j in range(cfg.decoder_layers_per_block[i])
        ]
        dec_stages.append(blocks)
        dec_ups.append(
            DCUpBlock(
                _t(sd, f"decoder.up_blocks.{i}.0.conv.weight"),
                _t(sd, f"decoder.up_blocks.{i}.0.conv.bias"),
            )
            if has_up else None
        )
    # decode() runs deepest-first: stage n-1 (no up), then up->stage n-2, ...
    dec_stages = dec_stages[::-1]
    dec_ups = dec_ups[::-1]

    return DCAE(
        cfg,
        _t(sd, "encoder.conv_in.weight"), _t(sd, "encoder.conv_in.bias"),
        enc_stages, enc_downs,
        _t(sd, "encoder.conv_out.weight"), _t(sd, "encoder.conv_out.bias"),
        _t(sd, "decoder.conv_in.weight"), _t(sd, "decoder.conv_in.bias"),
        dec_stages, dec_ups,
        _t(sd, "decoder.norm_out.weight"),
        _t(sd, "decoder.conv_out.weight"), _t(sd, "decoder.conv_out.bias"),
    )


def synthesize_dcae_state_dict(cfg: DCAEConfig | None = None, seed: int = 0) -> dict:
    """Random state dict in the diffusers AutoencoderDC layout (tests)."""
    cfg = cfg or DCAEConfig()
    rng = np.random.default_rng(seed)
    sd = {}

    def w(key, *shape, scale=0.03):
        sd[key] = (rng.normal(size=shape) * scale).astype(np.float32)

    def block(prefix, kind, c, scales, heads):
        if kind == "res":
            w(f"{prefix}.conv1.weight", c, c, 3, 3)
            w(f"{prefix}.conv1.bias", c)
            w(f"{prefix}.conv2.weight", c, c, 3, 3)
            sd[f"{prefix}.norm.weight"] = np.ones(c, np.float32)
            return
        a = f"{prefix}.attn"
        w(f"{a}.to_q.weight", c, c)
        w(f"{a}.to_k.weight", c, c)
        w(f"{a}.to_v.weight", c, c)
        for j, ks in enumerate(scales):
            w(f"{a}.to_qkv_multiscale.{j}.proj_in.weight", 3 * c, 1, ks, ks)
            w(f"{a}.to_qkv_multiscale.{j}.proj_out.weight", 3 * c, c // heads * 3, 1, 1)
        w(f"{a}.to_out.weight", c, c * (1 + len(scales)))
        sd[f"{a}.norm_out.weight"] = np.ones(c, np.float32)
        g = f"{prefix}.conv_out"
        hidden = c * 4
        w(f"{g}.conv_inverted.weight", hidden * 2, c, 1, 1)
        w(f"{g}.conv_inverted.bias", hidden * 2)
        w(f"{g}.conv_depth.weight", hidden * 2, 1, 3, 3)
        w(f"{g}.conv_depth.bias", hidden * 2)
        w(f"{g}.conv_point.weight", c, hidden, 1, 1)
        sd[f"{g}.norm.weight"] = np.ones(c, np.float32)

    ch = cfg.block_out_channels
    heads_of = lambda c: c // cfg.attention_head_dim
    w("encoder.conv_in.weight", ch[0], cfg.in_channels, 3, 3)
    w("encoder.conv_in.bias", ch[0])
    for i, c in enumerate(ch):
        for j in range(cfg.encoder_layers_per_block[i]):
            block(f"encoder.down_blocks.{i}.{j}", cfg.encoder_block_types[i],
                  c, cfg.qkv_multiscales[i], heads_of(c))
        if i < len(ch) - 1:
            j = cfg.encoder_layers_per_block[i]
            w(f"encoder.down_blocks.{i}.{j}.conv.weight", ch[i + 1], c, 3, 3)
            w(f"encoder.down_blocks.{i}.{j}.conv.bias", ch[i + 1])
    w("encoder.conv_out.weight", cfg.latent_channels, ch[-1], 3, 3)
    w("encoder.conv_out.bias", cfg.latent_channels)

    w("decoder.conv_in.weight", ch[-1], cfg.latent_channels, 3, 3)
    w("decoder.conv_in.bias", ch[-1])
    for i, c in enumerate(ch):
        has_up = i < len(ch) - 1
        if has_up:  # upsampler entering stage i: ch[i+1] -> ch[i]
            w(f"decoder.up_blocks.{i}.0.conv.weight", c, ch[i + 1], 3, 3)
            w(f"decoder.up_blocks.{i}.0.conv.bias", c)
        off = 1 if has_up else 0
        for j in range(cfg.decoder_layers_per_block[i]):
            block(f"decoder.up_blocks.{i}.{j + off}", cfg.decoder_block_types[i],
                  c, cfg.qkv_multiscales[i], heads_of(c))
    sd["decoder.norm_out.weight"] = np.ones(ch[0], np.float32)
    w("decoder.conv_out.weight", cfg.in_channels, ch[0], 3, 3)
    w("decoder.conv_out.bias", cfg.in_channels)
    return sd
