"""AutoencoderKL (FLUX/SDXL VAE) in JAX.

The reference relies on diffusers' torch VAE; a TPU-native engine needs its
own so the full pipeline stays on-device. Standard KL autoencoder: resnet
blocks + single-head spatial mid-attention, GroupNorm(32), SiLU. Loads the
stock diffusers state dict (models/transformers/loader-style key mapping).
Weights run in bf16 with f32 norms; convs ride the MXU via
lax.conv_general_dilated.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module


def _conv(x, w, b=None, stride=1, padding=1):
    """NCHW conv. w: (out, in, kh, kw) torch layout."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)[None, :, None, None]
    return out.astype(jnp.bfloat16)


def group_norm(x, weight, bias, groups=32, eps=1e-6):
    b, c, h, w = x.shape
    xf = x.astype(jnp.float32).reshape(b, groups, c // groups, h, w)
    mu = jnp.mean(xf, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4), keepdims=True)
    xf = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(b, c, h, w)
    return (xf * weight.astype(jnp.float32)[None, :, None, None]
            + bias.astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


class Conv2d(Module):
    def __init__(self, weight, bias=None, stride=1, padding=1):
        self.weight = weight
        self.bias = bias
        self.stride = stride
        self.padding = padding

    @classmethod
    def random_init(cls, key, cin, cout, k=3, stride=1, padding=1):
        w = jax.random.normal(key, (cout, cin, k, k), jnp.bfloat16) / math.sqrt(cin * k * k)
        return cls(w, jnp.zeros((cout,), jnp.bfloat16), stride, padding)

    def __call__(self, x):
        return _conv(x, self.weight, self.bias, self.stride, self.padding)


class ResnetBlock(Module):
    def __init__(self, norm1_w, norm1_b, conv1, norm2_w, norm2_b, conv2, shortcut=None):
        self.norm1_w, self.norm1_b = norm1_w, norm1_b
        self.conv1 = conv1
        self.norm2_w, self.norm2_b = norm2_w, norm2_b
        self.conv2 = conv2
        self.shortcut = shortcut

    @classmethod
    def random_init(cls, key, cin, cout):
        ks = jax.random.split(key, 3)
        return cls(
            jnp.ones((cin,), jnp.bfloat16), jnp.zeros((cin,), jnp.bfloat16),
            Conv2d.random_init(ks[0], cin, cout),
            jnp.ones((cout,), jnp.bfloat16), jnp.zeros((cout,), jnp.bfloat16),
            Conv2d.random_init(ks[1], cout, cout),
            Conv2d.random_init(ks[2], cin, cout, k=1, padding=0) if cin != cout else None,
        )

    def __call__(self, x):
        h = jax.nn.silu(group_norm(x, self.norm1_w, self.norm1_b).astype(jnp.float32)).astype(x.dtype)
        h = self.conv1(h)
        h = jax.nn.silu(group_norm(h, self.norm2_w, self.norm2_b).astype(jnp.float32)).astype(x.dtype)
        h = self.conv2(h)
        sc = x if self.shortcut is None else self.shortcut(x)
        return (sc.astype(jnp.float32) + h.astype(jnp.float32)).astype(x.dtype)


class AttnBlock(Module):
    """Single-head spatial self-attention (diffusers Attention in VAE)."""

    def __init__(self, norm_w, norm_b, q, k, v, out):
        self.norm_w, self.norm_b = norm_w, norm_b
        self.q, self.k, self.v, self.out = q, k, v, out

    @classmethod
    def random_init(cls, key, c):
        ks = jax.random.split(key, 4)
        mk = lambda kk: Conv2d.random_init(kk, c, c, k=1, padding=0)
        return cls(jnp.ones((c,), jnp.bfloat16), jnp.zeros((c,), jnp.bfloat16),
                   mk(ks[0]), mk(ks[1]), mk(ks[2]), mk(ks[3]))

    def __call__(self, x):
        b, c, h, w = x.shape
        hn = group_norm(x, self.norm_w, self.norm_b)
        q = self.q(hn).reshape(b, c, h * w)
        k = self.k(hn).reshape(b, c, h * w)
        v = self.v(hn).reshape(b, c, h * w)
        if c % 128 == 0 and h * w >= 1024:
            # Flash path: at 1024px the decoder's mid block attends over
            # 128x128 = 16384 tokens — the naive (S, S) f32 score matrix is
            # 1 GiB and OOMs beside the resident transformer weights. The
            # single spatial head maps to the flash kernel with D = c (512,
            # a lane multiple); online softmax keeps exactness for arbitrary
            # logit ranges.
            from ..ops.attention import flash_attention

            qh = jnp.swapaxes(q, 1, 2)[:, None].astype(jnp.bfloat16)
            kh = jnp.swapaxes(k, 1, 2)[:, None].astype(jnp.bfloat16)
            vh = jnp.swapaxes(v, 1, 2)[:, None].astype(jnp.bfloat16)
            o = flash_attention(qh, kh, vh, scale=1.0 / math.sqrt(c))
            o = jnp.swapaxes(o[:, 0], 1, 2)  # (b, c, hw)
        else:
            attn = jax.nn.softmax(
                jnp.einsum("bcq,bck->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
                / math.sqrt(c),
                axis=-1,
            )
            o = jnp.einsum("bqk,bck->bcq", attn, v.astype(jnp.float32))
        o = self.out(o.reshape(b, c, h, w).astype(x.dtype))
        return (x.astype(jnp.float32) + o.astype(jnp.float32)).astype(x.dtype)


class Upsample(Module):
    def __init__(self, conv):
        self.conv = conv

    @classmethod
    def random_init(cls, key, c):
        return cls(Conv2d.random_init(key, c, c))

    def __call__(self, x):
        b, c, h, w = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return self.conv(x)


class Downsample(Module):
    def __init__(self, conv):
        self.conv = conv

    @classmethod
    def random_init(cls, key, c):
        return cls(Conv2d.random_init(key, c, c, stride=2, padding=0))

    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
        return self.conv(x)


class AutoencoderKL(Module):
    """Decoder (+ encoder) with diffusers-compatible structure."""

    def __init__(self, *, scaling_factor, shift_factor, decoder, encoder=None):
        self.scaling_factor = scaling_factor
        self.shift_factor = shift_factor
        self.decoder = decoder
        self.encoder = encoder
        # spatial tiling (diffusers enable_vae_tiling, used by the
        # reference's low-VRAM demos): decode in 64-latent (512px) tiles
        # with 25% overlap + linear blending. None = whole-image decode.
        self.tile_latent_size = None
        self.tile_overlap = 0.25

    @classmethod
    def random_init(
        cls, key, latent_channels=16, block_out_channels=(128, 256, 512, 512),
        layers_per_block=2, scaling_factor=0.3611, shift_factor=0.1159,
    ):
        k1, k2 = jax.random.split(key)
        dec = Decoder.random_init(k1, latent_channels, block_out_channels, layers_per_block)
        enc = Encoder.random_init(k2, latent_channels, block_out_channels, layers_per_block)
        return cls(scaling_factor=scaling_factor, shift_factor=shift_factor,
                   decoder=dec, encoder=enc)

    def enable_tiling(self, tile_latent_size: int = 64, overlap: float = 0.25):
        """Decode in overlapping spatial tiles (diffusers enable_vae_tiling).

        Caps decoder activation peak at the tile footprint — at 1024px the
        whole-image decode peaks ~1.5 GiB of f32 conv temps, which does not
        fit beside a resident 12 GiB int8 transformer + T5-XXL on a 16 GiB
        chip. 64-latent tiles (512px out) keep the peak under 400 MiB."""
        self.tile_latent_size = tile_latent_size
        self.tile_overlap = overlap

    def disable_tiling(self):
        self.tile_latent_size = None

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, C_lat, h, w) scaled latents -> (B, H, W, 3) f32 in [0, 1]."""
        ts = self.tile_latent_size
        if ts is not None and (z.shape[2] > ts or z.shape[3] > ts):
            return self._decode_tiled(z)
        return _decode_jit(self, z)

    def _decode_tiled(self, z: jnp.ndarray) -> jnp.ndarray:
        """diffusers AutoencoderKL.tiled_decode: overlapping latent tiles,
        linear cross-fade over the overlap, equal-size tiles everywhere (the
        last row/col tile is taken flush against the edge so every tile
        decode compiles once)."""
        b, c, h, w = z.shape
        ts = self.tile_latent_size
        f = 8  # spatial upscale factor of the decoder
        stride = max(int(ts * (1.0 - self.tile_overlap)), 1)
        blend = (ts - stride) * f  # overlap extent in pixels

        def offsets(extent):
            if extent <= ts:
                return [0]
            offs = list(range(0, extent - ts, stride))
            offs.append(extent - ts)  # flush last tile, same size
            return offs

        rows_off = offsets(h)
        cols_off = offsets(w)
        out = None
        wsum = None
        for i in rows_off:
            for j in cols_off:
                tile = jax.lax.dynamic_slice(z, (0, 0, i, j), (b, c, ts, ts))
                dec = _decode_jit(self, tile)  # (B, ts*f, ts*f, 3)
                if out is None:
                    out = jnp.zeros((b, h * f, w * f, 3), jnp.float32)
                    wsum = jnp.zeros((1, h * f, w * f, 1), jnp.float32)
                mask = _tile_blend_mask(
                    ts * f, blend,
                    top=i > 0, bottom=i != rows_off[-1],
                    left=j > 0, right=j != cols_off[-1],
                )
                out = jax.lax.dynamic_update_slice(
                    out,
                    jax.lax.dynamic_slice(
                        out, (0, i * f, j * f, 0), (b, ts * f, ts * f, 3)
                    ) + dec * mask,
                    (0, i * f, j * f, 0),
                )
                wsum = jax.lax.dynamic_update_slice(
                    wsum,
                    jax.lax.dynamic_slice(
                        wsum, (0, i * f, j * f, 0), (1, ts * f, ts * f, 1)
                    ) + mask,
                    (0, i * f, j * f, 0),
                )
        return out / jnp.maximum(wsum, 1e-8)

    def _decode_impl(self, z: jnp.ndarray) -> jnp.ndarray:
        z = z.astype(jnp.bfloat16) / self.scaling_factor + self.shift_factor
        img = self.decoder(z)
        img = img.astype(jnp.float32).transpose(0, 2, 3, 1)
        return jnp.clip(img / 2 + 0.5, 0.0, 1.0)

    def encode(self, images: jnp.ndarray, key=None) -> jnp.ndarray:
        """(B, H, W, 3) in [0,1] -> scaled latents (B, C_lat, h, w) (mode)."""
        x = (images * 2.0 - 1.0).transpose(0, 3, 1, 2).astype(jnp.bfloat16)
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=1)
        z = mean
        if key is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * jax.random.normal(
                key, mean.shape, mean.dtype
            )
        return (z - self.shift_factor) * self.scaling_factor


@jax.jit
def _decode_jit(vae: "AutoencoderKL", z: jnp.ndarray) -> jnp.ndarray:
    # jitted whole-decode: lets XLA plan/free conv temps (the eager path
    # holds every intermediate alive through the dispatch stream and OOMs
    # beside a resident 12 GiB transformer at 1024px)
    return vae._decode_impl(z)


def _tile_blend_mask(size: int, blend: int, *, top, bottom, left, right):
    """(1, size, size, 1) linear cross-fade weights for one decoded tile.

    Ramps 1/(blend+1)..blend/(blend+1) over the overlap region on each
    interior edge; complementary tiles sum to ~1 and the mask-sum
    normalization in _decode_tiled removes the residual."""
    ramp = (jnp.arange(size, dtype=jnp.float32) + 1.0) / (blend + 1.0)
    up = jnp.minimum(ramp, 1.0)
    down = up[::-1]
    rows = jnp.ones((size,), jnp.float32)
    if top:
        rows = rows * up
    if bottom:
        rows = rows * down
    cols = jnp.ones((size,), jnp.float32)
    if left:
        cols = cols * up
    if right:
        cols = cols * down
    return (rows[:, None] * cols[None, :])[None, :, :, None]


class Decoder(Module):
    def __init__(self, conv_in, mid_r1, mid_attn, mid_r2, up_blocks, upsamplers,
                 norm_out_w, norm_out_b, conv_out):
        self.conv_in = conv_in
        self.mid_r1 = mid_r1
        self.mid_attn = mid_attn
        self.mid_r2 = mid_r2
        self.up_blocks = up_blocks  # list of lists of ResnetBlock
        self.upsamplers = upsamplers  # list of Upsample or None
        self.norm_out_w, self.norm_out_b = norm_out_w, norm_out_b
        self.conv_out = conv_out

    @classmethod
    def random_init(cls, key, latent_channels, block_out_channels, layers_per_block):
        ks = iter(jax.random.split(key, 64))
        ch = block_out_channels[-1]
        conv_in = Conv2d.random_init(next(ks), latent_channels, ch)
        mid_r1 = ResnetBlock.random_init(next(ks), ch, ch)
        mid_attn = AttnBlock.random_init(next(ks), ch)
        mid_r2 = ResnetBlock.random_init(next(ks), ch, ch)
        up_blocks, upsamplers = [], []
        rev = list(reversed(block_out_channels))
        prev = ch
        for i, c in enumerate(rev):
            blocks = []
            for _ in range(layers_per_block + 1):
                blocks.append(ResnetBlock.random_init(next(ks), prev, c))
                prev = c
            up_blocks.append(blocks)
            upsamplers.append(
                Upsample.random_init(next(ks), c) if i < len(rev) - 1 else None
            )
        conv_out = Conv2d.random_init(next(ks), block_out_channels[0], 3)
        return cls(conv_in, mid_r1, mid_attn, mid_r2, up_blocks, upsamplers,
                   jnp.ones((block_out_channels[0],), jnp.bfloat16),
                   jnp.zeros((block_out_channels[0],), jnp.bfloat16), conv_out)

    def __call__(self, z):
        h = self.conv_in(z)
        h = self.mid_r2(self.mid_attn(self.mid_r1(h)))
        for blocks, up in zip(self.up_blocks, self.upsamplers):
            for blk in blocks:
                h = blk(h)
            if up is not None:
                h = up(h)
        h = jax.nn.silu(group_norm(h, self.norm_out_w, self.norm_out_b).astype(jnp.float32)).astype(h.dtype)
        return self.conv_out(h)


class Encoder(Module):
    def __init__(self, conv_in, down_blocks, downsamplers, mid_r1, mid_attn, mid_r2,
                 norm_out_w, norm_out_b, conv_out):
        self.conv_in = conv_in
        self.down_blocks = down_blocks
        self.downsamplers = downsamplers
        self.mid_r1 = mid_r1
        self.mid_attn = mid_attn
        self.mid_r2 = mid_r2
        self.norm_out_w, self.norm_out_b = norm_out_w, norm_out_b
        self.conv_out = conv_out

    @classmethod
    def random_init(cls, key, latent_channels, block_out_channels, layers_per_block):
        ks = iter(jax.random.split(key, 64))
        conv_in = Conv2d.random_init(next(ks), 3, block_out_channels[0])
        down_blocks, downsamplers = [], []
        prev = block_out_channels[0]
        for i, c in enumerate(block_out_channels):
            blocks = []
            for _ in range(layers_per_block):
                blocks.append(ResnetBlock.random_init(next(ks), prev, c))
                prev = c
            down_blocks.append(blocks)
            downsamplers.append(
                Downsample.random_init(next(ks), c)
                if i < len(block_out_channels) - 1
                else None
            )
        ch = block_out_channels[-1]
        return cls(
            conv_in, down_blocks, downsamplers,
            ResnetBlock.random_init(next(ks), ch, ch),
            AttnBlock.random_init(next(ks), ch),
            ResnetBlock.random_init(next(ks), ch, ch),
            jnp.ones((ch,), jnp.bfloat16), jnp.zeros((ch,), jnp.bfloat16),
            Conv2d.random_init(next(ks), ch, 2 * 16),
        )

    def __call__(self, x):
        h = self.conv_in(x)
        for blocks, down in zip(self.down_blocks, self.downsamplers):
            for blk in blocks:
                h = blk(h)
            if down is not None:
                h = down(h)
        h = self.mid_r2(self.mid_attn(self.mid_r1(h)))
        h = jax.nn.silu(group_norm(h, self.norm_out_w, self.norm_out_b).astype(jnp.float32)).astype(h.dtype)
        return self.conv_out(h)


# ---------------------------------------------------------------------------
# diffusers state-dict loader
# ---------------------------------------------------------------------------


def load_autoencoder(path_or_tensors, *, scaling_factor=0.3611, shift_factor=0.1159,
                     block_out_channels=(128, 256, 512, 512), layers_per_block=2,
                     latent_channels=16) -> AutoencoderKL:
    """Build from a diffusers AutoencoderKL safetensors file / tensor dict."""
    if isinstance(path_or_tensors, dict):
        sd = path_or_tensors
    else:
        from ..utils.safetensors import load_safetensors

        sd, _ = load_safetensors(path_or_tensors)

    def conv(prefix, stride=1, padding=1):
        return Conv2d(
            jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).astype(np.float32), jnp.bfloat16),
            jnp.asarray(np.asarray(sd[f"{prefix}.bias"]).astype(np.float32), jnp.bfloat16),
            stride, padding,
        )

    def vec(name):
        return jnp.asarray(np.asarray(sd[name]).astype(np.float32), jnp.bfloat16)

    def resnet(prefix, cin, cout):
        sc = conv(f"{prefix}.conv_shortcut", padding=0) if f"{prefix}.conv_shortcut.weight" in sd else None
        return ResnetBlock(
            vec(f"{prefix}.norm1.weight"), vec(f"{prefix}.norm1.bias"),
            conv(f"{prefix}.conv1"),
            vec(f"{prefix}.norm2.weight"), vec(f"{prefix}.norm2.bias"),
            conv(f"{prefix}.conv2"), sc,
        )

    def attn(prefix):
        def qkv(name):
            w = np.asarray(sd[f"{prefix}.{name}.weight"]).astype(np.float32)
            if w.ndim == 2:  # diffusers Attention uses Linear layers
                w = w[:, :, None, None]
            return Conv2d(jnp.asarray(w, jnp.bfloat16), vec(f"{prefix}.{name}.bias"), 1, 0)

        return AttnBlock(
            vec(f"{prefix}.group_norm.weight"), vec(f"{prefix}.group_norm.bias"),
            qkv("to_q"), qkv("to_k"), qkv("to_v"), qkv("to_out.0"),
        )

    rev = list(reversed(block_out_channels))
    up_blocks, upsamplers = [], []
    prev = rev[0]
    for i, c in enumerate(rev):
        blocks = []
        for j in range(layers_per_block + 1):
            blocks.append(resnet(f"decoder.up_blocks.{i}.resnets.{j}", prev, c))
            prev = c
        up_blocks.append(blocks)
        upsamplers.append(
            Upsample(conv(f"decoder.up_blocks.{i}.upsamplers.0.conv"))
            if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd
            else None
        )
    decoder = Decoder(
        conv(f"decoder.conv_in"),
        resnet("decoder.mid_block.resnets.0", rev[0], rev[0]),
        attn("decoder.mid_block.attentions.0"),
        resnet("decoder.mid_block.resnets.1", rev[0], rev[0]),
        up_blocks, upsamplers,
        vec("decoder.conv_norm_out.weight"), vec("decoder.conv_norm_out.bias"),
        conv("decoder.conv_out"),
    )

    encoder = None
    if "encoder.conv_in.weight" in sd:
        down_blocks, downsamplers = [], []
        prev = block_out_channels[0]
        for i, c in enumerate(block_out_channels):
            blocks = []
            for j in range(layers_per_block):
                blocks.append(resnet(f"encoder.down_blocks.{i}.resnets.{j}", prev, c))
                prev = c
            down_blocks.append(blocks)
            downsamplers.append(
                Downsample(conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", stride=2, padding=0))
                if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd
                else None
            )
        encoder = Encoder(
            conv("encoder.conv_in"), down_blocks, downsamplers,
            resnet("encoder.mid_block.resnets.0", prev, prev),
            attn("encoder.mid_block.attentions.0"),
            resnet("encoder.mid_block.resnets.1", prev, prev),
            vec("encoder.conv_norm_out.weight"), vec("encoder.conv_norm_out.bias"),
            conv("encoder.conv_out"),
        )

    return AutoencoderKL(
        scaling_factor=scaling_factor, shift_factor=shift_factor,
        decoder=decoder, encoder=encoder,
    )
