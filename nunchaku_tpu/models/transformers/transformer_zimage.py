"""Z-Image (S3-DiT) transformer, TPU-native.

Counterpart of the reference's Z-Image integration
(/root/reference/nunchaku/models/transformers/transformer_zimage.py:27-232 +
attention_processors/zimage.py): single-stream DiT blocks in the Lumina2
lineage — sandwich RMSNorms, tanh-gated 4-way adaLN modulation, fused-QKV
attention with per-head Q/K RMSNorm and interleaved-pair RoPE
(``freqs_cis`` complex multiply == our ``apply_rope`` pair convention), and
a SwiGLU feed-forward whose w1/w3 are fused into one quantized projection
(the reference converts ZImageFeedForward to a diffusers ``swiglu``
FeedForward before quantizing, transformer_zimage.py:119-167 — our
``fuse_glu`` quantize path implements the same split-half convention).

The reference quantizes ``attention.to_qkv`` / ``attention.to_out.0`` /
``feed_forward.net.0.proj`` / ``feed_forward.net.2`` per block, in the main
``layers`` stack and in the ``noise_refiner`` / ``context_refiner`` stacks
(skippable via quantization_config.skip_refiners); adaLN modulation linears
stay 16-bit. Same here.

Config defaults are placeholders — real runs read the ``config`` metadata
from the checkpoint (loader below).
"""

from __future__ import annotations

import math

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...core.module import Module
from ..attention import gelu_mlp  # noqa: F401  (FF chain parity for int8)
from ..attention import qkv_norm_rope
from ...ops.attention import LOG2E, flash_attention, qkv_rope_producer
from ...ops.quantize import quantize_w4a4_act_fuse_lora
from ..embeddings import rope_table, timestep_embedding
from ..linear import Linear, SVDQW4A4Linear, pad_rows, attach_stacked_weights
from ..normalization import layer_norm
from ...ops.reference import rmsnorm
from .transformer_flux import slice_module, stack_modules


@dataclass(frozen=True)
class ZImageConfig:
    dim: int = 1024
    num_layers: int = 4
    num_refiner_layers: int = 2
    num_attention_heads: int = 8
    in_channels: int = 16
    patch_size: int = 2
    cap_feat_dim: int = 1024
    norm_eps: float = 1e-5
    axes_dims_rope: tuple = (32, 48, 48)
    rank: int = 32
    precision: str = "int4"
    ffn_inner: int | None = None  # default 8/3*dim rounded to 256

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_attention_heads

    @property
    def inner_ffn(self) -> int:
        if self.ffn_inner is not None:
            return self.ffn_inner
        return ((int(self.dim * 8 / 3) + 255) // 256) * 256

    @property
    def t_dim(self) -> int:
        return min(self.dim, 1024)


class ZImageAttention(Module):
    """Fused-QKV single-stream attention with per-head Q/K RMSNorm + RoPE
    (reference NunchakuZImageAttention + NunchakuZSingleStreamAttnProcessor)."""

    def __init__(self, to_qkv: SVDQW4A4Linear, norm_q, norm_k, to_out, *, heads, head_dim):
        self.to_qkv = to_qkv
        self.norm_q = norm_q
        self.norm_k = norm_k
        self.to_out = to_out
        self.heads = heads
        self.head_dim = head_dim
        self.tp_axis = None

    @classmethod
    def random_init(cls, key, dim, heads, rank=32, precision="int4"):
        ks = jax.random.split(key, 2)
        hd = dim // heads
        return cls(
            SVDQW4A4Linear.random_init(ks[0], dim, 3 * dim, rank=rank, precision=precision),
            jnp.ones((hd,), jnp.bfloat16),
            jnp.ones((hd,), jnp.bfloat16),
            SVDQW4A4Linear.random_init(ks[1], dim, dim, rank=rank, precision=precision),
            heads=heads, head_dim=hd,
        )

    def __call__(self, x, rot):
        b, s, _ = x.shape
        qkv = self.to_qkv(x)
        heads_local = qkv.shape[-1] // 3 // self.head_dim
        prescale = LOG2E / math.sqrt(self.head_dim)
        if isinstance(rot, tuple):
            # half-split table: weights were permuted (enable_fused_qkv_prep
            # on the model); run the head-gridded Pallas producer. Heads
            # with D % 128 != 0 can't tile on Mosaic — same half-split math
            # as one fused XLA elementwise chain instead.
            cos, sin = rot
            if self.head_dim % 128 == 0:
                q, k, v = qkv_rope_producer(
                    qkv, cos, sin, self.norm_q, self.norm_k,
                    heads=heads_local, head_dim=self.head_dim,
                    q_scale=prescale,
                )
            else:
                from ..attention import _prep_halfsplit

                q, k, v = _prep_halfsplit(
                    qkv, cos, sin, self.norm_q, self.norm_k,
                    heads_local, self.head_dim, prescale,
                )
        else:
            q, k, v = qkv_norm_rope(
                qkv, self.head_dim, self.norm_q, self.norm_k, rot,
                prescale=prescale,
            )
        sp = getattr(self, "sp_axis", None)
        if sp is not None:
            # sequence parallelism: kv shards ride the ICI ring
            from ...parallel.sp import ring_attention

            o4 = ring_attention(q, k, v, sp, scale=1.0)
            o = o4.transpose(0, 2, 1, 3).reshape(b, s, -1)
        else:
            o = flash_attention(
                q, k, v, scale=1.0, out_bshd=True, fixed_softmax=True
            )
        out = self.to_out(o)
        if self.tp_axis is not None:
            out = jax.lax.psum(out, self.tp_axis)
        return out


class ZImageFeedForward(Module):
    """SwiGLU: w2( silu(w1(x)) * w3(x) ), with w1||w3 fused into one
    quantized projection (reference _convert_z_image_ff -> diffusers
    ``swiglu`` FeedForward: net.0.proj = [w3 | w1]-fused, net.2 = w2).
    The GLU product is computed inside the activation-quantize kernel
    (ops/quantize.py fuse_glu) so w2 consumes an already-quantized input."""

    def __init__(self, w13: SVDQW4A4Linear, w2: SVDQW4A4Linear):
        self.w13 = w13
        self.w2 = w2
        self.tp_axis = None

    @classmethod
    def random_init(cls, key, dim, inner, rank=32, precision="int4"):
        k1, k2 = jax.random.split(key)
        return cls(
            SVDQW4A4Linear.random_init(k1, dim, 2 * inner, rank=rank, precision=precision),
            SVDQW4A4Linear.random_init(k2, inner, dim, rank=rank, precision=precision),
        )

    def __call__(self, x):
        import math as _math

        h = self.w13(x)  # (..., 2*inner) = [value | gate] halves
        lead = h.shape[:-1]
        m = _math.prod(lead)
        if getattr(self.w2, "proj_down", None) is None:
            # plain-Linear w2 (bf16 twin / debug builds): unfused SwiGLU
            k2 = h.shape[-1] // 2
            val, gate = h[..., :k2], h[..., k2:]
            g = (val.astype(jnp.float32) * jax.nn.silu(gate.astype(jnp.float32)))
            out = self.w2(g.astype(jnp.bfloat16))
        else:
            h2 = pad_rows(h.reshape(m, h.shape[-1]), 8 if m <= 8 else 256)
            qact, asc, la = quantize_w4a4_act_fuse_lora(
                h2, self.w2.proj_down, self.w2.smooth,
                precision=self.w2.precision, fuse_glu=True,
            )
            out = self.w2.forward_quant(qact, asc, la)
            out = out[:m].reshape(*lead, out.shape[-1])
        if self.tp_axis is not None:
            out = jax.lax.psum(out, self.tp_axis)
        return out


class ZImageTransformerBlock(Module):
    """Lumina2-style block: sandwich norms + tanh-gated 4-way modulation.

    x += tanh(gate_msa) * norm2(attn(norm1(x) * (1 + scale_msa)))
    x += tanh(gate_mlp) * ffn_norm2(ff(ffn_norm1(x) * (1 + scale_mlp)))
    Refiner blocks without modulation skip the scales/gates.
    """

    def __init__(self, attention, feed_forward, attention_norm1, attention_norm2,
                 ffn_norm1, ffn_norm2, adaln=None, *, eps=1e-5):
        self.attention = attention
        self.feed_forward = feed_forward
        self.attention_norm1 = attention_norm1
        self.attention_norm2 = attention_norm2
        self.ffn_norm1 = ffn_norm1
        self.ffn_norm2 = ffn_norm2
        self.adaln = adaln  # Linear(t_dim, 4*dim) or None
        self.eps = eps

    @classmethod
    def random_init(cls, key, cfg: ZImageConfig, modulation=True):
        ks = jax.random.split(key, 3)
        dim = cfg.dim
        ones = lambda: jnp.ones((dim,), jnp.bfloat16)
        return cls(
            ZImageAttention.random_init(ks[0], dim, cfg.num_attention_heads,
                                        rank=cfg.rank, precision=cfg.precision),
            ZImageFeedForward.random_init(ks[1], dim, cfg.inner_ffn,
                                          rank=cfg.rank, precision=cfg.precision),
            ones(), ones(), ones(), ones(),
            Linear.random_init(ks[2], cfg.t_dim, 4 * dim) if modulation else None,
            eps=cfg.norm_eps,
        )

    def _rms(self, x, w):
        return rmsnorm(x, w, self.eps).astype(jnp.bfloat16)

    def __call__(self, x, temb, rot):
        if self.adaln is not None:
            mod = self.adaln(jax.nn.silu(temb.astype(jnp.float32)).astype(jnp.bfloat16))
            s_msa, g_msa, s_mlp, g_mlp = jnp.split(mod.astype(jnp.float32), 4, axis=-1)
            h = self._rms(x.astype(jnp.bfloat16), self.attention_norm1)
            h = (h.astype(jnp.float32) * (1.0 + s_msa[:, None])).astype(jnp.bfloat16)
            a = self.attention(h, rot)
            x = x + jnp.tanh(g_msa)[:, None] * self._rms(a, self.attention_norm2).astype(jnp.float32)
            h = self._rms(x.astype(jnp.bfloat16), self.ffn_norm1)
            h = (h.astype(jnp.float32) * (1.0 + s_mlp[:, None])).astype(jnp.bfloat16)
            f = self.feed_forward(h)
            x = x + jnp.tanh(g_mlp)[:, None] * self._rms(f, self.ffn_norm2).astype(jnp.float32)
            return x
        a = self.attention(self._rms(x.astype(jnp.bfloat16), self.attention_norm1), rot)
        x = x + self._rms(a, self.attention_norm2).astype(jnp.float32)
        f = self.feed_forward(self._rms(x.astype(jnp.bfloat16), self.ffn_norm1))
        x = x + self._rms(f, self.ffn_norm2).astype(jnp.float32)
        return x


class ZImageTransformer2DModel(Module):
    """Full Z-Image transformer: x/cap embedders, refiner stacks, main
    layers over the joint [cap; img] stream, modulated final layer."""

    def __init__(self, cfg, x_embedder, t_embedder1, t_embedder2, cap_norm, cap_embedder,
                 noise_refiner, context_refiner, layers, norm_out, proj_out, adaln_out):
        self.cfg = cfg
        self.x_embedder = x_embedder
        self.t_embedder1 = t_embedder1
        self.t_embedder2 = t_embedder2
        self.cap_norm = cap_norm
        self.cap_embedder = cap_embedder
        self.noise_refiner = noise_refiner  # stacked, modulated
        self.context_refiner = context_refiner  # stacked, unmodulated
        self.layers = layers  # stacked, modulated
        self.norm_out = norm_out
        self.proj_out = proj_out
        self.adaln_out = adaln_out  # Linear(t_dim, dim): final scale

    @classmethod
    def random_init(cls, key, cfg: ZImageConfig):
        ks = jax.random.split(key, 9)
        dim = cfg.dim
        patch_dim = cfg.in_channels * cfg.patch_size**2
        noise_ref = stack_modules([
            ZImageTransformerBlock.random_init(k, cfg, modulation=True)
            for k in jax.random.split(ks[0], cfg.num_refiner_layers)
        ])
        ctx_ref = stack_modules([
            ZImageTransformerBlock.random_init(k, cfg, modulation=False)
            for k in jax.random.split(ks[1], cfg.num_refiner_layers)
        ])
        layers = stack_modules([
            ZImageTransformerBlock.random_init(k, cfg, modulation=True)
            for k in jax.random.split(ks[2], cfg.num_layers)
        ])
        return cls(
            cfg,
            Linear.random_init(ks[3], patch_dim, dim),
            Linear.random_init(ks[4], 256, cfg.t_dim),
            Linear.random_init(ks[5], cfg.t_dim, cfg.t_dim),
            jnp.ones((cfg.cap_feat_dim,), jnp.bfloat16),
            Linear.random_init(ks[6], cfg.cap_feat_dim, dim),
            noise_ref, ctx_ref, layers,
            jnp.ones((dim,), jnp.bfloat16),
            Linear.random_init(ks[7], dim, patch_dim),
            Linear.random_init(ks[8], cfg.t_dim, dim),
        )

    def enable_fused_qkv_prep(self, producer: bool = True):
        """Fused attention prologue: half-split q/k permutation of every
        attention stack (main layers + both refiners) and the head-gridded
        Pallas qkv_rope_producer (tuple rope tables are converted once per
        forward). See FluxTransformer2DModel for measured wins."""
        from ..attention import _halfsplit_head_perm, _halfsplit_qkv_perm, \
            _permute_out_channels

        if not producer:
            raise ValueError(
                "Z-Image has no XLA half-split path; producer must be True"
            )
        for stack in (self.noise_refiner, self.context_refiner, self.layers):
            attn = stack.attention
            n = attn.to_qkv.qweight.shape[-1]
            perm = _halfsplit_qkv_perm(attn.heads, attn.head_dim, n)
            hperm = jnp.asarray(_halfsplit_head_perm(attn.head_dim))
            _permute_out_channels(attn.to_qkv, perm)
            attn.norm_q = jnp.take(attn.norm_q, hperm, axis=-1)
            attn.norm_k = jnp.take(attn.norm_k, hperm, axis=-1)
            if producer:
                attn.prep_producer = True
        self._rope_halfsplit = True
        return self

    def _scan(self, stacked, x, temb, rot):
        # 4-bit modes: attach stacked qweights + layer index so the Pallas
        # GEMMs read weight tiles via scalar prefetch (models/linear.py
        # attach_stacked_weights; int8 runs XLA dots, which fuse the slice)
        probe = stacked.attention.to_qkv
        pallas_w = getattr(probe, "precision", None) in ("w4a8", "int4", "nvfp4")
        n = jax.tree.leaves(stacked)[0].shape[0]

        def body(carry, layer):
            block, i = layer
            if pallas_w:
                block = attach_stacked_weights(block, stacked, i)
            return block(carry, temb, rot), None

        x, _ = jax.lax.scan(body, x, (stacked, jnp.arange(n, dtype=jnp.int32)))
        return x

    def __call__(self, hidden_states, encoder_hidden_states, timestep,
                 img_ids, txt_ids):
        """hidden_states (B, S_img, in_channels*p²) pre-patchified tokens;
        encoder_hidden_states (B, S_txt, cap_feat_dim); timestep (B,) in
        [0, 1]; ids (S, 3) rope positions."""
        cfg = self.cfg
        temb = self.t_embedder2(
            jax.nn.silu(
                self.t_embedder1(timestep_embedding(timestep * 1000.0, 256)).astype(jnp.float32)
            ).astype(jnp.bfloat16)
        ).astype(jnp.bfloat16)

        img = self.x_embedder(hidden_states).astype(jnp.float32)
        cap = rmsnorm(encoder_hidden_states, self.cap_norm, cfg.norm_eps)
        cap = self.cap_embedder(cap.astype(jnp.bfloat16)).astype(jnp.float32)

        rot_img = rope_table(img_ids, cfg.axes_dims_rope)
        rot_txt = rope_table(txt_ids, cfg.axes_dims_rope)
        rot = jnp.concatenate([rot_txt, rot_img], axis=0)
        if getattr(self, "_rope_halfsplit", False):
            from ...ops.attention import rope_table_halfsplit

            rot_img = rope_table_halfsplit(rot_img)
            rot_txt = rope_table_halfsplit(rot_txt)
            rot = rope_table_halfsplit(rot)

        img = self._scan(self.noise_refiner, img, temb, rot_img)
        cap = self._scan(self.context_refiner, cap, None, rot_txt)

        s_txt = cap.shape[1]
        x = jnp.concatenate([cap, img], axis=1)
        x = self._scan(self.layers, x, temb, rot)

        img = x[:, s_txt:]
        scale = self.adaln_out(jax.nn.silu(temb.astype(jnp.float32)).astype(jnp.bfloat16))
        out = rmsnorm(img.astype(jnp.bfloat16), self.norm_out, cfg.norm_eps)
        out = out.astype(jnp.float32) * (1.0 + scale.astype(jnp.float32)[:, None])
        return self.proj_out(out.astype(jnp.bfloat16))
