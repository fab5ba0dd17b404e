"""SANA transformer (linear-attention DiT), TPU-native.

Rebuild of the reference's C++ SANA graph (src/SanaModel.{h,cpp}:
SanaLinearAttention :25-106 with the EpilogueLiteLA relu-kernel linear
attention, MultiHeadCrossAttention :147-189, SanaGLUMBConv :201-213,
SanaLinearTransformerBlock :215-300 with the per-block scale_shift_table)
and its Python integration (nunchaku/models/transformers/transformer_sana.py).

TPU mapping:
  * LiteLA (relu linear attention, 32-dim heads): ``vk = relu(k)^T [v; 1]``
    then ``out = relu(q) vk / (relu(q) k_sum + eps)`` — O(S d^2) einsums that
    ride the MXU directly; no custom epilogue needed because the contraction
    is tiny (d=32) and XLA fuses the relu into the producer GEMM's consumer.
  * GLUMBConv: W4A4 inverted projection + SiLU, 3x3 depthwise conv
    (lax.conv with feature_group_count), GLU fused into the following
    W4A4 quantize (ops/quantize.py fuse_glu).
  * cross attention: W4A4 q / bf16 kv projections + the shared flash
    attention kernel (text length padded+masked instead of varlen).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module
from ...ops.attention import flash_attention
from ..embeddings import timestep_embedding, MLPEmbedder
from ..linear import Linear, SVDQW4A4Linear, attach_stacked_weights
from ..normalization import layer_norm
from .transformer_flux import stack_modules

LA_HEAD_DIM = 32  # SanaModel.cpp:26


@dataclass(frozen=True)
class SanaConfig:
    num_layers: int = 20
    num_attention_heads: int = 70  # dim 2240 = 70 * 32
    attention_head_dim: int = 32
    num_cross_attention_heads: int = 20
    cross_attention_head_dim: int = 112
    caption_channels: int = 2304
    in_channels: int = 32
    out_channels: int = 32
    expand_ratio: float = 2.5
    rank: int = 32
    precision: str = "int4"
    # block indices carrying real pag_to_v weights (reference pag_layers,
    # SanaModel.h:99); set by the loader, None until a PAG checkpoint loads
    pag_layers: tuple[int, ...] | None = None

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def ff_hidden(self) -> int:
        return int(self.dim * self.expand_ratio)


def lite_la(qkv: jnp.ndarray, dim: int, eps: float = 1e-15,
            sp_axis: str | None = None) -> jnp.ndarray:
    """ReLU linear attention over fused qkv (B, S, 3*dim), 32-dim heads.

    ``sp_axis``: sequence parallelism — S is sharded over that mesh axis;
    linear attention's kv statistics are token SUMS, so one psum of the
    (d x d) vk moment and the k-sum makes the sharded computation exact
    (far cheaper than softmax attention's ring)."""
    b, s, _ = qkv.shape
    q, k, v = jnp.split(qkv[..., : 3 * dim], 3, axis=-1)
    h = dim // LA_HEAD_DIM

    def heads(t):
        return t.reshape(b, s, h, LA_HEAD_DIM).transpose(0, 2, 1, 3)

    q = jax.nn.relu(heads(q).astype(jnp.float32))
    k = jax.nn.relu(heads(k).astype(jnp.float32))
    v = heads(v).astype(jnp.float32)
    vk = jnp.einsum("bhsd,bhse->bhde", k, v)  # (B, H, d, d)
    ksum = jnp.sum(k, axis=2)  # (B, H, d)
    if sp_axis is not None:
        vk = jax.lax.psum(vk, sp_axis)
        ksum = jax.lax.psum(ksum, sp_axis)
    num = jnp.einsum("bhsd,bhde->bhse", q, vk)
    den = jnp.einsum("bhsd,bhd->bhs", q, ksum)[..., None] + eps
    out = (num / den).transpose(0, 2, 1, 3).reshape(b, s, dim)
    return out.astype(jnp.bfloat16)


class SanaLinearAttention(Module):
    def __init__(self, qkv_proj: SVDQW4A4Linear, out_proj: SVDQW4A4Linear, pag_to_v=None):
        self.qkv_proj = qkv_proj
        self.out_proj = out_proj
        self.pag_to_v = pag_to_v  # perturbed-attention-guidance value proj
        self.tp_axis = None  # set by parallel.tp.parallelize_sana()

    @classmethod
    def random_init(cls, key, dim, rank=32, precision="int4", pag=False):
        k1, k2, k3 = jax.random.split(key, 3)
        return cls(
            SVDQW4A4Linear.random_init(k1, dim, 3 * dim, rank=rank, precision=precision, bias=False),
            SVDQW4A4Linear.random_init(k2, dim, dim, rank=rank, precision=precision, bias=False),
            SVDQW4A4Linear.random_init(k3, dim, dim, rank=rank, precision=precision, bias=False)
            if pag else None,
        )

    def __call__(self, x, *, pag=False, pag_rows=None):
        """``pag`` may be a python bool or a traced () bool (per-layer flag
        threaded as scan xs for pag_layers selection); ``pag_rows`` is an
        optional (B,) bool mask marking the perturbed batch rows (the
        reference splits the batch by slicing, SanaModel.cpp:108-145
        forward_pag — here a replicated where-select keeps the scan body
        uniform across layers)."""
        want_pag = self.pag_to_v is not None and (
            not isinstance(pag, bool) or pag
        )
        if want_pag and isinstance(pag, bool) and pag_rows is None:
            # static whole-batch perturbed path: identity attention
            # (value projection only, SanaModel.cpp:108-145 forward_pag)
            out = self.out_proj(self.pag_to_v(x))
        else:
            qkv = self.qkv_proj(x)
            # local dim from the projection width: under TP the shard
            # holds heads/tp (32-dim heads stay whole per shard)
            out = self.out_proj(
                lite_la(qkv, qkv.shape[-1] // 3,
                        sp_axis=getattr(self, "sp_axis", None))
            )
            if want_pag:
                ptb = self.out_proj(self.pag_to_v(x))
                sel = pag if pag_rows is None else jnp.logical_and(pag, pag_rows)
                sel = jnp.reshape(sel, (-1, 1, 1)) if jnp.ndim(sel) else sel
                # both operands are pre-psum partials under TP; the mask is
                # replicated, so selecting before the psum stays exact
                out = jnp.where(sel, ptb, out)
        if self.tp_axis is not None:  # out_proj is row-parallel
            out = jax.lax.psum(out, self.tp_axis)
        return out


class SanaCrossAttention(Module):
    def __init__(self, q_linear: SVDQW4A4Linear, kv_linear: Linear, out_proj: SVDQW4A4Linear,
                 *, heads, head_dim):
        self.q_linear = q_linear
        self.kv_linear = kv_linear  # bf16 like the reference's GEMM_F16 kv_linear
        self.out_proj = out_proj
        self.heads = heads
        self.head_dim = head_dim
        self.tp_axis = None  # set by parallel.tp.parallelize_sana()

    @classmethod
    def random_init(cls, key, dim, heads, rank=32, precision="int4"):
        ks = jax.random.split(key, 3)
        return cls(
            SVDQW4A4Linear.random_init(ks[0], dim, dim, rank=rank, precision=precision),
            Linear.random_init(ks[1], dim, 2 * dim),
            SVDQW4A4Linear.random_init(ks[2], dim, dim, rank=rank, precision=precision),
            heads=heads, head_dim=dim // heads,
        )

    def __call__(self, x, cond, cond_mask=None):
        b, s, dim = x.shape
        s_txt = cond.shape[1]
        d = self.head_dim
        q = self.q_linear(x)
        h = q.shape[-1] // d  # local head count under TP
        q = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        kv = self.kv_linear(cond.astype(jnp.bfloat16))
        k, v = jnp.split(kv.astype(jnp.bfloat16), 2, axis=-1)
        k = k.reshape(b, s_txt, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s_txt, h, d).transpose(0, 2, 1, 3)
        if cond_mask is None:
            o = flash_attention(q, k, v)
        else:
            # variable text lengths (the reference's varlen mha_fwd,
            # SanaModel.cpp:147-189): text is short, so a masked dense
            # attention in XLA is cheap and exact
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
            ) * (d**-0.5)
            scores = jnp.where(cond_mask[:, None, None, :], scores, -1e30)
            p = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        out = self.out_proj(o)
        if self.tp_axis is not None:  # out_proj is row-parallel
            out = jax.lax.psum(out, self.tp_axis)
        return out


class SanaGLUMBConv(Module):
    def __init__(self, inverted: SVDQW4A4Linear, depth_w, depth_b, point: SVDQW4A4Linear):
        self.inverted = inverted  # in -> 2*hidden
        self.depth_w = depth_w  # (2h, 1, 3, 3) depthwise
        self.depth_b = depth_b
        self.point = point  # hidden -> in (GLU fused into its quantize)
        self.tp_axis = None  # set by parallel.tp.parallelize_sana()

    @classmethod
    def random_init(cls, key, dim, hidden, rank=32, precision="int4"):
        ks = jax.random.split(key, 3)
        import math

        return cls(
            SVDQW4A4Linear.random_init(ks[0], dim, 2 * hidden, rank=rank, precision=precision),
            jax.random.normal(ks[1], (2 * hidden, 1, 3, 3), jnp.bfloat16) / math.sqrt(9),
            jnp.zeros((2 * hidden,), jnp.bfloat16),
            SVDQW4A4Linear.random_init(ks[2], hidden, dim, rank=rank, precision=precision, bias=False),
        )

    def __call__(self, x, hw):
        h_img, w_img = hw
        b, s, _ = x.shape
        y = self.inverted(x)
        y = jax.nn.silu(y.astype(jnp.float32)).astype(jnp.bfloat16)
        c2 = y.shape[-1]
        img = y.reshape(b, h_img, w_img, c2).transpose(0, 3, 1, 2)
        sp = getattr(self, "sp_axis", None)
        pad_h = (1, 1)
        if sp is not None:
            # sequence parallelism shards the pixel rows: the 3x3 depthwise
            # conv needs one halo row from each grid neighbor (ppermute);
            # the global top/bottom keep the conv's zero padding
            n = jax.lax.axis_size(sp)
            idx = jax.lax.axis_index(sp)
            up = jax.lax.ppermute(  # neighbor above's last row
                img[:, :, -1:], sp, [(i, (i + 1) % n) for i in range(n)]
            )
            down = jax.lax.ppermute(  # neighbor below's first row
                img[:, :, :1], sp, [(i, (i - 1) % n) for i in range(n)]
            )
            up = jnp.where(idx == 0, jnp.zeros_like(up), up)
            down = jnp.where(idx == n - 1, jnp.zeros_like(down), down)
            img = jnp.concatenate([up, img, down], axis=2)
            pad_h = (0, 0)
        img = jax.lax.conv_general_dilated(
            img, self.depth_w, (1, 1), [pad_h, (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c2,
            preferred_element_type=jnp.float32,
        ) + self.depth_b.astype(jnp.float32)[None, :, None, None]
        y = img.transpose(0, 2, 3, 1).reshape(b, s, c2).astype(jnp.bfloat16)
        # GLU fused into point_conv's activation quantization
        m = b * s
        y2 = y.reshape(m, c2)
        from ..linear import pad_rows
        from ...ops.quantize import quantize_w4a4_act_fuse_lora

        if getattr(self.point, "proj_down", None) is None:
            # plain-Linear point conv (bf16 twin / debug builds): unfused GLU
            half = c2 // 2
            val, gate = y2[:, :half], y2[:, half:]
            g = val.astype(jnp.float32) * jax.nn.silu(gate.astype(jnp.float32))
            out = self.point(g.astype(jnp.bfloat16)).reshape(b, s, -1)
        else:
            qact, asc, la = quantize_w4a4_act_fuse_lora(
                pad_rows(y2), self.point.proj_down, self.point.smooth,
                precision=self.point.precision, fuse_glu=True,
            )
            out = self.point.forward_quant(qact, asc, la)[:m]
            if self.point.logical_out < out.shape[-1]:  # odd-dim padding
                out = out[:, : self.point.logical_out]
            out = out.reshape(b, s, -1)
        if self.tp_axis is not None:  # point conv is row-parallel
            out = jax.lax.psum(out, self.tp_axis)
        return out


class SanaTransformerBlock(Module):
    def __init__(self, scale_shift_table, attn, cross_attn, ff):
        self.scale_shift_table = scale_shift_table  # (6, dim)
        self.attn = attn
        self.cross_attn = cross_attn
        self.ff = ff

    @classmethod
    def random_init(cls, key, cfg: SanaConfig, pag=False):
        ks = jax.random.split(key, 4)
        dim = cfg.dim
        return cls(
            jax.random.normal(ks[0], (6, dim), jnp.float32) * 0.02,
            SanaLinearAttention.random_init(ks[1], dim, cfg.rank, cfg.precision, pag),
            SanaCrossAttention.random_init(ks[2], dim, cfg.num_cross_attention_heads,
                                           cfg.rank, cfg.precision),
            SanaGLUMBConv.random_init(ks[3], dim, cfg.ff_hidden, cfg.rank, cfg.precision),
        )

    def __call__(self, x, cond, temb6, hw, cond_mask=None, pag=False,
                 pag_rows=None):
        # temb6: (B, 6, dim) from the shared AdaLN-single projection
        mods = temb6 + self.scale_shift_table[None].astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            mods[:, i][:, None] for i in range(6)
        ]
        norm_x = layer_norm(x) * (1 + scale_msa) + shift_msa
        attn_out = self.attn(norm_x.astype(jnp.bfloat16), pag=pag,
                             pag_rows=pag_rows)
        x = x + gate_msa * attn_out.astype(jnp.float32)

        x = x + self.cross_attn(x.astype(jnp.bfloat16), cond, cond_mask).astype(jnp.float32)

        norm_x = layer_norm(x) * (1 + scale_mlp) + shift_mlp
        ff_out = self.ff(norm_x.astype(jnp.bfloat16), hw)
        return x + gate_mlp * ff_out.astype(jnp.float32)


class SanaTransformer2DModel(Module):
    """Full SANA DiT (diffusers-compatible forward contract)."""

    def __init__(self, cfg, patch_embed, caption_proj, time_embed, time_proj_linear,
                 blocks, scale_shift_table_out, proj_out):
        self.cfg = cfg
        self.patch_embed = patch_embed  # Linear in_channels -> dim (patch 1)
        self.caption_proj = caption_proj  # Linear caption_channels -> dim
        self.time_embed = time_embed  # MLPEmbedder 256 -> dim
        self.time_proj_linear = time_proj_linear  # Linear dim -> 6*dim (silu)
        self.blocks = blocks  # stacked SanaTransformerBlock
        self.scale_shift_table_out = scale_shift_table_out  # (2, dim)
        self.proj_out = proj_out  # Linear dim -> out_channels

    @classmethod
    def random_init(cls, key, cfg: SanaConfig):
        ks = jax.random.split(key, 7)
        dim = cfg.dim
        # when PAG layers are configured, every block gets a pag_to_v leaf so
        # the stacked pytree stays rectangular (the loader zero-pads the
        # same way); per-layer selection happens at call time via pag_layers
        blocks = stack_modules(
            [SanaTransformerBlock.random_init(k, cfg,
                                              pag=cfg.pag_layers is not None)
             for k in jax.random.split(ks[0], cfg.num_layers)]
        )
        return cls(
            cfg,
            Linear.random_init(ks[1], cfg.in_channels, dim),
            Linear.random_init(ks[2], cfg.caption_channels, dim),
            MLPEmbedder.random_init(ks[3], 256, dim),
            Linear.random_init(ks[4], dim, 6 * dim),
            blocks,
            jax.random.normal(ks[5], (2, dim), jnp.float32) * 0.02,
            Linear.random_init(ks[6], dim, cfg.out_channels),
        )

    # -- composable stages (the caching subsystem splits the graph here,
    #    mirroring reference SanaCachedTransformerBlocks, caching/utils.py:33) --
    def embed(self, hidden_states, encoder_hidden_states, timestep):
        b, s, _ = hidden_states.shape
        sp_n = getattr(self, "_sp_n", 1)  # sequence shards (parallel/sp.py)
        side = int(round((s * sp_n) ** 0.5))
        if sp_n > 1:
            side = (side // sp_n, side)  # local rows x global width
        x = self.patch_embed(hidden_states).astype(jnp.float32)
        cond = self.caption_proj(encoder_hidden_states).astype(jnp.bfloat16)
        temb = self.time_embed(timestep_embedding(timestep * 1000.0, 256))
        temb6 = self.time_proj_linear(
            jax.nn.silu(temb.astype(jnp.float32)).astype(jnp.bfloat16)
        ).astype(jnp.float32).reshape(b, 6, -1)
        return x, cond, temb, temb6, side

    def run_blocks(self, x, cond, temb6, side, cond_mask=None, pag=False,
                   start=0, stop=None, pag_layers=None, pag_rows=None):
        """``pag_layers``: optional list of block indices (model-global) that
        run the perturbed path when ``pag`` — the reference's
        ``pag_layers`` config (SanaModel.cpp:331,358). None = all blocks
        (when ``pag``). ``pag_rows``: (B,) bool, perturbed batch rows."""
        stop = self.cfg.num_layers if stop is None else stop
        blocks = jax.tree.map(lambda a: a[start:stop], self.blocks)

        probe = blocks.attn.qkv_proj if hasattr(blocks, "attn") else None
        pallas_w = getattr(probe, "precision", None) in ("w4a8", "int4", "nvfp4")
        n = stop - start

        hw = side if isinstance(side, tuple) else (side, side)

        if pag and pag_layers is not None:
            flags = np.zeros((n,), np.bool_)
            for l in pag_layers:
                if start <= l < stop:
                    flags[l - start] = True
            pag_xs = jnp.asarray(flags)
        else:
            pag_xs = None

        def body(carry, layer):
            block, i, flag = layer
            if pallas_w:
                block = attach_stacked_weights(block, blocks, i)
            p = pag if flag is None else flag
            return block(carry, cond, temb6, hw, cond_mask, p, pag_rows), None

        idx = jnp.arange(n, dtype=jnp.int32)
        if pag_xs is None:
            x, _ = jax.lax.scan(
                lambda c, l: body(c, (*l, None)), x, (blocks, idx)
            )
        else:
            x, _ = jax.lax.scan(body, x, (blocks, idx, pag_xs))
        return x

    def head(self, x, temb):
        mods = self.scale_shift_table_out[None].astype(jnp.float32) + temb[
            :, None
        ].astype(jnp.float32)
        shift, scale = mods[:, 0], mods[:, 1]
        out = layer_norm(x) * (1 + scale[:, None]) + shift[:, None]
        return self.proj_out(out.astype(jnp.bfloat16)).astype(jnp.bfloat16)

    def __call__(self, hidden_states, encoder_hidden_states, timestep,
                 cond_mask=None, pag: bool = False, pag_layers=None,
                 pag_rows=None):
        """hidden_states (B, S_img, in_ch) tokens (patch 1 latents),
        encoder_hidden_states (B, S_txt, caption_channels), timestep (B,)."""
        x, cond, temb, temb6, side = self.embed(
            hidden_states, encoder_hidden_states, timestep
        )
        x = self.run_blocks(x, cond, temb6, side, cond_mask, pag,
                            pag_layers=pag_layers, pag_rows=pag_rows)
        return self.head(x, temb)
