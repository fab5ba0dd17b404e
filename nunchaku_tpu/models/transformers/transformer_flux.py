"""FLUX.1 transformer, TPU-native.

Rebuild of the reference's FLUX graph — C++ v1 (src/FluxModel.cpp:1239-1366,
19 JointTransformerBlock + 38 FluxSingleTransformerBlock, dim 3072, 24 heads,
head_dim 128) and Python v2 (nunchaku/models/transformers/transformer_flux_v2.py)
— as a jitted JAX graph:

  * blocks are **stacked** (every parameter gains a leading layer axis) and
    executed with ``lax.scan`` — one compile per block type, natural layer
    sharding, and ControlNet / PuLID / IP-Adapter residual injections ride
    the scan ``xs`` instead of the reference's per-layer C++ callback
    (csrc/flux.h:31-53, FluxModel.cpp:1290-1335);
  * the first dual and first single block can run standalone
    (``run_dual_block`` / ``run_single_block``) so first-block caching
    (caching/fbcache.py strategy) splits the scan instead of breaking the
    graph;
  * txt/img token concat at the dual->single transition mirrors
    FluxModel.cpp:1306-1317 (text first).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...core.module import Module
from ...utils.debug_taps import tap
from ...ops.attention import rope_table_halfsplit
from ..attention import FeedForward, FluxAttention, gelu_mlp, permute_qk_halfsplit
from ..embeddings import CombinedTimestepEmbeddings, rope_table
from ..linear import DualStreamLinear, Linear, SVDQW4A4Linear, attach_stacked_weights
from ..normalization import (
    AdaLayerNormContinuous,
    AdaLayerNormZero,
    AdaLayerNormZeroSingle,
    batched_adaln_mod,
    can_batch_mod,
    layer_norm,
)


# Fused LN+modulate+int8-quantize producers (ops/quantize.ln_mod_quant_int8)
# for bf16-stream int8 blocks: one Pallas read replaces the XLA LN/modulate/
# quantize passes. Toggle for A/B (tools/ablate_ln_quant.py).
FUSED_LN_QUANT = True


def set_fused_ln_quant(enabled: bool) -> None:
    global FUSED_LN_QUANT
    FUSED_LN_QUANT = bool(enabled)


# Gated-residual adds fused into the chain consumer's epilogue
# (ops/gemm.svdq_gemm_w4a4 residual operands). Toggle for A/B.
RES_EPILOGUE = True


def set_res_epilogue(enabled: bool) -> None:
    global RES_EPILOGUE
    RES_EPILOGUE = bool(enabled)


def _ln_producer_ok(lin) -> bool:
    """The ln_mod_quant_int8 producer applies when the consumer takes
    per-token int8 activations: int8 always; w4a8 only on the XLA
    dequant+dot route (the Pallas hybrid GEMM measured +13 ms/step when
    fed Pallas-produced qact — tools/ablate_ln_quant.py notes)."""
    from ...ops.gemm import _w4a8_use_xla

    p = getattr(lin, "precision", None)
    return p == "int8" or (p == "w4a8" and _w4a8_use_xla(0, 0, 0))


@dataclass(frozen=True)
class FluxConfig:
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    in_channels: int = 64
    out_channels: int = 64
    guidance_embeds: bool = True
    axes_dims_rope: tuple = (16, 56, 56)
    rank: int = 32
    precision: str = "int4"

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


def stack_modules(mods: list[Module]) -> Module:
    """Stack identical modules leaf-wise -> one module with a layer axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *mods)


def slice_module(stacked: Module, i) -> Module:
    """Take layer ``i`` out of a stacked module (static or traced index)."""
    return jax.tree.map(lambda a: a[i], stacked)


class FluxTransformerBlock(Module):
    """Dual-stream (joint) block: parallel img/txt AdaLN + joint attention
    + per-stream gated MLPs (reference FluxModel.cpp:437-790 /
    transformer_flux_v2.py:144-257)."""

    def __init__(self, norm1, norm1_context, attn, ff, ff_context):
        self.norm1 = norm1
        self.norm1_context = norm1_context
        self.attn = attn
        self.ff = ff
        self.ff_context = ff_context

    @classmethod
    def random_init(cls, key, cfg: FluxConfig):
        ks = jax.random.split(key, 5)
        dim = cfg.dim
        return cls(
            AdaLayerNormZero.random_init(ks[0], dim, precision=cfg.precision),
            AdaLayerNormZero.random_init(ks[1], dim, precision=cfg.precision),
            FluxAttention.random_init(
                ks[2], dim, cfg.num_attention_heads, cfg.attention_head_dim,
                joint=True, rank=cfg.rank, precision=cfg.precision,
            ),
            FeedForward.random_init(ks[3], dim, rank=cfg.rank, precision=cfg.precision),
            FeedForward.random_init(ks[4], dim, rank=cfg.rank, precision=cfg.precision),
        )

    def __call__(self, img, txt, temb, rot, ip_kv=None, ip_scale: float = 1.0,
                 mods=None, ff_stacked=None, kv_mask=None):
        # residual math in f32; the carry is cast back to the stream dtype
        # (f32 default; set_stream_dtype(bf16) halves stream HBM traffic
        # like the reference's bf16 streams, src/FluxModel.cpp)
        # ``mods``: precomputed (mod1, mod1c) AdaLN modulation vectors —
        # temb is layer-invariant, so the scan hoists their GEMMs
        # (normalization.py batched_adaln_mod)
        sdt = img.dtype
        m1 = m1c = None
        if mods is not None:
            m1, m1c = mods
        fused_ln = (
            FUSED_LN_QUANT
            and sdt == jnp.bfloat16
            # int8 + (since the XLA dequant+dot route) w4a8: both consume
            # int8 activations. The old Pallas w4a8 GEMM measured +13 ms
            # WITH the producer; gate on _ln_producer_ok so the legacy
            # kernel path (NUNCHAKU_TPU_W4A8_XLA=0) keeps it off.
            and _ln_producer_ok(self.attn.to_qkv)
            and getattr(self.attn, "qkv_merged", None) is None
        )
        if fused_ln:
            shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
                self.norm1.mod_vectors(temb, mod=m1)
            )
            c_shift_msa, c_scale_msa, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = (
                self.norm1_context.mod_vectors(temb, mod=m1c)
            )
            attn_outs = self.attn(
                img, txt, rot, ip_kv=ip_kv,
                mods=((scale_msa, shift_msa), (c_scale_msa, c_shift_msa)),
                kv_mask=kv_mask,
            )
        else:
            norm_img, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(
                img, temb, mod=m1
            )
            norm_txt, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(
                txt, temb, mod=m1c
            )
            attn_outs = self.attn(norm_img, norm_txt, rot, ip_kv=ip_kv,
                                  kv_mask=kv_mask)
        attn_img, attn_txt = attn_outs[0], attn_outs[1]
        attn_img = tap("dual.attn_img", attn_img)
        attn_txt = tap("dual.attn_txt", attn_txt)

        img = (img + gate_msa[:, None] * attn_img.astype(jnp.float32)).astype(sdt)
        if len(attn_outs) == 3:  # IP-Adapter residual (transformer_flux_v2.py:238)
            img = (img + ip_scale * attn_outs[2].astype(jnp.float32)).astype(sdt)
        stk_ff, stk_ffc = ff_stacked if ff_stacked is not None else (None, None)
        if fused_ln and RES_EPILOGUE:
            # the gated residual add rides the chain consumer's epilogue
            # (ops/gemm.svdq_gemm_w4a4 residual operands) — the ff output
            # never round-trips HBM for a separate XLA add fusion
            img = self.ff(img, mod=(scale_mlp, shift_mlp), stacked=stk_ff,
                          residual=(img, gate_mlp))
        elif fused_ln:
            ff_out = self.ff(img, mod=(scale_mlp, shift_mlp), stacked=stk_ff)
            img = (img + gate_mlp[:, None] * ff_out.astype(jnp.float32)).astype(sdt)
        else:
            h = layer_norm(img) * (1.0 + scale_mlp[:, None]) + shift_mlp[:, None]
            ff_out = self.ff(h.astype(attn_img.dtype), stacked=stk_ff)
            img = (img + gate_mlp[:, None] * ff_out.astype(jnp.float32)).astype(sdt)

        txt = (txt + c_gate_msa[:, None] * attn_txt.astype(jnp.float32)).astype(sdt)
        if fused_ln and RES_EPILOGUE:
            txt = self.ff_context(txt, mod=(c_scale_mlp, c_shift_mlp),
                                  stacked=stk_ffc, residual=(txt, c_gate_mlp))
        elif fused_ln:
            ffc_out = self.ff_context(txt, mod=(c_scale_mlp, c_shift_mlp), stacked=stk_ffc)
            txt = (txt + c_gate_mlp[:, None] * ffc_out.astype(jnp.float32)).astype(sdt)
        else:
            h = layer_norm(txt) * (1.0 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
            ffc_out = self.ff_context(h.astype(attn_txt.dtype), stacked=stk_ffc)
            txt = (txt + c_gate_mlp[:, None] * ffc_out.astype(jnp.float32)).astype(sdt)
        return tap("dual.img_out", img), tap("dual.txt_out", txt)


class FluxSingleTransformerBlock(Module):
    """Single-stream block: parallel attention + MLP summed through one
    gated output (reference FluxModel.cpp:297-403). The diffusers
    ``proj_out`` is split into attn-out (K=dim) and mlp-out (K=4*dim)
    halves like transformer_flux_v2.py:283-289."""

    def __init__(self, norm, attn, mlp_fc1, mlp_fc2, attn_out):
        self.norm = norm
        self.attn = attn
        self.mlp_fc1 = mlp_fc1
        self.mlp_fc2 = mlp_fc2
        self.attn_out = attn_out
        self.tp_axis = None  # set by parallel.tp.parallelize()

    @classmethod
    def random_init(cls, key, cfg: FluxConfig):
        ks = jax.random.split(key, 5)
        dim = cfg.dim
        hidden = dim * 4
        return cls(
            AdaLayerNormZeroSingle.random_init(ks[0], dim, precision=cfg.precision),
            FluxAttention.random_init(
                ks[1], dim, cfg.num_attention_heads, cfg.attention_head_dim,
                joint=False, rank=cfg.rank, precision=cfg.precision,
            ),
            SVDQW4A4Linear.random_init(ks[2], dim, hidden, rank=cfg.rank, precision=cfg.precision),
            SVDQW4A4Linear.random_init(
                ks[3], hidden, dim, rank=cfg.rank, precision=cfg.precision,
                act_unsigned=(cfg.precision == "int4"),
            ),
            SVDQW4A4Linear.random_init(ks[4], dim, dim, rank=cfg.rank, precision=cfg.precision),
        )

    def __call__(self, x, temb, rot, mod=None, mlp_stacked=None):
        fused_ln = (
            FUSED_LN_QUANT
            and x.dtype == jnp.bfloat16
            and _ln_producer_ok(self.attn.to_qkv)
            and _ln_producer_ok(self.mlp_fc1)
        )
        if fused_ln:
            # the shared AdaLN output feeds BOTH producers; two fused
            # one-read producers beat one norm pass + two XLA quantizes.
            # (A dual-output producer kernel — ln_mod_quant_int8_dual, one
            # read + one LN emitting both quantized activations — measured
            # +10 ms/step SLOWER in-model: the doubled per-tile output DMA
            # serializes against the next tile's read. Kept opt-in in
            # ops/quantize.py for narrower-stream models.)
            shift_msa, scale_msa, gate = self.norm.mod_vectors(temb, mod=mod)
            attn = self.attn(x, None, rot, mods=((scale_msa, shift_msa), None))
            if self.tp_axis is None and RES_EPILOGUE:
                # x + gate*(attn_out + mlp) fused into the chain consumer's
                # epilogue: attn_out's main term enters as the `extra`
                # operand and its low-rank branch as (lora_act, proj_up) —
                # the XLA lora-add + residual fusion's full-width HBM pass
                # disappears (round-4 trace fusion.506, ~8 ms/step)
                attn_main, attn_la = self.attn_out.forward_parts(attn)
                out = gelu_mlp(
                    self.mlp_fc1, self.mlp_fc2, x,
                    mod=(scale_msa, shift_msa), stacked=mlp_stacked,
                    residual=(x, gate, attn_main, attn_la,
                              self.attn_out.proj_up),
                )
                return tap("single.out", out.astype(x.dtype))
            mlp = gelu_mlp(self.mlp_fc1, self.mlp_fc2, x,
                           mod=(scale_msa, shift_msa), stacked=mlp_stacked)
        else:
            norm_x, gate = self.norm(x, temb, mod=mod)
            attn = self.attn(norm_x, None, rot)
            mlp = gelu_mlp(self.mlp_fc1, self.mlp_fc2, norm_x, stacked=mlp_stacked)
        out = self.attn_out(attn).astype(jnp.float32) + mlp.astype(jnp.float32)
        if self.tp_axis is not None:  # attn_out + mlp_fc2 are row-parallel
            out = jax.lax.psum(out, self.tp_axis)
        return tap("single.out", (x + gate[:, None] * out).astype(x.dtype))


class FluxTransformer2DModel(Module):
    """Full FLUX transformer (diffusers-compatible forward contract)."""

    def __init__(
        self,
        cfg: FluxConfig,
        x_embedder: Linear,
        context_embedder: Linear,
        time_text_embed: CombinedTimestepEmbeddings,
        transformer_blocks: Module,  # stacked FluxTransformerBlock
        single_transformer_blocks: Module,  # stacked FluxSingleTransformerBlock
        norm_out: AdaLayerNormContinuous,
        proj_out: Linear,
    ):
        self.cfg = cfg
        self.x_embedder = x_embedder
        self.context_embedder = context_embedder
        self.time_text_embed = time_text_embed
        self.transformer_blocks = transformer_blocks
        self.single_transformer_blocks = single_transformer_blocks
        self.norm_out = norm_out
        self.proj_out = proj_out

    @classmethod
    def random_init(cls, key, cfg: FluxConfig):
        ks = jax.random.split(key, 7)
        dim = cfg.dim
        dual = stack_modules(
            [
                FluxTransformerBlock.random_init(k, cfg)
                for k in jax.random.split(ks[0], cfg.num_layers)
            ]
        )
        single = stack_modules(
            [
                FluxSingleTransformerBlock.random_init(k, cfg)
                for k in jax.random.split(ks[1], cfg.num_single_layers)
            ]
        )
        return cls(
            cfg,
            Linear.random_init(ks[2], cfg.in_channels, dim),
            Linear.random_init(ks[3], cfg.joint_attention_dim, dim),
            CombinedTimestepEmbeddings.random_init(
                ks[4], dim, cfg.pooled_projection_dim, cfg.guidance_embeds
            ),
            dual,
            single,
            AdaLayerNormContinuous.random_init(ks[5], dim),
            Linear.random_init(ks[6], dim, cfg.out_channels),
        )

    @classmethod
    def dummy_init(cls, cfg: FluxConfig):
        """Zero-weight model with the exact param tree of random_init —
        built without RNG compute (for benchmarks and compile checks)."""
        shapes = jax.eval_shape(
            lambda: cls.random_init(jax.random.PRNGKey(0), cfg)
        )
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def set_attention_impl(self, impl: str = "flashattn2", *, sparsity_ratio: float = 0.0):
        """Select the attention path (reference set_attention_impl,
        nunchaku/models/transformers/transformer_flux.py:648 + the C++
        sparsityRatio forward arg, src/FluxModel.cpp:130).

        - ``"flashattn2"`` / ``"nunchaku-fp16"``: the dense Pallas flash
          kernel (one kernel covers both reference impls on TPU).
        - ``"blocksparse"``: pooled top-k block-sparse attention for
          high-resolution inputs; ``sparsity_ratio`` in (0, 1) is the
          fraction of 128-token kv blocks each query block skips.

        Static setting — changes trace shapes, so flip it before jit.
        """
        if impl in ("flashattn2", "nunchaku-fp16"):
            ratio = 0.0
        elif impl == "blocksparse":
            if not 0.0 < sparsity_ratio < 1.0:
                raise ValueError("blocksparse needs 0 < sparsity_ratio < 1")
            ratio = float(sparsity_ratio)
        else:
            raise ValueError(f"unknown attention impl: {impl!r}")
        self.transformer_blocks.attn.sparsity_ratio = ratio
        self.single_transformer_blocks.attn.sparsity_ratio = ratio
        return self

    def enable_fused_qkv_prep(self, producer: bool = True):
        """Switch to the fused attention prologue: permute q/k channels of
        every QKV projection (+ q/k RMSNorm weights) into half-split rope
        layout and run split+transpose+norm+rope as the head-gridded Pallas
        producer (ops/attention.py qkv_rope_producer) writing q/k/v straight
        in the flash kernel's (B, H, S, D) layout — no XLA transpose or
        layout copies. Measured on one v5e at FLUX 1024px: 359.5 ms/step vs
        389.0 unfused and 418.3 with the XLA half-split chain
        (``producer=False``). With the producer, the qkv GEMM's low-rank
        (lora) epilogue also moves into the producer tiles (lora_in_producer,
        default on): XLA otherwise materializes the lora dot+add as a full
        (M, 3HD) HBM round-trip fusion (~6.5 ms/step at 1024px).
        Semantics-preserving; call once after load/init + LoRA (and before
        parallelize()). Not compatible with IP-Adapter injection (ip_kv
        needs the unfused layout)."""
        permute_qk_halfsplit(self.transformer_blocks.attn)
        permute_qk_halfsplit(self.single_transformer_blocks.attn)
        if producer:
            self.transformer_blocks.attn.prep_producer = True
            self.single_transformer_blocks.attn.prep_producer = True
        self._rope_halfsplit = True
        return self

    # -- composable stages (the caching subsystem splits the graph here) ----
    def merge_dual_streams(self) -> "FluxTransformer2DModel":
        """Merge each dual-block projection pair (to_qkv/add_qkv_proj,
        to_out/to_add_out) into one joint-stream GEMM
        (models/linear.py DualStreamLinear). Measured on one v5e: +47 ms
        vs the split form at FLUX 1024px — the 2x MAC cost of the N-concat
        outweighs the per-call savings (standalone txt-GEMM cost measured
        by ablation stubs is mostly XLA-scheduling overlap, which a real
        restructure does not recover). Kept as an option for shapes where
        the text stream dominates. In-place; incompatible with
        parallelize() and LoRA application — call after load + LoRA,
        before jit. int8 turbo only."""
        attn = self.transformer_blocks.attn
        attn.qkv_merged = DualStreamLinear(attn.add_qkv_proj, attn.to_qkv)
        attn.out_merged = DualStreamLinear(attn.to_add_out, attn.to_out)
        attn.to_qkv = attn.add_qkv_proj = None
        attn.to_out = attn.to_add_out = None
        attn.register_dynamic("qkv_merged", "out_merged")
        return self

    def set_hoist_mods(self, on: bool = True) -> "FluxTransformer2DModel":
        """Compute every layer's AdaLN modulation in one batched GEMM
        before the scan (normalization.batched_adaln_mod) instead of
        per-layer M=1 GEMMs inside it. OFF by default: measured +22 ms on
        one v5e — the in-scan mod GEMMs' weight DMA overlaps preceding
        compute, while the hoisted einsums serialize. Useful under TP
        (mod weights replicated) or future schedulers."""
        self._hoist_mods = bool(on)
        return self

    def set_stream_dtype(self, dtype) -> "FluxTransformer2DModel":
        """Residual-stream carry dtype. f32 (default) accumulates the 57
        gated block outputs losslessly; bf16 halves the stream's HBM
        traffic (~10 ms/step at 1024px) at ~0.3% output drift — the
        reference's C++ engine also carries bf16/fp16 streams."""
        self._stream_dtype = jnp.dtype(dtype)
        return self

    def embed(
        self, hidden_states, encoder_hidden_states, pooled_projections,
        timestep, img_ids, txt_ids, guidance=None,
    ):
        """Input embeddings: -> (img, txt (stream dtype), temb bf16, rot)."""
        sdt = getattr(self, "_stream_dtype", jnp.float32)
        img = self.x_embedder(hidden_states).astype(sdt)
        txt = self.context_embedder(encoder_hidden_states).astype(sdt)
        temb = self.time_text_embed(timestep, pooled_projections, guidance)
        temb = temb.astype(jnp.bfloat16)
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rot = rope_table(ids, self.cfg.axes_dims_rope)
        if getattr(self, "_rope_halfsplit", False):
            rot = rope_table_halfsplit(rot)  # (cos, sin) for qkv_prepare
        return img, txt, temb, rot

    def run_dual(self, img, txt, temb, rot, start=0, stop=None,
                 controlnet_block_samples=None, ip_kv=None,
                 ip_scale: float = 1.0):
        """Scan dual blocks [start, stop) (static bounds).

        ``ip_kv = (k_ip, v_ip)`` stacked (L, B, S_ip, inner): per-layer
        IP-Adapter image cross-attention K/V ride the scan as xs (reference
        IPA_TransformerBlocks, ip_adapter/utils.py:25-491 — which extends
        the *cached* blocks, so this path composes with fb_cached_forward).
        """
        stop = self.cfg.num_layers if stop is None else stop
        blocks = jax.tree.map(lambda a: a[start:stop], self.transformer_blocks)
        ctrl = _expand_controlnet(controlnet_block_samples, self.cfg.num_layers)
        if ctrl is not None:
            ctrl = ctrl[start:stop]
        ip = None
        if ip_kv is not None:
            ip = (ip_kv[0][start:stop], ip_kv[1][start:stop])
        mods = None
        if getattr(self, "_hoist_mods", False) and can_batch_mod(
            self.transformer_blocks.norm1.linear
        ):
            mods = (
                batched_adaln_mod(self.transformer_blocks.norm1.linear, temb)[start:stop],
                batched_adaln_mod(self.transformer_blocks.norm1_context.linear, temb)[start:stop],
            )

        # Stacked FF weights + per-layer index: the Pallas chain kernels
        # read layer tiles from the (L, K, N) stacks via scalar prefetch,
        # so XLA never materializes the per-block weight-slice copies
        # (int8 chain only; other precisions use the scan-sliced weights
        # and the stack reference is dead code XLA removes).
        n = stop - start
        stk = (
            (blocks.ff.fc1.qweight, blocks.ff.fc2.qweight),
            (blocks.ff_context.fc1.qweight, blocks.ff_context.fc2.qweight),
        ) if getattr(blocks.ff.fc1, "precision", None) in ("int8", "w4a8") else None

        pallas_w = getattr(blocks.ff.fc1, "precision", None) in (
            "w4a8", "int4", "nvfp4"
        )

        def body(carry, layer):
            block, c, m, ipl, i = layer
            ffs = None
            if stk is not None:
                ffs = ((*stk[0], i), (*stk[1], i))
            if pallas_w:
                block = attach_stacked_weights(block, blocks, i)
            im, tx = block(*carry, temb, rot, ip_kv=ipl, ip_scale=ip_scale,
                           mods=m, ff_stacked=ffs)
            if c is not None:
                im = im + c.astype(im.dtype)
            return (im, tx), None

        (img, txt), _ = jax.lax.scan(
            body, (img, txt),
            (blocks, ctrl, mods, ip, jnp.arange(n, dtype=jnp.int32)),
            unroll=getattr(self, "_scan_unroll", 1),
        )
        return img, txt

    def run_singles(self, x, temb, rot, s_txt, start=0, stop=None,
                    controlnet_single_block_samples=None):
        """Scan single blocks over the concatenated [txt; img] stream."""
        stop = self.cfg.num_single_layers if stop is None else stop
        blocks = jax.tree.map(lambda a: a[start:stop], self.single_transformer_blocks)
        ctrl = _expand_controlnet(
            controlnet_single_block_samples, self.cfg.num_single_layers
        )
        if ctrl is not None:
            ctrl = ctrl[start:stop]
        mods = None
        if getattr(self, "_hoist_mods", False) and can_batch_mod(
            self.single_transformer_blocks.norm.linear
        ):
            mods = batched_adaln_mod(
                self.single_transformer_blocks.norm.linear, temb
            )[start:stop]

        n = stop - start
        stk = (
            (blocks.mlp_fc1.qweight, blocks.mlp_fc2.qweight)
            if getattr(blocks.mlp_fc1, "precision", None) in ("int8", "w4a8") else None
        )

        pallas_w = getattr(blocks.mlp_fc1, "precision", None) in (
            "w4a8", "int4", "nvfp4"
        )

        def body(carry, layer):
            block, c, m, i = layer
            mlps = (*stk, i) if stk is not None else None
            if pallas_w:
                block = attach_stacked_weights(block, blocks, i)
            h = block(carry, temb, rot, mod=m, mlp_stacked=mlps)
            if c is not None:
                h = h.at[:, s_txt:].add(c.astype(h.dtype))
            return h, None

        x, _ = jax.lax.scan(
            body, x, (blocks, ctrl, mods, jnp.arange(n, dtype=jnp.int32)),
            unroll=getattr(self, "_scan_unroll", 1),
        )
        return x

    def head(self, img, temb):
        out = self.norm_out(img.astype(jnp.bfloat16), temb)
        return self.proj_out(out).astype(jnp.bfloat16)

    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, S_img, in_channels) packed latents
        encoder_hidden_states: jnp.ndarray,  # (B, S_txt, joint_attention_dim)
        pooled_projections: jnp.ndarray,  # (B, pooled_dim)
        timestep: jnp.ndarray,  # (B,) in [0, 1]
        img_ids: jnp.ndarray,  # (S_img, 3)
        txt_ids: jnp.ndarray,  # (S_txt, 3)
        guidance: jnp.ndarray | None = None,  # (B,)
        controlnet_block_samples: jnp.ndarray | None = None,  # (L, B, S_img, D)
        controlnet_single_block_samples: jnp.ndarray | None = None,  # (Ls, B, S, D)
    ) -> jnp.ndarray:
        img, txt, temb, rot = self.embed(
            hidden_states, encoder_hidden_states, pooled_projections,
            timestep, img_ids, txt_ids, guidance,
        )
        img, txt = self.run_dual(
            img, txt, temb, rot, controlnet_block_samples=controlnet_block_samples
        )
        s_txt = txt.shape[1]
        x = jnp.concatenate([txt, img], axis=1)  # text first (FluxModel.cpp:1306)
        x = self.run_singles(
            x, temb, rot, s_txt,
            controlnet_single_block_samples=controlnet_single_block_samples,
        )
        return self.head(x[:, s_txt:], temb)


def _expand_controlnet(samples, n_layers: int):
    """Spread controlnet residuals over layers. Reference rule
    (FluxModel.cpp:1293-1296): interval = ceil(L / n), layer i adds
    samples[i // interval] — NOT (i * n) // L, which diverges when the
    counts don't divide (L=19, n=3: layer 13 -> sample 1, not 2)."""
    if samples is None:
        return None
    n = samples.shape[0]
    interval = -(-n_layers // n)  # ceil
    idx = jnp.arange(n_layers) // interval
    return samples[idx]
