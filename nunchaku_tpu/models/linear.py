"""Quantized linear layers (TPU layouts, Pallas hot path).

Counterparts of the reference's nunchaku/models/linear.py:
  * SVDQW4A4Linear (:13)  — W4A4 SVDQuant linear with rank-r SVD branch
  * AWQW4A16Linear (:277) — weight-only 4-bit linear (AdaLN modulation)

plus conveniences the reference does not have: ``from_weights`` quantizes a
bf16 weight on the fly (randomized SVD + absmax grouping) so any bf16
checkpoint can be served 4-bit without a pre-quantized artifact.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.module import Module
from ..core.packing import pack_int4
from ..ops import reference as R
from ..ops.gemm import svdq_gemm_w4a4
from ..ops.gemv import awq_w4a16_linear
from ..ops.quantize import quantize_w4a4_act_fuse_lora

PAD_TOKENS = 256  # batch padding quantum (reference pads M to 256, Linear.cpp:445)


# int8 activations quantize through the Pallas one-read producer
# (ops/quantize.ln_mod_quant_int8 with apply_ln=False) instead of the
# XLA multi-pass chain. In-model A/B (tools/ablate_pallas_quant.py):
# NEUTRAL (360.5 vs 360.6 ms/step) — XLA already fuses/overlaps the
# standalone quantizes well, so the default stays off; the fused
# LN+modulate producer (FUSED_LN_QUANT, -8 ms) is where the win was.
PALLAS_QUANT_INT8 = False


def _batched_b1() -> bool:
    """NUNCHAKU_TPU_BATCHED_B1=1: route B=1 through the native-3D operand
    path too (A/B probe: does the B=1 step also pay flatten-adjacent layout
    moves at the Pallas boundaries? ~18 ms/step of XLA 'copy' ops sit in
    the round-2 budget unattributed)."""
    import os

    return os.environ.get("NUNCHAKU_TPU_BATCHED_B1", "0") == "1"


def set_pallas_quant_int8(enabled: bool) -> None:
    global PALLAS_QUANT_INT8
    PALLAS_QUANT_INT8 = bool(enabled)


def pad_rows(x: jnp.ndarray, multiple: int = PAD_TOKENS) -> jnp.ndarray:
    m = x.shape[0]
    pad = (-m) % multiple
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad), (0, 0)))


class Linear(Module):
    """Plain bf16 linear, weight stored (K, N)."""

    def __init__(self, weight: jnp.ndarray, bias: jnp.ndarray | None = None):
        self.weight = weight
        self.bias = bias

    @classmethod
    def random_init(cls, key, in_features, out_features, bias=True, dtype=jnp.bfloat16):
        k1, k2 = jax.random.split(key)
        std = 1.0 / math.sqrt(in_features)
        w = jax.random.normal(k1, (in_features, out_features), dtype) * std
        b = jax.random.normal(k2, (out_features,), dtype) * 0.02 if bias else None
        return cls(w, b)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = jnp.dot(
            x.astype(jnp.bfloat16),
            self.weight.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        if self.bias is not None:
            out = out + self.bias.astype(jnp.float32)
        return out.astype(x.dtype)


class SVDQW4A4Linear(Module):
    """SVDQuant W4A4 linear.

    Parameters (TPU layouts):
      qweight   (K/2, N) int8   — packed 4-bit residual weight
      wscales   (K/G, N) bf16   — per-group scales (nvfp4: alpha/wcscales folded)
      smooth    (K,)     bf16   — activation smoothing factor
      proj_down (K, R)   bf16   — SVD low-rank down
      proj_up   (R, N)   bf16   — SVD low-rank up
      bias      (N,)     bf16 or None
    """

    def __init__(
        self,
        qweight,
        wscales,
        smooth,
        proj_down,
        proj_up,
        bias=None,
        rescales=None,  # w4a8: (K/G, N) int4->per-channel-int8 rescale factors
        *,
        precision: str = "int4",
        act_unsigned: bool = False,
        wcodes: str = "int4",  # w4a8 nibble format: "int4" | "e2m1" (nvfp4-a8)
    ):
        self.qweight = qweight
        self.wscales = wscales
        self.smooth = smooth
        self.proj_down = proj_down
        self.proj_up = proj_up
        self.bias = bias
        self.rescales = rescales
        self.precision = precision
        self.act_unsigned = act_unsigned
        self.wcodes = wcodes
        self.in_features = qweight.shape[0] * (1 if precision == "int8" else 2)
        if precision == "w4a8":
            self.in_features = qweight.shape[0] * 2
        self.out_features = qweight.shape[1]
        self.rank = proj_down.shape[1]
        # logical (unpadded) dims; kernels require K%256 == 0 and N%128 == 0,
        # odd-dim models (SANA 2240, ...) zero-pad weights at build time
        self.logical_in = self.in_features
        self.logical_out = self.out_features

    # -- constructors --------------------------------------------------------
    @classmethod
    def random_init(
        cls,
        key,
        in_features,
        out_features,
        rank=32,
        bias=True,
        precision="int4",
        act_unsigned=False,
    ):
        ks = jax.random.split(key, 5)
        std = 1.0 / math.sqrt(in_features)
        rescales = None
        wcodes = "int4"
        # Kernel-legal padded buffer dims (same contract as from_weights):
        # odd-dim models (SANA 2240, SDXL 640/960, ...) zero-pad K->256 and
        # N->128 multiples at build time; __call__ pads input columns and
        # slices the output back to logical_out.
        k_log, n_log = in_features, out_features
        in_features += (-in_features) % 256
        out_features += (-out_features) % 128
        pad_k = in_features - k_log

        def _packed_codes(kk):
            # padded K rows must hold ZERO codes (not random bytes): the
            # activation padding only guarantees zero *codes* on its side,
            # and act_unsigned's GELU shift makes padded act codes nonzero
            if pad_k:
                codes = jax.random.randint(kk, (k_log, out_features), -8, 8, jnp.int8)
                return pack_int4(jnp.pad(codes, ((0, pad_k), (0, 0))), axis=0)
            return jax.random.randint(kk, (in_features // 2, out_features), -128, 128, jnp.int8)

        if precision == "int8":
            qw = jax.random.randint(ks[0], (k_log, out_features), -128, 128, jnp.int8)
            qw = jnp.pad(qw, ((0, pad_k), (0, 0)))
            ws = (jnp.abs(jax.random.normal(ks[1], (1, out_features))) * std / 127).astype(jnp.float32)
        elif precision in ("w4a8", "nvfp4-a8"):
            # "nvfp4-a8": e2m1-coded w4a8 (module precision stays "w4a8",
            # wcodes="e2m1", group-16 rescales) — the nvfp4 serving mode
            g = R.GROUP_INT4 if precision == "w4a8" else R.GROUP_FP4
            wcodes = "int4" if precision == "w4a8" else "e2m1"
            qw = _packed_codes(ks[0])
            ws = (jnp.abs(jax.random.normal(ks[1], (1, out_features))) * std / 127).astype(jnp.float32)
            rescales = jax.random.uniform(
                ks[1], (in_features // g, out_features), jnp.bfloat16, 1.0,
                127.0 / (7.0 if precision == "w4a8" else 6.0),
            )
            precision = "w4a8"
        else:
            g = R.group_size(precision)
            qw = _packed_codes(ks[0])
            ws = (jnp.abs(jax.random.normal(ks[1], (in_features // g, out_features))) * std / 7).astype(jnp.bfloat16)
        smooth = jnp.ones((in_features,), jnp.bfloat16)
        pd = jax.random.normal(ks[2], (k_log, rank), jnp.bfloat16) * 0.02
        pd = jnp.pad(pd, ((0, pad_k), (0, 0)))
        pu = jax.random.normal(ks[3], (rank, out_features), jnp.bfloat16) * 0.02
        b = jax.random.normal(ks[4], (out_features,), jnp.bfloat16) * 0.02 if bias else None
        out = cls(qw, ws, smooth, pd, pu, b, rescales=rescales,
                  precision=precision, act_unsigned=act_unsigned,
                  wcodes=wcodes)
        out.logical_in = k_log
        out.logical_out = n_log
        return out

    @classmethod
    def from_weights(
        cls,
        weight: jnp.ndarray,
        bias: jnp.ndarray | None = None,
        *,
        rank: int = 32,
        precision: str = "int4",
        act_unsigned: bool = False,
        key=None,
        power_iters: int = 2,
    ):
        """Quantize a bf16 (K, N) weight: rank-r randomized SVD branch +
        4-bit group-quantized residual. Smooth factor defaults to ones
        (calibration-free path). Odd dims are zero-padded (K->256, N->128
        multiples) and sliced back at call time."""
        k_log, n_log = weight.shape
        kp, np_ = (-k_log) % 256, (-n_log) % 128
        if kp or np_:
            weight = jnp.pad(weight, ((0, kp), (0, np_)))
            if bias is not None:
                bias = jnp.pad(bias, (0, np_))
        k_dim, n = weight.shape
        if key is None:
            key = jax.random.PRNGKey(0)
        w32 = weight.astype(jnp.float32)
        # randomized SVD: range finding on W with a few power iterations
        p = min(rank + 8, min(k_dim, n))
        g = jax.random.normal(key, (n, p), jnp.float32)
        y = w32 @ g
        for _ in range(power_iters):
            y, _ = jnp.linalg.qr(y)
            y = w32 @ (w32.T @ y)
        q, _ = jnp.linalg.qr(y)  # (K, p)
        b_small = q.T @ w32  # (p, N)
        u, s, vt = jnp.linalg.svd(b_small, full_matrices=False)
        pd = (q @ u[:, :rank]) * s[:rank][None, :]  # (K, r)
        pu = vt[:rank]  # (r, N)
        resid = w32 - pd @ pu
        if precision == "w4a8":
            # int4 storage, int8 MXU: per-64-group int4 quantization plus
            # in-kernel rescale to per-channel int8 (ops/gemm.py w4a8 path)
            qw, ws, _ = R.quantize_weight(resid, precision="int4")
            s8 = jnp.max(ws, axis=0) * 7.0 / 127.0  # (N,)
            s8 = jnp.where(s8 == 0, 1.0, s8)
            rs = ws / s8[None, :]
            out = cls(
                pack_int4(qw, axis=0),
                s8.reshape(1, n).astype(jnp.float32),
                jnp.ones((k_dim,), jnp.bfloat16),
                pd.astype(jnp.bfloat16),
                pu.astype(jnp.bfloat16),
                None if bias is None else bias.astype(jnp.bfloat16),
                rescales=rs.astype(jnp.bfloat16),
                precision="w4a8",
            )
            out.logical_in = k_log
            out.logical_out = n_log
            return out
        qw, ws, alpha = R.quantize_weight(resid, precision=precision)
        if precision == "nvfp4":
            ws = ws * alpha
        if precision == "int8":
            out = cls(
                qw,
                ws.astype(jnp.float32),
                jnp.ones((k_dim,), jnp.bfloat16),
                pd.astype(jnp.bfloat16),
                pu.astype(jnp.bfloat16),
                None if bias is None else bias.astype(jnp.bfloat16),
                precision=precision,
                act_unsigned=False,
            )
        else:
            out = cls(
                pack_int4(qw, axis=0),
                ws.astype(jnp.bfloat16),
                jnp.ones((k_dim,), jnp.bfloat16),
                pd.astype(jnp.bfloat16),
                pu.astype(jnp.bfloat16),
                None if bias is None else bias.astype(jnp.bfloat16),
                precision=precision,
                act_unsigned=act_unsigned,
            )
        out.logical_in = k_log
        out.logical_out = n_log
        return out

    # -- forward -------------------------------------------------------------
    def quantize(self, x2d: jnp.ndarray):
        """(M, K) -> (qact, ascales_t, lora_act), M padded to 256 (tiny
        modulation-style batches pad to 8 so the GEMM stays bandwidth-bound)."""
        x2d = pad_rows(x2d, 8 if x2d.shape[0] <= 8 else PAD_TOKENS)
        return quantize_w4a4_act_fuse_lora(
            x2d,
            self.proj_down,
            self.smooth,
            precision=self.precision,
            act_unsigned=self.act_unsigned,
        )

    def forward_quant(self, qact, ascales_t, lora_act,
                      qweight=None, layer_idx=None, skip_lora=False,
                      residual=None):
        # qweight/layer_idx: stacked (L, K, N) weights + scan layer index —
        # the kernel reads the layer's tiles via scalar prefetch instead of
        # XLA materializing a per-block dynamic-slice copy (ops/gemm.py).
        # Defaults from attach_stacked_weights() when not passed explicitly.
        # skip_lora: omit the low-rank epilogue — the caller adds
        # lora_act @ proj_up itself (e.g. fused into the qkv/rope producer,
        # ops/attention.qkv_rope_producer lora operands).
        if qweight is None and layer_idx is None:
            qweight = getattr(self, "_stacked_qweight", None)
            if qweight is not None:
                layer_idx = self._layer_idx
        return svdq_gemm_w4a4(
            qact,
            ascales_t,
            self.qweight if qweight is None else qweight,
            self.wscales,
            None if skip_lora else lora_act,
            None if skip_lora else self.proj_up,
            self.bias,
            self.rescales,
            precision=self.precision,
            act_unsigned=self.act_unsigned,
            layer_idx=layer_idx,
            residual=residual,
            wcodes=self.wcodes,
        )

    def forward_parts(self, x: jnp.ndarray):
        """Like ``__call__`` but skips the low-rank epilogue and returns
        ``(out_without_lora, lora_act)`` so the caller can fuse the lora
        add downstream (e.g. into the chain consumer's gated-residual
        epilogue, ops/gemm.svdq_gemm_w4a4 residual operands)."""
        lead = x.shape[:-1]
        m = math.prod(lead)
        kp = self.qweight.shape[0] * (1 if self.precision == "int8" else 2)
        if x.ndim == 3 and (x.shape[0] > 1 or _batched_b1()):
            b, s, k = x.shape
            if k < kp:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, kp - k)))
            q, a, la = jax.vmap(self.quantize)(x)
            out = self.forward_quant(q, a, la, skip_lora=True)
            if self.logical_out < out.shape[-1]:
                out = out[..., : self.logical_out]
            return out[:, :s], la[:, :s]
        x2d = x.reshape(m, x.shape[-1])
        if x2d.shape[-1] < kp:
            x2d = jnp.pad(x2d, ((0, 0), (0, kp - x2d.shape[-1])))
        q, a, la = self.quantize(x2d)
        out = self.forward_quant(q, a, la, skip_lora=True)
        if self.logical_out < out.shape[-1]:
            out = out[:, : self.logical_out]
        return (out[:m].reshape(*lead, out.shape[-1]),
                la[:m].reshape(*lead, la.shape[-1]))

    def forward_modulated(self, x: jnp.ndarray, scale: jnp.ndarray,
                          shift: jnp.ndarray, skip_lora: bool = False):
        """``LN(x) * (1 + scale) + shift`` -> this linear, with the fused
        Pallas producer on the int8 path (ln_mod_quant_int8: one HBM read
        replaces the XLA LN / modulate / quantize passes; standalone A/B
        9.3 -> 1.6 ms at FLUX img shapes). x is (B, S, K); scale/shift
        (B, K) AdaLN vectors pre-adjusted for (1 + scale).

        skip_lora: return ``(out_without_lora, lora_act (B, S, R))`` so the
        caller can fuse the low-rank add downstream (the qkv/rope producer
        takes it as an operand — skipping the GEMM-side epilogue kills
        XLA's full-width lora round-trip fusion)."""
        b, s, k = x.shape
        bm = next((c for c in (512, 384, 256, 128, 64, 32, 16, 8) if s % c == 0), None)
        from ..ops.gemm import _w4a8_use_xla

        if (
            # int8, or w4a8 on the XLA dequant+dot route (both consume
            # per-token int8 acts). The legacy Pallas w4a8 GEMM measured
            # +13 ms/step when fed Pallas-produced qact — keep it off there.
            (self.precision == "int8"
             or (self.precision == "w4a8" and _w4a8_use_xla(0, 0, 0)))
            and not self.act_unsigned
            and bm is not None
            and k == self.in_features
        ):
            from ..ops.quantize import ln_mod_quant_int8

            # B>1: keep (B, S, ·) through producer + GEMM — flattening a
            # Pallas result at B>1 forces XLA layout copies (bench_batch.py)
            flat = b == 1 and not _batched_b1()
            q, asc, la = ln_mod_quant_int8(
                x.astype(jnp.bfloat16), scale, shift, self.smooth,
                self.proj_down, bm=bm, flatten=flat,
            )
            out = self.forward_quant(q, asc, la, skip_lora=skip_lora)
            if self.logical_out < out.shape[-1]:
                out = out[..., : self.logical_out]
            out = out.reshape(b, s, -1) if flat else out
            if skip_lora:
                return out, la.reshape(b, s, -1) if flat else la
            return out
        if self.precision in ("int8", "w4a8") and not self.act_unsigned:
            from ..utils.warn import warn_once

            warn_once(
                "ln_mod_quant_fallback",
                f"fused LN+modulate+quantize producer unavailable for"
                f" S={s}, K={k} (needs an S tile divisor and K =="
                f" in_features={self.in_features}); falling back to the"
                " multi-pass XLA LN/modulate/quantize chain",
            )
        from .normalization import layer_norm

        y = (
            layer_norm(x) * (1.0 + scale.astype(jnp.float32))[:, None]
            + shift.astype(jnp.float32)[:, None]
        )
        out = self(y.astype(jnp.bfloat16))
        if skip_lora:
            # fallback path keeps lora inside the GEMM; None tells the
            # caller not to add it again
            return out, None
        return out

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        lead = x.shape[:-1]
        m = math.prod(lead)
        if (
            PALLAS_QUANT_INT8
            and self.precision == "int8"
            and x.ndim == 3
            and x.shape[-1] == self.in_features
        ):
            b, s, k = x.shape
            bm = next(
                (c for c in (512, 384, 256, 128, 64, 32, 16, 8) if s % c == 0),
                None,
            )
            if bm is not None:
                from ..ops.quantize import ln_mod_quant_int8

                q, asc, la = ln_mod_quant_int8(
                    x.astype(jnp.bfloat16), None, None, self.smooth,
                    self.proj_down, bm=bm, apply_ln=False,
                )
                out = self.forward_quant(q, asc, la)
                if self.logical_out < out.shape[-1]:
                    out = out[:, : self.logical_out]
                return out.reshape(b, s, -1)
        # runtime shapes, not self.in/out_features: under shard_map the
        # arrays are local shards of tensor-parallel weights
        kp = self.qweight.shape[0] * (1 if self.precision == "int8" else 2)
        if self.precision == "w4a8":
            kp = self.qweight.shape[0] * 2
        if x.ndim == 3 and (x.shape[0] > 1 or _batched_b1()):
            # B>1: batched (B, S, ·) end to end — flattening next to the
            # Pallas custom calls forces XLA layout copies at B>1
            # (tools/bench_batch.py); quantize vmaps per batch row, the
            # GEMM consumes the 3D operands natively
            b, s, k = x.shape
            if k < kp:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, kp - k)))
            out = self.forward_quant(*jax.vmap(self.quantize)(x))
            if self.logical_out < out.shape[-1]:
                out = out[..., : self.logical_out]
            return out[:, :s]
        x2d = x.reshape(m, x.shape[-1])
        if x2d.shape[-1] < kp:  # odd-dim model: zero-pad input columns
            x2d = jnp.pad(x2d, ((0, 0), (0, kp - x2d.shape[-1])))
        out = self.forward_quant(*self.quantize(x2d))
        if self.logical_out < out.shape[-1]:
            out = out[:, : self.logical_out]
        # always bf16 out: residual streams carry f32, compute rides bf16
        return out[:m].reshape(*lead, out.shape[-1])


class DualStreamLinear(Module):
    """One GEMM for a txt/img pair of int8 SVDQ linears over the joint
    [txt; img] row concat.

    The FLUX dual block runs every projection twice — a (512, K, N) txt
    GEMM and a (4096, K, N) img GEMM. The M=512 GEMMs carry a ~0.8-3 ms
    fixed cost per call on v5e (MXU weight-load dominated at small M; both
    the XLA and Pallas int8 paths hit it — tools/probe_m512_matrix.py), so
    the dual-stream standalone GEMMs cost >100 ms of a ~390 ms FLUX step.
    Merging N-concatenates the two weight matrices and runs ONE (4608, K,
    2N) GEMM over the joint rows; each row keeps its own stream's half via
    a select. 2x the MACs, but one well-shaped GEMM instead of two calls.

    No weight requantization is needed: each row's int8 codes already
    carry its own stream's smooth factor, and the weights stay exactly as
    loaded — txt rows select the txt-weight half, img rows the img half.
    The low-rank branches stay separated by a block-diagonal proj_up, and
    per-stream biases ride their own N-half.
    """

    def __init__(self, lin_a: "SVDQW4A4Linear", lin_b: "SVDQW4A4Linear"):
        if not (lin_a.precision == lin_b.precision == "int8"):
            raise ValueError("DualStreamLinear supports the int8 turbo path")
        if lin_a.qweight.shape != lin_b.qweight.shape:
            raise ValueError("stream pair must have identical shapes")
        cat = lambda a, b: jnp.concatenate([a, b], axis=-1)
        self.qweight = cat(lin_a.qweight, lin_b.qweight)
        self.wscales = cat(lin_a.wscales, lin_b.wscales)
        pu_a, pu_b = lin_a.proj_up, lin_b.proj_up
        za = jnp.zeros_like(pu_a)
        zb = jnp.zeros_like(pu_b)
        # block-diag (R_a+R_b, N_a+N_b): stream a's rank rows feed only the
        # a-half columns (leading stacked axes broadcast through)
        self.proj_up = jnp.concatenate(
            [cat(pu_a, za), cat(zb, pu_b)], axis=-2
        )
        if (lin_a.bias is None) != (lin_b.bias is None):
            raise ValueError("stream pair bias mismatch")
        self.bias = None if lin_a.bias is None else cat(lin_a.bias, lin_b.bias)
        self.smooth_a = lin_a.smooth
        self.pd_a = lin_a.proj_down
        self.smooth_b = lin_b.smooth
        self.pd_b = lin_b.proj_down
        self.n_half = lin_a.out_features
        self.rank_a = lin_a.rank
        self.precision = "int8"

    def __call__(self, xa: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
        """xa (B, Sa, K), xb (B, Sb, K) -> joint (B, Sa+Sb, N): rows < Sa
        are stream a's projection, the rest stream b's."""
        b, sa, k = xa.shape
        sb = xb.shape[1]
        sj = sa + sb
        n = self.n_half

        qa, sca, laa = quantize_w4a4_act_fuse_lora(
            xa.reshape(b * sa, k), self.pd_a, self.smooth_a, precision="int8"
        )
        qb, scb, lab = quantize_w4a4_act_fuse_lora(
            xb.reshape(b * sb, k), self.pd_b, self.smooth_b, precision="int8"
        )
        # quantize pads rows; slice back before the per-batch concat
        qa, sca, laa = qa[: b * sa], sca[:, : b * sa], laa[: b * sa]
        qb, scb, lab = qb[: b * sb], scb[:, : b * sb], lab[: b * sb]

        qcat = jnp.concatenate(
            [qa.reshape(b, sa, k), qb.reshape(b, sb, k)], axis=1
        ).reshape(b * sj, k)
        sccat = jnp.concatenate(
            [sca.reshape(b, sa), scb.reshape(b, sb)], axis=1
        ).reshape(1, b * sj)
        ra, rb = laa.shape[-1], lab.shape[-1]
        laa_f = jnp.pad(laa.reshape(b, sa, ra), ((0, 0), (0, 0), (0, rb)))
        lab_f = jnp.pad(lab.reshape(b, sb, rb), ((0, 0), (0, 0), (ra, 0)))
        lacat = jnp.concatenate([laa_f, lab_f], axis=1).reshape(b * sj, ra + rb)

        pad = (-(b * sj)) % PAD_TOKENS
        if pad:
            qcat = jnp.pad(qcat, ((0, pad), (0, 0)))
            sccat = jnp.pad(sccat, ((0, 0), (0, pad)))
            lacat = jnp.pad(lacat, ((0, pad), (0, 0)))

        out = svdq_gemm_w4a4(
            qcat, sccat, self.qweight, self.wscales, lacat, self.proj_up,
            self.bias, precision="int8",
        )[: b * sj].reshape(b, sj, 2 * n)
        row_a = (jnp.arange(sj) < sa)[None, :, None]
        return jnp.where(row_a, out[..., :n], out[..., n:])


class AWQW4A16Linear(Module):
    """Weight-only 4-bit linear (AWQ-style) for small-M modulation layers.

    Parameters:
      qweight (K/2, N) int8 — packed 4-bit codes (unsigned 0..15)
      wscales (K/G, N) bf16
      wzeros  (K/G, N) bf16 — pre-scaled zero points; w = q * s - z
      bias    (N,) or None
    """

    def __init__(self, qweight, wscales, wzeros, bias=None, *, group_size: int = 64):
        self.qweight = qweight
        self.wscales = wscales
        self.wzeros = wzeros
        self.bias = bias
        self.group_size = group_size
        self.in_features = qweight.shape[0] * 2
        self.out_features = qweight.shape[1]
        # optional low-rank side branch (LoRA on the modulation linears;
        # reference GEMV_AWQ lora_down/lora_up, src/Linear.cpp:25-57)
        self.lora_down = None  # (K, r) bf16
        self.lora_up = None  # (r, N) bf16

    @classmethod
    def from_weights(cls, weight: jnp.ndarray, bias=None, *, group_size: int = 64):
        """Asymmetric 4-bit groupwise quantization of a (K, N) weight."""
        k_dim, n = weight.shape
        w = weight.astype(jnp.float32).reshape(k_dim // group_size, group_size, n)
        wmax = jnp.max(w, axis=1)
        wmin = jnp.min(w, axis=1)
        scale = (wmax - wmin) / 15.0
        safe = jnp.where(scale == 0, 1.0, scale)
        q = jnp.clip(jnp.round((w - wmin[:, None, :]) / safe[:, None, :]), 0, 15)
        zeros = -wmin  # w = q * s - z  with z = -wmin
        return cls(
            pack_int4(q.reshape(k_dim, n).astype(jnp.int8), axis=0),
            scale.astype(jnp.bfloat16),
            zeros.astype(jnp.bfloat16),
            None if bias is None else bias.astype(jnp.bfloat16),
            group_size=group_size,
        )

    @classmethod
    def random_init(cls, key, in_features, out_features, bias=True, group_size=64):
        ks = jax.random.split(key, 4)
        std = 1.0 / math.sqrt(in_features)
        qw = jax.random.randint(ks[0], (in_features // 2, out_features), -128, 128, jnp.int8)
        ws = (jnp.abs(jax.random.normal(ks[1], (in_features // group_size, out_features))) * std / 8).astype(jnp.bfloat16)
        wz = (jax.random.normal(ks[2], (in_features // group_size, out_features)) * std).astype(jnp.bfloat16)
        b = jax.random.normal(ks[3], (out_features,), jnp.bfloat16) * 0.02 if bias else None
        return cls(qw, ws, wz, b, group_size=group_size)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.gemv import AWQ_XLA_MIN_M, awq_w4a16_linear_xla

        lead = x.shape[:-1]
        m = math.prod(lead)
        x2d = x.reshape(m, x.shape[-1])
        # M-routed like the reference (gemv at batch < 8, gemm_awq above,
        # text_encoders/linear.py:128-142): the Pallas kernel's VPU decode
        # is M-independent and dominates encoder-shaped calls — the XLA
        # dequant+MXU route took the T5-XXL 512-token encode 2.07 s -> see
        # ops/gemv.py awq_w4a16_linear_xla
        fwd = awq_w4a16_linear if m < AWQ_XLA_MIN_M else awq_w4a16_linear_xla
        out = fwd(
            x2d,
            self.qweight,
            self.wscales,
            self.wzeros,
            self.bias,
            group_size=self.group_size,
        )
        if self.lora_down is not None:
            la = jnp.dot(
                x2d.astype(jnp.bfloat16),
                self.lora_down.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            out = out + jnp.dot(
                la.astype(jnp.bfloat16),
                self.lora_up.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        return out.reshape(*lead, out.shape[-1]).astype(x.dtype)


def attach_stacked_weights(block, stacked_block, layer_idx):
    """Inside a ``lax.scan`` over stacked blocks: point every 4-bit Pallas
    linear of the per-layer ``block`` at the full (L, ...) qweight stack of
    ``stacked_block`` plus the scan layer index, so the GEMM kernels read
    the layer's weight tiles via scalar prefetch instead of XLA
    materializing a dynamic-slice copy of each packed weight every block
    (ops/gemm.py stacked mode; measured ~10 ms/step at FLUX 1024px int8).
    int8 linears are skipped — their standalone GEMMs run as XLA dots,
    which fuse the slice for free (the int8 fc1->fc2 chain pair is
    threaded explicitly via ``gelu_mlp(stacked=...)``).
    """
    stk = dict(stacked_block.modules())
    for name, mod in block.modules():
        if (
            isinstance(mod, SVDQW4A4Linear)
            and mod.precision in ("w4a8", "int4", "nvfp4")
        ):
            mod._stacked_qweight = stk[name].qweight
            mod._layer_idx = layer_idx
    return block
