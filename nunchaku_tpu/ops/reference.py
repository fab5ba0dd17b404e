"""Pure-jnp reference implementations (oracles) of every quantized op.

These define the numerics contract that the Pallas kernels are tested
against, mirroring the CUDA kernel semantics:

  * activation quantization: per-token, per-group-of-G symmetric absmax
    (scale = absmax / 7 signed, / 15 unsigned; round-to-nearest-even)
    applied to ``x / smooth`` — reference src/kernels/zgemm/gemm_w4a4.cuh:560-660
    (quantize_w4a4_warp) and :945-1005 (EpilogueQuantize divides by the next
    layer's smooth factor before quantizing);
  * LoRA down acts on the *raw* (unsmoothed) activation with f32 accumulation —
    reference gemm_w4a4.cuh:1098-1187 (quantize_w4a4_fuse_lora_kernel);
  * W4A4 GEMM: int dot per K-group, scaled by ascale[m,g] * wscale[g,n],
    plus ``lora_act @ proj_up`` and bias — reference gemm_w4a4.cuh:832-930
    (gemm_w4a4_block) + lora.cuh (EpilogueLoraUp);
  * GELU uses the tanh approximation — reference gemm_utils.cuh:306-320;
  * the unsigned-after-GELU shift is +0.171875 — reference
    gemm_w4a4_launch_impl.cuh:286 via nunchaku/ops/fused.py:45.

Shapes use the TPU-native layouts (see core/packing.py):
  q_act   (M, K)  int8 (unpacked here; kernels use packed uint8 (M, K/2))
  ascales (M, K/G) f32
  q_wgt   (K, N)  int8
  wscales (K/G, N) f32
  smooth  (K,)
  proj_down (K, R); proj_up (R, N); bias (N,)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dtypes import E2M1_MAX, dequantize_e2m1, quantize_e2m1

GROUP_INT4 = 64
GROUP_FP4 = 16
GELU_SHIFT = 0.171875  # makes post-GELU activations non-negative (int4 only)


def group_size(precision: str) -> int:
    if precision == "int4":
        return GROUP_INT4
    if precision == "nvfp4":
        return GROUP_FP4
    if precision == "int8":
        return -1  # whole-axis group (per-token / per-channel)
    raise ValueError(f"unknown precision {precision!r}")


# ---------------------------------------------------------------------------
# Activation quantization (+ fused LoRA down)
# ---------------------------------------------------------------------------


def quantize_act(
    x: jnp.ndarray,
    smooth: jnp.ndarray | None = None,
    *,
    precision: str = "int4",
    unsigned: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize activations to 4 bit. Returns (q int8 (M,K), scales f32 (M, K/G)).

    ``x`` is divided by ``smooth`` first (SVDQuant smoothing; the inverse is
    folded into the quantized weights at calibration time).
    """
    g = group_size(precision)
    m, k = x.shape
    if g == -1:
        g = k  # int8: one per-token group
    xs = x.astype(jnp.float32)
    if smooth is not None:
        xs = xs / smooth.astype(jnp.float32)[None, :]
    grp = xs.reshape(m, k // g, g)
    absmax = jnp.max(jnp.abs(grp), axis=-1)
    if precision == "int8":
        scale = absmax / 127.0
        safe = jnp.where(scale == 0, 1.0, scale)
        q = jnp.clip(jnp.round(grp / safe[..., None]), -127, 127)
        q = jnp.where(scale[..., None] == 0, 0.0, q)
        return q.reshape(m, k).astype(jnp.int8), scale
    if precision == "int4":
        qmax = 15.0 if unsigned else 7.0
        # scales are stored in half precision (gemm_w4a4.cuh:594-610); round
        # before dividing so quantize/dequantize agree bit-for-bit
        scale = (absmax / qmax).astype(jnp.bfloat16).astype(jnp.float32)
        safe = jnp.where(scale == 0, 1.0, scale)
        q = jnp.round(grp / safe[..., None])
        q = jnp.clip(q, 0.0 if unsigned else -qmax, qmax)
        q = jnp.where(scale[..., None] == 0, 0.0, q)
        return q.reshape(m, k).astype(jnp.int8), scale
    else:  # nvfp4: e2m1 values with fp8-e4m3 scales
        scale = (absmax / E2M1_MAX).astype(jnp.float8_e4m3fn).astype(jnp.float32)
        safe = jnp.where(scale == 0, 1.0, scale)
        q = quantize_e2m1(grp / safe[..., None])
        q = jnp.where(scale[..., None] == 0, jnp.int8(0), q)
        return q.reshape(m, k).astype(jnp.int8), scale


def lora_down_act(x: jnp.ndarray, proj_down: jnp.ndarray) -> jnp.ndarray:
    """LoRA down-projection on the raw activation, f32 accumulation."""
    return jnp.dot(
        x.astype(jnp.bfloat16),
        proj_down.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def quantize_act_fuse_lora(
    x: jnp.ndarray,
    smooth: jnp.ndarray | None,
    proj_down: jnp.ndarray,
    *,
    precision: str = "int4",
    unsigned: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mirror of svdq_quantize_w4a4_act_fuse_lora (nunchaku/ops/quantize.py:11)."""
    q, scales = quantize_act(x, smooth, precision=precision, unsigned=unsigned)
    lora_act = lora_down_act(x, proj_down)
    return q, scales, lora_act


# ---------------------------------------------------------------------------
# Weight quantization (used by tests / LoRA packer; reference zgemm.h:54)
# ---------------------------------------------------------------------------


E4M3_MAX = 448.0


def quantize_weight(
    w: jnp.ndarray, *, precision: str = "int4"
) -> tuple[jnp.ndarray, jnp.ndarray, float | jnp.ndarray]:
    """Quantize a (K, N) weight per-channel per-K-group.

    Returns (q int8 (K, N), wscales f32 (K/G, N), alpha). For nvfp4, group
    scales are normalized by the per-tensor ``alpha = max|w| / (6 * 448)``
    so they occupy the representable fp8-e4m3 range (this is the role of
    the reference's ``wtscale``, nunchaku/models/linear.py:60-63); the
    stored scales are e4m3-rounded and the dequantized weight is
    ``q * wscale * alpha``. For int4, alpha is 1.0.
    """
    k, n = w.shape
    g = group_size(precision)
    if g == -1:
        g = k  # int8: per-output-channel
    grp = w.astype(jnp.float32).reshape(k // g, g, n)
    absmax = jnp.max(jnp.abs(grp), axis=1)
    if precision == "int8":
        scale = absmax / 127.0
        safe = jnp.where(scale == 0, 1.0, scale)
        q = jnp.clip(jnp.round(grp / safe[:, None, :]), -127, 127)
        q = jnp.where(scale[:, None, :] == 0, 0.0, q)
        return q.reshape(k, n).astype(jnp.int8), scale, 1.0
    if precision == "int4":
        scale = absmax / 7.0
        safe = jnp.where(scale == 0, 1.0, scale)
        q = jnp.clip(jnp.round(grp / safe[:, None, :]), -7, 7)
        q = jnp.where(scale[:, None, :] == 0, 0.0, q)
        return q.reshape(k, n).astype(jnp.int8), scale, 1.0
    else:
        alpha = jnp.max(absmax) / (E2M1_MAX * E4M3_MAX)
        scale = (
            (absmax / (E2M1_MAX * alpha)).astype(jnp.float8_e4m3fn).astype(jnp.float32)
        )
        safe = jnp.where(scale == 0, 1.0, scale * alpha)
        q = quantize_e2m1(grp / safe[:, None, :])
        q = jnp.where(scale[:, None, :] == 0, jnp.int8(0), q)
        return q.reshape(k, n).astype(jnp.int8), scale, alpha


# ---------------------------------------------------------------------------
# W4A4 GEMM
# ---------------------------------------------------------------------------


def w4a4_gemm(
    q_act: jnp.ndarray,
    ascales: jnp.ndarray,
    q_wgt: jnp.ndarray,
    wscales: jnp.ndarray,
    *,
    lora_act: jnp.ndarray | None = None,
    proj_up: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    precision: str = "int4",
    alpha: float | None = None,
    wcscales: jnp.ndarray | None = None,
    exact_int_dot: bool = True,
) -> jnp.ndarray:
    """Reference W4A4 GEMM: returns f32 (M, N).

    ``exact_int_dot=True`` reproduces the CUDA integer-MMA semantics (exact
    int32 dot per group, scales applied after). ``False`` matches the Pallas
    kernel formulation (dequantize both sides to bf16, one big matmul) for
    tight kernel tests.
    """
    m, k = q_act.shape
    n = q_wgt.shape[1]
    g = k // ascales.shape[1]
    if exact_int_dot:
        if precision in ("int4", "int8"):
            a = q_act.reshape(m, k // g, g).astype(jnp.int32)
            w = q_wgt.reshape(k // g, g, n).astype(jnp.int32)
            d = jnp.einsum("mgk,gkn->gmn", a, w).astype(jnp.float32)  # exact int32
        else:
            # e2m1 values and their pairwise products are exact in f32.
            a = dequantize_e2m1(q_act).reshape(m, k // g, g)
            w = dequantize_e2m1(q_wgt).reshape(k // g, g, n)
            d = jnp.einsum("mgk,gkn->gmn", a, w)
        out = jnp.einsum(
            "gmn,mg,gn->mn", d, ascales.astype(jnp.float32), wscales.astype(jnp.float32)
        )
    else:
        a = dequantize_act(q_act, ascales, precision=precision)
        w = dequantize_wgt(q_wgt, wscales, precision=precision)
        out = jnp.dot(a, w, preferred_element_type=jnp.float32)
    if precision == "nvfp4" and alpha is not None:
        out = out * jnp.float32(alpha)
    if wcscales is not None:
        out = out * wcscales.astype(jnp.float32)[None, :]
    if lora_act is not None and proj_up is not None:
        out = out + jnp.dot(
            lora_act.astype(jnp.float32).astype(jnp.bfloat16),
            proj_up.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out


def dequantize_act(q_act, ascales, *, precision="int4"):
    m, k = q_act.shape
    g = k // ascales.shape[1]
    if precision == "nvfp4":
        vals = dequantize_e2m1(q_act).reshape(m, k // g, g)
    else:
        vals = q_act.reshape(m, k // g, g).astype(jnp.float32)
    deq = vals * ascales.astype(jnp.float32)[:, :, None]
    return deq.reshape(m, k).astype(jnp.bfloat16)


def dequantize_wgt(q_wgt, wscales, *, precision="int4"):
    k, n = q_wgt.shape
    g = k // wscales.shape[0]
    if precision == "nvfp4":
        vals = dequantize_e2m1(q_wgt).reshape(k // g, g, n)
    else:
        vals = q_wgt.reshape(k // g, g, n).astype(jnp.float32)
    deq = vals * wscales.astype(jnp.float32)[:, None, :]
    return deq.reshape(k, n).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Epilogues
# ---------------------------------------------------------------------------


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximated GELU (reference gemm_utils.cuh:306)."""
    return jax.nn.gelu(x, approximate=True)


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray | None, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out


def apply_rope(x: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Apply interleaved rotary embedding.

    x: (..., S, D); rot: (S, D/2, 2) with [..., 0]=cos, [..., 1]=sin
    (FLUX convention: pairs (x0, x1) -> (x0*cos - x1*sin, x0*sin + x1*cos)).
    """
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // 2, 2)
    cos = rot[..., 0]
    sin = rot[..., 1]
    x0, x1 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.reshape(shape)
