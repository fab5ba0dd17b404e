"""On-the-fly activation quantization (+ fused LoRA down-projection).

TPU-native counterpart of the reference's ``quantize_w4a4_act_fuse_lora``
CUDA kernel (src/kernels/zgemm/gemm_w4a4.cuh:1098-1187 and Python wrapper
nunchaku/ops/quantize.py:11): divides by the SVDQuant smooth factor,
quantizes per-token per-group (G=64 int4 absmax/7, G=16 nvfp4 e2m1 with
e4m3 scales), packs two nibbles per byte, and computes the low-rank branch
``lora_act = x @ proj_down`` on the *raw* activation with f32 accumulation.

This op is bandwidth-bound and reshape/reduction-heavy (64-minor group
reductions that Mosaic cannot lower today), so it runs as straight XLA —
the reductions, rounding, and nibble packing all fuse into one pass over
the activation; the lora matmul rides the MXU. The packed-int4 output is
what keeps the downstream Pallas GEMM HBM traffic at 4 bits.

Output layouts (canonical for nunchaku_tpu kernels):
  qact    (M, K/2)  int8  — block-split-half packed (core/packing.py)
  ascales (K/G, M)  bf16  — token-minor, like the reference's [K//G, M]
  lora_act (M, R)   f32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.dtypes import E2M1_MAX
from ..core.packing import pack_int4
from .reference import GROUP_FP4, GROUP_INT4, GELU_SHIFT


@functools.partial(
    jax.jit, static_argnames=("precision", "act_unsigned", "fuse_glu", "glu_act")
)
def quantize_w4a4_act_fuse_lora(
    x: jnp.ndarray,
    proj_down: jnp.ndarray,
    smooth: jnp.ndarray | None = None,
    *,
    precision: str = "int4",
    act_unsigned: bool = False,
    fuse_glu: bool = False,
    glu_act: str = "silu",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantize (M, K) activations; return (qact, ascales_t, lora_act).

    ``fuse_glu`` mirrors the reference's GLU fusion: the input is (M, 2K)
    laid out [value, gate] and the quantized value is ``value * act(gate)``
    (SANA GLUMBConv / Z-Image SwiGLU use silu; SDXL's GEGLU uses gelu —
    ``glu_act`` selects, matching diffusers' SwiGLU/GEGLU chunk order).
    """
    if fuse_glu:
        # diffusers GLUMBConv convention: value = x1 * act(x2) over split
        # halves (the reference kernel uses interleaved pairs,
        # gemm_base.cuh:622 — its converter pre-interleaves the weights;
        # ours keeps half-split and reorders at load instead)
        k2 = x.shape[-1] // 2
        hidden, gate = x[..., :k2], x[..., k2:]
        gf = gate.astype(jnp.float32)
        act = jax.nn.silu(gf) if glu_act == "silu" else jax.nn.gelu(gf, approximate=True)
        x = (hidden.astype(jnp.float32) * act).astype(x.dtype)

    m, k = x.shape
    lora_act = jnp.dot(
        x.astype(jnp.bfloat16),
        proj_down.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    # Per-element work uses multiplies only: a VPU divide costs ~20 cycles
    # and this op is VPU-bound at model shapes (per-element divides measured
    # 18 GB/s effective); reciprocals are computed on the tiny scale vectors.
    xs = x.astype(jnp.float32)
    if act_unsigned:
        xs = xs + GELU_SHIFT
    if smooth is not None:
        sm = smooth.astype(jnp.float32)
        rsmooth = jnp.where(sm == 0, 1.0, 1.0 / jnp.where(sm == 0, 1.0, sm))
        xs = xs * rsmooth[None, :]  # (K,) reciprocal, negligible

    def _rcp(scale):
        return jnp.where(scale == 0, 0.0, 1.0 / jnp.where(scale == 0, 1.0, scale))

    if precision in ("int8", "w4a8"):
        # turbo path: per-token int8 (the reference's quantize_w8a8_act,
        # zgemm.h:54-63, with per-token scales); no packing, scale (1, M)
        absmax = jnp.max(jnp.abs(xs), axis=-1)
        scale = absmax / 127.0
        q = jnp.clip(jnp.round(xs * _rcp(scale)[:, None]), -127, 127).astype(jnp.int8)
        return q, scale.reshape(1, m), lora_act

    g = GROUP_INT4 if precision == "int4" else GROUP_FP4
    grp = xs.reshape(m, k // g, g)
    absmax = jnp.max(jnp.abs(grp), axis=-1)

    if precision == "int4":
        qmax = 15.0 if act_unsigned else 7.0
        # round the scale to its bf16 storage precision *before* dividing so
        # quantize and dequantize use the identical scale (the reference
        # computes/stores half-precision scales, gemm_w4a4.cuh:594-610)
        scale = (absmax / qmax).astype(jnp.bfloat16).astype(jnp.float32)
        q = jnp.round(grp * _rcp(scale)[..., None])
        q = jnp.clip(q, 0.0 if act_unsigned else -qmax, qmax).astype(jnp.int8)
    else:
        scale = (absmax / E2M1_MAX).astype(jnp.float8_e4m3fn).astype(jnp.float32)
        v = grp * _rcp(scale)[..., None]
        # e2m1 round-to-nearest-even (arithmetic form): snap |v| to the grid
        # {0, .5, 1, 1.5, 2, 3, 4, 6}, whose spacing is 2^(e-1) with
        # e = clip(floor(log2|v|), 0, 2) (subnormals share the 0.5 spacing).
        av = jnp.clip(jnp.abs(v), 0.0, E2M1_MAX)
        e = jnp.clip(jnp.floor(jnp.log2(jnp.maximum(av, 1.0))), 0.0, 2.0)
        step = jnp.exp2(e - 1.0)
        mag = jnp.round(av * jnp.exp2(1.0 - e)) * step
        q_val = jnp.where(v < 0, -mag, mag)
        q = _e2m1_value_to_code(q_val)

    qact = pack_int4(q.reshape(m, k), axis=-1)
    ascales_t = scale.T.astype(jnp.bfloat16)
    return qact, ascales_t, lora_act


def _e2m1_value_to_code(v: jnp.ndarray) -> jnp.ndarray:
    """Map exact e2m1 values {0,±.5,±1,±1.5,±2,±3,±4,±6} to int8 codes."""
    a = jnp.abs(v)
    # magnitudes are exactly representable; 2*a gives {0,1,2,3,4,6,8,12}
    t = (2.0 * a).astype(jnp.int32)
    idx = jnp.where(
        t <= 4, t, jnp.where(t == 6, 5, jnp.where(t == 8, 6, 7))
    ).astype(jnp.int8)
    return jnp.where(v < 0, -idx, idx).astype(jnp.int8)
