"""Low-precision dtype helpers: NVFP4 (e2m1) emulation and fp8-e4m3 scales.

The reference's NVFP4 path (src/kernels/zgemm/gemm_w4a4.cuh:85-177,
quantize_float2_fp4) uses 4-bit e2m1 values with one fp8-e4m3 scale per group
of 16, plus a per-tensor ``wtscale`` (alpha) and per-channel ``wcscales``.
TPUs have no fp4 hardware; we emulate the *numerics* exactly (value grid and
rounding) while computing in bf16/f32 on the MXU, so checkpoints quantized
for NVFP4 produce matching results.
"""

from __future__ import annotations

import jax.numpy as jnp

# The 8 non-negative e2m1 magnitudes. Codes 0..7 map to these; bit 3 is sign.
E2M1_VALUES = jnp.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], dtype=jnp.float32)
E2M1_MAX = 6.0

# Midpoints between consecutive magnitudes, used for round-to-nearest-even.
_E2M1_BOUNDS = jnp.array([0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0], dtype=jnp.float32)


def quantize_e2m1(x: jnp.ndarray) -> jnp.ndarray:
    """Round ``x`` to the nearest e2m1 code (int8 in [-8, 7] as sign|mag).

    Ties round to even mantissa, matching CUDA's cvt.rn behaviour.
    """
    ax = jnp.abs(x).astype(jnp.float32)
    # Index of nearest magnitude: count of boundaries strictly below |x|,
    # with ties-to-even handled explicitly (boundaries 0.25/0.75/... are
    # exact binary floats so equality is well-defined).
    idx = jnp.sum(ax[..., None] > _E2M1_BOUNDS, axis=-1).astype(jnp.int32)
    # Tie: |x| exactly at a boundary -> round to even code.
    at_tie = ax[..., None] == _E2M1_BOUNDS
    tie_idx = jnp.argmax(at_tie, axis=-1).astype(jnp.int32)
    is_tie = jnp.any(at_tie, axis=-1)
    # boundary i separates codes i and i+1; even code among (i, i+1):
    even_choice = jnp.where(tie_idx % 2 == 0, tie_idx, tie_idx + 1)
    idx = jnp.where(is_tie, even_choice, idx)
    idx = jnp.clip(idx, 0, 7)
    sign = jnp.where(x < 0, -1, 1).astype(jnp.int8)
    return (sign * idx.astype(jnp.int8)).astype(jnp.int8)


def dequantize_e2m1(codes: jnp.ndarray) -> jnp.ndarray:
    """Map signed e2m1 codes (int8 in [-7, 7]) back to float32 values."""
    mag = jnp.take(E2M1_VALUES, jnp.abs(codes).astype(jnp.int32))
    return jnp.where(codes < 0, -mag, mag)


def to_e4m3(x: jnp.ndarray) -> jnp.ndarray:
    """Round to fp8-e4m3fn (native jnp dtype)."""
    return x.astype(jnp.float8_e4m3fn)


def from_e4m3(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return x.astype(dtype)
