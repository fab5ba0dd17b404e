"""Int4 nibble packing in the TPU-native "block-split-half" layout.

The CUDA reference packs int4 values two-per-byte in an MMA-fragment-swizzled
order (reference: src/kernels/zgemm/gemm_base.cuh, nunchaku/lora/flux/packer.py).
On TPU we choose a layout whose unpack lowers to cheap vector ops instead of
cross-lane shuffles:

  * Values are grouped in **pack blocks** of ``PACK_BLOCK = 256`` consecutive
    elements along the packed axis.
  * Within a block, byte ``j`` (``0 <= j < 128``) stores element ``j`` in its
    low nibble and element ``j + 128`` in its high nibble.

Unpacking is then: two arithmetic shifts (sign extension) + a reshape that
keeps 128-lane alignment — no interleaving.  Quantization group boundaries
(G = 64 for int4, G = 16 for nvfp4) always fall inside a half-block, so group
scales index the *logical* (unpacked) axis untouched.

All functions are pure jnp and usable inside Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

PACK_BLOCK = 256
HALF_BLOCK = PACK_BLOCK // 2


def pack_int4(values: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Pack int values in [-8, 7] (or [0, 15] unsigned) along ``axis``.

    ``values.shape[axis]`` must be a multiple of ``PACK_BLOCK``. Returns an
    int8 array with that axis halved, in block-split-half layout.
    """
    axis = axis % values.ndim
    n = values.shape[axis]
    if n % PACK_BLOCK != 0:
        raise ValueError(f"pack axis size {n} not a multiple of {PACK_BLOCK}")
    v = jnp.moveaxis(values, axis, -1)
    lead = v.shape[:-1]
    v = v.reshape(*lead, n // PACK_BLOCK, 2, HALF_BLOCK)
    lo = v[..., 0, :].astype(jnp.int8) & 0xF
    hi = v[..., 1, :].astype(jnp.int8) & 0xF
    packed = (lo | (hi << 4)).astype(jnp.int8)
    packed = packed.reshape(*lead, n // 2)
    return jnp.moveaxis(packed, -1, axis)


def unpack_int4(packed: jnp.ndarray, axis: int = -1, *, unsigned: bool = False) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`. Returns int8 values.

    Signed values are sign-extended from the 4-bit two's-complement nibble;
    unsigned values are zero-extended (range [0, 15]).
    """
    axis = axis % packed.ndim
    n2 = packed.shape[axis]
    if n2 % HALF_BLOCK != 0:
        raise ValueError(f"packed axis size {n2} not a multiple of {HALF_BLOCK}")
    p = jnp.moveaxis(packed, axis, -1).astype(jnp.int8)
    lead = p.shape[:-1]
    p = p.reshape(*lead, n2 // HALF_BLOCK, HALF_BLOCK)
    if unsigned:
        lo = p & 0xF
        hi = (p >> 4) & 0xF
    else:
        # Arithmetic shifts sign-extend each nibble.
        lo = (p << 4) >> 4
        hi = p >> 4
    out = jnp.stack([lo, hi], axis=-2)  # (..., nblocks, 2, HALF_BLOCK)
    out = out.reshape(*lead, n2 * 2)
    return jnp.moveaxis(out, -1, axis)
