"""Decoders for the nunchaku/deepcompressor checkpoint tensor layouts.

Nunchaku checkpoints store quantized weights pre-swizzled into CUDA
MMA-fragment order (spec: nunchaku/lora/flux/packer.py — pack_weight
:188-244, pack_scale :246-302, pack_micro_scale :304-362,
pack_lowrank_weight :364-398; int4 parameters bits=4, warp_n=128:
comp_n=16, comp_k=64, lanes 8x4, reg_k=8, n/k_pack_size=2).

These functions invert those layouts into plain row-major numpy arrays;
nunchaku_tpu then re-packs into its own TPU-friendly layouts
(core/packing.py). Everything is host-side numpy at load time.
"""

from __future__ import annotations

import numpy as np

# MMA tiling constants for bits=4, warp_n=128 (the only config nunchaku
# ships for W4A4 blocks).
NUM_N_LANES = 8
NUM_K_LANES = 4
REG_K = 8  # int4 values per 32-bit register
N_PACK = 2
K_PACK = 2
MEM_N = 128  # warp_n
MEM_K = 64  # comp_k
NUM_N_PACKS = MEM_N // (N_PACK * NUM_N_LANES)  # 8
NUM_K_PACKS = 1


def unpack_weight_int4(packed: np.ndarray, n: int, k: int) -> np.ndarray:
    """Packed int8 (n, k/2) MMA-swizzled -> signed int4 values (n, k) int8."""
    w32 = np.ascontiguousarray(packed.reshape(n, k // 2)).view(np.int32)
    # nibbles, little-endian within the 32-bit register (reg_k = 8)
    regs = w32.reshape(-1, 1).repeat(8, axis=1)
    shifts = np.arange(0, 32, 4, dtype=np.int32)
    nib = (regs >> shifts) & 0xF
    nib = nib.astype(np.int8)
    nib = np.where(nib >= 8, nib - 16, nib)  # sign-extend
    # shape after packing (pre-nibble-merge):
    # (n_tiles, k_tiles, num_k_packs, num_n_packs, num_n_lanes, num_k_lanes,
    #  n_pack_size, k_pack_size, reg_n, reg_k)
    nt, kt = n // MEM_N, k // MEM_K
    arr = nib.reshape(nt, kt, NUM_K_PACKS, NUM_N_PACKS, NUM_N_LANES, NUM_K_LANES,
                      N_PACK, K_PACK, 1, REG_K)
    # invert permute(0, 5, 6, 1, 3, 8, 2, 7, 4, 9) of the logical view
    # (n_tiles, num_n_packs, n_pack_size, num_n_lanes, reg_n,
    #  k_tiles, num_k_packs, k_pack_size, num_k_lanes, reg_k)
    arr = arr.transpose(0, 3, 6, 4, 8, 1, 2, 7, 5, 9)
    return np.ascontiguousarray(arr.reshape(n, k))


def unpack_scale(packed: np.ndarray, n: int, warp_n: int = 128) -> np.ndarray:
    """Packed group scales -> (num_groups, n) row-major.

    Inverse of pack_scale (packer.py:246-302): per warp_s=128 output
    channels the order is reshape(n//128, 1, 8, 2, 4, 2, G).permute(
    0, 6, 1, 2, 4, 3, 5).
    """
    s_pack_size = min(max(warp_n // 32, 2), 8)
    num_s_lanes = min(32, warp_n // s_pack_size)
    num_s_packs = warp_n // (s_pack_size * num_s_lanes)
    flat = packed.reshape(-1)
    g = flat.size // n
    arr = flat.reshape(n // warp_n, g, num_s_packs, num_s_lanes // 4,
                       4, s_pack_size // 2, 2)
    # inverse of permute(0, 6, 1, 2, 4, 3, 5) on
    # (n//warp_s, num_s_packs, num_s_lanes//4, s_pack_size//2, 4, 2, G)
    arr = arr.transpose(0, 2, 3, 5, 4, 6, 1)
    arr = arr.reshape(n, g)
    return np.ascontiguousarray(arr.T)


def unpack_micro_scale(packed: np.ndarray, n: int, warp_n: int = 128) -> np.ndarray:
    """Packed fp8-e4m3 micro scales (nvfp4, group 16) -> (num_groups, n).

    Inverse of pack_micro_scale (packer.py:304-362): insn_k=64 so scales
    come in k-quads; order reshape(n//warp_s, num_s_packs, s_pack_size,
    4, 8, G/4, 4).permute(0, 5, 1, 4, 3, 2, 6).
    """
    s_pack_size = min(max(warp_n // 32, 1), 4)
    num_s_lanes = 32
    num_s_packs = -(-warp_n // (s_pack_size * num_s_lanes))
    flat = packed.reshape(-1)
    g = flat.size // n  # total groups per channel
    arr = flat.reshape(n // warp_n, g // 4, num_s_packs, 8, 4, s_pack_size, 4)
    # inverse of permute(0, 5, 1, 4, 3, 2, 6) on
    # (n//warp_s, num_s_packs, s_pack_size, 4, 8, G/4, 4)
    arr = arr.transpose(0, 2, 5, 4, 3, 1, 6)
    arr = arr.reshape(n, g)
    return np.ascontiguousarray(arr.T)


def unpack_lowrank_weight(packed: np.ndarray, down: bool) -> np.ndarray:
    """Inverse of pack_lowrank_weight (packer.py:364-398).

    Returns torch-Linear-logical layouts: down (R, K) for a checkpoint
    tensor stored (K, R); up (N, R) stored (N, R). Padding was applied to
    16-multiples before packing, so shapes are preserved.
    """
    reg_n, reg_k = 1, 2
    pack_n = N_PACK * NUM_N_LANES * reg_n  # 16
    pack_k = K_PACK * NUM_K_LANES * reg_k  # 16
    inv_inner = (0, 1, 4, 2, 6, 5, 3, 7)  # inverse of permute(0,1,3,6,2,5,4,7)
    if down:
        kk, rr = packed.shape  # stored (K, R); pack_n tiles the RANK dim
        r_packs, c_packs = rr // pack_n, kk // pack_k
        arr = packed.reshape(c_packs, r_packs, NUM_N_LANES, NUM_K_LANES,
                             N_PACK, K_PACK, reg_n, reg_k)
        arr = arr.transpose(*inv_inner).reshape(c_packs, r_packs, pack_n, pack_k)
        # inverse of view(r_packs, pack_n, c_packs, pack_k).permute(2,0,1,3)
        arr = arr.transpose(1, 2, 0, 3).reshape(rr, kk)
        return np.ascontiguousarray(arr)  # (R, K)
    else:
        nn, rr = packed.shape  # stored (N, R); pack_n tiles N
        c_packs, r_packs = nn // pack_n, rr // pack_k
        arr = packed.reshape(c_packs, r_packs, NUM_N_LANES, NUM_K_LANES,
                             N_PACK, K_PACK, reg_n, reg_k)
        arr = arr.transpose(*inv_inner).reshape(c_packs, r_packs, pack_n, pack_k)
        # inverse of view(c_packs, pack_n, r_packs, pack_k).permute(0,2,1,3)
        arr = arr.transpose(0, 2, 1, 3).reshape(nn, rr)
        return np.ascontiguousarray(arr)  # (N, R)


# ---------------------------------------------------------------------------
# AWQ GEMV layout (AdaLN modulation linears)
# ---------------------------------------------------------------------------

def _awq_gemv_perm(oc: int, ic: int) -> np.ndarray:
    """Nibble index map for the reference's GEMV_AWQ weight layout.

    Derived from the consuming kernel (src/kernels/awq/gemv_awq.cu:100-230):
    4-row interleave groups; per group, 32-nibble chunks are assigned
    round-robin as chunk q -> row (q//2)%4, k_base (q//8)*64 + (q%2)*32;
    inside a chunk the fast-dequant word order is [n0,n4,n1,n5,n2,n6,n3,n7]
    (dequantize.cuh BOTTOM/TOP masks) followed by the 4x4x2 shuffle
    (kShuffleContinous/Strided/BasicTile).

    Returns ``perm`` with shape (oc, ic): packed nibble position (within the
    flat nibble stream) holding logical weight (row, k).
    """
    # within-chunk: logical y in [0,32) lives at buffer index b
    # y = (i*4 + j)*2 + e  <- buffer[(i + j*4)*2 + e], i,j in [0,4), e in {0,1}
    buf_of_y = np.empty(32, np.int64)
    for i in range(4):
        for j in range(4):
            for e in range(2):
                buf_of_y[(i * 4 + j) * 2 + e] = (i + j * 4) * 2 + e
    # buffer index b -> packed nibble index within chunk:
    # word w = b//8; within word buffer order [n0,n4,n1,n5,n2,n6,n3,n7]
    word_nibble = np.array([0, 4, 1, 5, 2, 6, 3, 7], np.int64)
    nib_of_buf = (np.arange(32) // 8) * 8 + word_nibble[np.arange(32) % 8]
    nib_of_y = nib_of_buf[buf_of_y]  # logical y -> nibble within chunk

    perm = np.empty((oc, ic), np.int64)
    n_chunks = 4 * ic // 32  # chunks per 4-row group
    q = np.arange(n_chunks)
    rows = (q // 2) % 4
    kbase = (q // 8) * 64 + (q % 2) * 32
    for g in range(oc // 4):
        base = g * 4 * ic  # nibble offset of this 4-row group
        for qq in range(n_chunks):
            r = g * 4 + rows[qq]
            ks = kbase[qq]
            perm[r, ks : ks + 32] = base + qq * 32 + nib_of_y
    return perm


def unpack_awq_gemv(packed: np.ndarray, oc: int, ic: int) -> np.ndarray:
    """GEMV_AWQ qweight int32 (oc/4, ic/8*4) -> unsigned int4 values (oc, ic).

    Values are the *unsigned* codes (0..15); dequant is
    ``w = q * wscales - (-stored_zeros)`` with wscales/wzeros stored plain
    (ic/G, oc) row-major (src/Linear.cpp:25-39, gemv_awq.cu:156-157).
    """
    words = np.ascontiguousarray(packed).view(np.uint32).reshape(-1)
    nibbles = (words[:, None] >> (np.arange(8, dtype=np.uint32) * 4)) & 0xF
    nibbles = nibbles.reshape(-1).astype(np.int8)
    perm = _awq_gemv_perm(oc, ic)
    return nibbles[perm]


def pack_awq_gemv(values: np.ndarray) -> np.ndarray:
    """Inverse of unpack_awq_gemv: unsigned int4 (oc, ic) -> int32 packed."""
    oc, ic = values.shape
    perm = _awq_gemv_perm(oc, ic)
    flat = np.zeros(oc * ic, np.uint32)
    flat[perm.reshape(-1)] = values.reshape(-1).astype(np.uint32) & 0xF
    words = flat.reshape(-1, 8)
    shifts = (np.arange(8, dtype=np.uint32) * 4)
    packed = (words << shifts).sum(axis=1, dtype=np.uint32)
    return packed.view(np.int32).reshape(oc // 4, ic // 8 * 4)


# ---------------------------------------------------------------------------
# TinyChat W4 layout (4-bit T5 encoder)
# ---------------------------------------------------------------------------

def unpack_tinychat_w4(packed: np.ndarray, oc: int, ic: int) -> np.ndarray:
    """TinyChat int16 qweight (oc/4, ic) -> unsigned int4 values (oc, ic).

    Inverse of pack_w4 (nunchaku/models/text_encoders/tinychat_utils.py:76):
    per 32-k chunk, nibble j of the int16 element i holds k = 8*j + i, and
    (oc//4, 4, ic//64, 16) rows/columns are transposed.
    """
    w = np.ascontiguousarray(packed).view(np.uint16)
    w = w.reshape(oc // 4, ic // 64, 4, 16).transpose(0, 2, 1, 3)  # undo permute
    w = w.reshape(oc * ic // 32, 8)  # int16 elements per 32-k chunk row
    out = np.empty((oc * ic // 32, 4, 8), np.int8)
    for j in range(4):
        out[:, j, :] = ((w >> (4 * j)) & 0xF).astype(np.int8)
    return out.reshape(oc, ic)


def pack_tinychat_w4(values: np.ndarray) -> np.ndarray:
    """Inverse of unpack_tinychat_w4."""
    oc, ic = values.shape
    v = values.reshape(oc * ic // 32, 4, 8).astype(np.uint16) & 0xF
    w = v[:, 0] | (v[:, 1] << 4) | (v[:, 2] << 8) | (v[:, 3] << 12)
    w = w.reshape(oc // 4, 4, ic // 64, 16).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(w.reshape(oc // 4, ic)).view(np.int16)


# ---------------------------------------------------------------------------
# Forward packers (exporting/merging/synthesizing reference-format files)
# ---------------------------------------------------------------------------

def pack_weight_int4(values: np.ndarray) -> np.ndarray:
    """Inverse of unpack_weight_int4: signed int4 (n, k) -> packed int8 (n, k/2)."""
    n, k = values.shape
    nt, kt = n // MEM_N, k // MEM_K
    arr = values.reshape(nt, NUM_N_PACKS, N_PACK, NUM_N_LANES, 1,
                         kt, NUM_K_PACKS, K_PACK, NUM_K_LANES, REG_K)
    arr = arr.transpose(0, 5, 6, 1, 3, 8, 2, 7, 4, 9)
    nib = (arr.astype(np.int32) & 0xF).reshape(-1, 8)
    shifts = np.arange(0, 32, 4, dtype=np.int32)
    words = (nib << shifts).sum(axis=1, dtype=np.int32)
    return words.view(np.int8).reshape(n, k // 2)


def pack_scale_ref(scales: np.ndarray, warp_n: int = 128) -> np.ndarray:
    """Inverse of unpack_scale: (num_groups, n) -> reference pack order (g, n)."""
    g, n = scales.shape
    s_pack_size = min(max(warp_n // 32, 2), 8)
    num_s_lanes = min(32, warp_n // s_pack_size)
    num_s_packs = warp_n // (s_pack_size * num_s_lanes)
    arr = scales.T.reshape(n // warp_n, num_s_packs, num_s_lanes // 4,
                           s_pack_size // 2, 4, 2, g)
    arr = arr.transpose(0, 6, 1, 2, 4, 3, 5)
    return np.ascontiguousarray(arr).reshape(g, n)


def pack_micro_scale_ref(scales: np.ndarray, warp_n: int = 128) -> np.ndarray:
    """Inverse of unpack_micro_scale: (num_groups, n) e4m3 -> packed (g, n)."""
    g, n = scales.shape
    s_pack_size = min(max(warp_n // 32, 1), 4)
    arr = scales.T.reshape(n // warp_n, 1, s_pack_size, 4, 8, g // 4, 4)
    arr = arr.transpose(0, 5, 1, 4, 3, 2, 6)
    return np.ascontiguousarray(arr).reshape(g, n)


def pack_lowrank_weight_ref(weight: np.ndarray, down: bool) -> np.ndarray:
    """Inverse of unpack_lowrank_weight (torch-logical layouts in)."""
    reg_n, reg_k = 1, 2
    pack_n = N_PACK * NUM_N_LANES * reg_n
    pack_k = K_PACK * NUM_K_LANES * reg_k
    fwd_inner = (0, 1, 3, 6, 2, 5, 4, 7)
    if down:
        rr, kk = weight.shape  # (R, K)
        r_packs, c_packs = rr // pack_n, kk // pack_k
        arr = weight.reshape(r_packs, pack_n, c_packs, pack_k).transpose(2, 0, 1, 3)
        arr = arr.reshape(c_packs, r_packs, N_PACK, NUM_N_LANES, reg_n,
                          K_PACK, NUM_K_LANES, reg_k)
        arr = arr.transpose(*fwd_inner)
        return np.ascontiguousarray(arr).reshape(kk, rr)  # stored (K, R)
    else:
        nn, rr = weight.shape  # (N, R)
        c_packs, r_packs = nn // pack_n, rr // pack_k
        arr = weight.reshape(c_packs, pack_n, r_packs, pack_k).transpose(0, 2, 1, 3)
        arr = arr.reshape(c_packs, r_packs, N_PACK, NUM_N_LANES, reg_n,
                          K_PACK, NUM_K_LANES, reg_k)
        arr = arr.transpose(*fwd_inner)
        return np.ascontiguousarray(arr).reshape(nn, rr)  # stored (N, R)
