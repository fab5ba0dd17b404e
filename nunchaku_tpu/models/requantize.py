"""In-memory precision conversion of quantized linears / whole models.

The int8 turbo and w4a8 serving modes re-round the checkpoint's 4-bit
residual weights to per-channel int8 (loader.py _decode_svdq:89-126 does
this from checkpoint tensors at load). This module applies the *same math*
to an already-built model, so tests and tools can isolate the quality cost
of that re-rounding: ``dequantized_twin(requantize_model(m, "int8"))`` vs
``dequantized_twin(m)`` differ ONLY by the weight re-rounding (no
activation quantization in either), which is exactly the error the
reference's LPIPS tables cannot see (they compare one quantized mode to
bf16: /root/reference/tests/v1/flux/test_flux1_dev.py:66-135).

Works on stacked (scan-axis) modules: all math is vectorized over leading
axes, mirroring bf16_ref.py.
"""

from __future__ import annotations

import copy
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.packing import unpack_int4
from .bf16_ref import _dequant_e2m1
from .linear import SVDQW4A4Linear


@functools.partial(jax.jit, static_argnames=("nvfp4",))
def _requant_int8_layer(qw: jnp.ndarray, ws: jnp.ndarray, *, nvfp4: bool):
    """One (K/2, N) packed layer -> (int8 (K, N) codes, (1, N) scale).

    Jitted so the dequant/absmax/re-round chain fuses into one pass —
    eager execution materializes each intermediate (K, N) f32 buffer.
    Same math as loader.py _decode_svdq."""
    vals = unpack_int4(qw, axis=-2).astype(jnp.float32)
    if nvfp4:
        vals = _dequant_e2m1(vals.astype(jnp.int8))
    g = vals.shape[-2] // ws.shape[-2]
    w_deq = vals * jnp.repeat(ws.astype(jnp.float32), g, axis=-2)
    absmax = jnp.max(jnp.abs(w_deq), axis=-2, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q8 = jnp.clip(jnp.round(w_deq / scale), -127, 127).astype(jnp.int8)
    return q8, scale


def requantize_svdq(lin: SVDQW4A4Linear, out_precision: str) -> SVDQW4A4Linear:
    """Convert an int4/nvfp4 SVDQ linear to the int8 or w4a8 serving mode.

    Same math as the loader (loader.py _decode_svdq): int8 dequantizes the
    group-scaled 4-bit residual and re-rounds to per-channel int8; w4a8
    keeps the packed int4 codes and adds the per-channel int8 scale +
    per-group rescale factors the kernel re-rounds with in VMEM
    (ops/gemm.py _gemm_w4a8_kernel — numerically identical to the int8
    re-round, at 4-bit weight memory)."""
    if lin.precision == out_precision:
        return lin
    if lin.precision not in ("int4", "nvfp4"):
        raise ValueError(f"cannot requantize from {lin.precision}")

    ws = lin.wscales.astype(jnp.float32)  # (.., K/G, N)

    if out_precision == "w4a8":
        # nvfp4 source keeps the packed e2m1 codes (wcodes="e2m1", the
        # nvfp4-a8 serving mode): the dequant pass decodes the fp4 grid
        # (max |value| 6.0 vs int4's 7) before the rescale, so the
        # per-channel int8 scale bound uses 6.0 and the fp8-e4m3 group
        # scales (already folded into wscales by the loader) ride the
        # rescale factors — same ladder trick as int4 w4a8 (499 -> 331 ms)
        cmax = 6.0 if lin.precision == "nvfp4" else 7.0
        s8 = jnp.maximum(
            jnp.max(ws, axis=-2, keepdims=True) * (cmax / 127.0), 1e-12
        )  # (.., 1, N)
        new = SVDQW4A4Linear(
            lin.qweight,
            s8.astype(jnp.float32),
            lin.smooth,
            lin.proj_down,
            lin.proj_up,
            lin.bias,
            rescales=(ws / s8).astype(jnp.bfloat16),
            precision="w4a8",
            act_unsigned=lin.act_unsigned,
            wcodes="e2m1" if lin.precision == "nvfp4" else "int4",
        )
    elif out_precision == "int8":
        if lin.qweight.ndim == 3:
            # stacked (L, K/2, N): layer by layer, synchronously — the
            # whole-stack eager path materializes several f32 (L, K, N)
            # temps (~5.7 GiB each at the FLUX single-fc1 stack) and OOMs
            # a 16 GiB chip; the jitted per-layer fusion bounds live temps
            # to one (K, N) f32 buffer (~150 MB)
            outs = [
                jax.block_until_ready(_requant_int8_layer(
                    lin.qweight[i],
                    ws[i] if ws.ndim == 3 else ws,
                    nvfp4=lin.precision == "nvfp4",
                ))
                for i in range(lin.qweight.shape[0])
            ]
            q8 = jnp.stack([o[0] for o in outs])
            scale = jnp.stack([o[1] for o in outs])
            del outs
        else:
            q8, scale = _requant_int8_layer(
                lin.qweight, ws, nvfp4=lin.precision == "nvfp4"
            )
        new = SVDQW4A4Linear(
            q8,
            scale.astype(jnp.float32),
            lin.smooth,
            lin.proj_down,
            lin.proj_up,
            lin.bias,
            precision="int8",
            act_unsigned=lin.act_unsigned,
        )
    else:
        raise ValueError(f"unsupported target precision {out_precision}")
    new.logical_in = lin.logical_in
    new.logical_out = lin.logical_out
    return new


def w4a8_cache_dequant(model, budget_gib: float, *, inplace: bool = False):
    """Memory/speed dial for the w4a8 serving mode: spend up to
    ``budget_gib`` of extra HBM holding dequanted int8 copies of the
    largest weight stacks, so their per-step dequant pass disappears.

    The per-step w4a8 dequant is HBM-bandwidth-bound at ~95% of light
    speed (read 0.5 B/elem packed + write 1 B/elem int8 ≈ 22.5 ms/step at
    FLUX scale on v5e) — the only way below it at fixed 4-bit residency
    is to not re-dequant. Each converted linear swaps its packed int4
    copy (0.5 B/elem) for a resident int8 copy (1 B/elem): net +0.5
    B/elem of HBM buys back 1.5 B/elem/step of dequant traffic. Largest
    stacks convert first (greedy by bytes). budget_gib counts the NET
    growth. The conversion is bit-exact: the int8 codes are EXACTLY what
    :func:`~nunchaku_tpu.ops.gemm.dequant_w4a8_to_int8` would emit in the
    step, so outputs are unchanged at any dial setting.

    budget_gib=0 is pure w4a8 (4-bit residency); a budget covering every
    stack reaches int8-turbo step time with the checkpoint still loaded
    from 4-bit. Returns a new model (deep copy), converted in place.
    Reference identity: 4-bit weights, gemm_w4a4.cuh:832 — this dial
    trades that residency back for speed explicitly.

    Note the contract is *code*-exact, not output-bit-exact: converted
    linears carry byte-identical int8 weights, but an int8-precision
    linear may dispatch to the tuned Pallas int8 GEMM where the w4a8
    route always rides the XLA dequant+dot — the two epilogues differ by
    1-2 bf16 ulp (the same documented envelope as every Pallas/XLA route
    pair; tests pin it).
    """
    from ..ops.gemm import dequant_w4a8_to_int8

    # inplace=True skips the deep copy (on a 16 GiB chip the packed model +
    # its copy + the int8 stacks don't coexist); the input model is mutated
    new = model if inplace else copy.deepcopy(model)
    # hold (mod, attr) only — holding the child would pin every packed
    # array alive for the whole conversion and OOM a 16 GiB chip
    cands = [
        (int(np.prod(child.qweight.shape)) * 2, mod, attr)  # int8 bytes
        for _, mod in new.modules()
        for attr, child in vars(mod).items()
        if isinstance(child, SVDQW4A4Linear) and child.precision == "w4a8"
    ]
    cands.sort(key=lambda t: -t[0])
    budget = int(budget_gib * 2**30)
    spent = 0
    for bytes_i8, mod, attr in cands:
        net = bytes_i8 // 2  # int8 copy replaces the packed int4 copy
        if spent + net > budget:
            continue
        spent += net
        child = getattr(mod, attr)
        codes = getattr(child, "wcodes", "int4")
        if child.qweight.ndim == 3:
            # layer by layer, synchronously: bounds the live temps to one
            # layer's f32 rescale fusion instead of the whole stack's
            w8 = jnp.stack([
                jax.block_until_ready(dequant_w4a8_to_int8(
                    child.qweight[i], child.rescales[i]
                    if child.rescales.ndim == 3 else child.rescales,
                    codes=codes))
                for i in range(child.qweight.shape[0])
            ])
        else:
            w8 = dequant_w4a8_to_int8(child.qweight, child.rescales,
                                      codes=codes)
        lin = SVDQW4A4Linear(
            w8, child.wscales, child.smooth, child.proj_down,
            child.proj_up, child.bias, precision="int8",
            act_unsigned=child.act_unsigned,
        )
        # the constructor derives in/out_features from qweight.shape[0/-1],
        # which for a STACKED (L, K, N) array reads the layer axis — copy
        # the child's correct values (forward_modulated's fused-producer
        # eligibility checks k == in_features)
        lin.in_features = child.in_features
        lin.out_features = child.out_features
        lin.logical_in = child.logical_in
        lin.logical_out = child.logical_out
        setattr(mod, attr, lin)  # frees the packed copy (refcount)
        del child, lin, w8
    return new


def requantize_model(model, out_precision: str, *, inplace: bool = False):
    """Deep-copied model with every 4-bit SVDQ linear converted to
    ``out_precision`` (int8 linears and AWQ modulation linears are left
    as-is, matching the loader's per-module handling). ``inplace=True``
    mutates the input instead — on a 16 GiB chip the int4 model, its deep
    copy, and the int8 stacks cannot coexist; per-linear replacement frees
    each packed stack as it converts."""
    new = model if inplace else copy.deepcopy(model)
    for _, mod in new.modules():
        for attr, child in list(vars(mod).items()):
            if isinstance(child, SVDQW4A4Linear) and child.precision in (
                "int4",
                "nvfp4",
            ):
                setattr(mod, attr, requantize_svdq(child, out_precision))
    cfg = getattr(new, "cfg", None)
    if cfg is not None and hasattr(cfg, "precision"):
        try:
            cfg.precision = out_precision
        except AttributeError:
            pass  # frozen config: modules carry their own precision
    return new
