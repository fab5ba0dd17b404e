"""In-model A/B of the fused-attention ingredients.

  base          - unfused model (reference point)
  fixed         - unfused + fixed-shift softmax forced in the flash kernel
  fused         - enable_fused_qkv_prep() (halfsplit prep + bshd out + fixed)
  fused-nofixed - fused, but online softmax
  fused-nobshd  - fused, but (B,H,S,D) kernel output + XLA transpose back
"""

import sys, time, os, functools
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

mode = sys.argv[1] if len(sys.argv) > 1 else "base"

import nunchaku_tpu.models.attention as A

real_flash = A.flash_attention


def override(**force):
    def wrapper(q, k, v, **kw):
        kw.update(force)
        want_bshd = force.get("out_bshd_emulate")
        kw.pop("out_bshd_emulate", None)
        o = real_flash(q, k, v, **kw)
        if want_bshd is not None and want_bshd:
            b, h, s, d = o.shape
            o = o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return o
    return wrapper


if mode == "fixed":
    A.flash_attention = override(fixed_softmax=True)
elif mode == "bkv2304":
    A.flash_attention = override(bkv=2304)
elif mode == "bq1536":
    A.flash_attention = override(bq=1536)
elif mode == "bq512":
    A.flash_attention = override(bq=512)
elif mode == "fused-nofixed":
    A.flash_attention = override(fixed_softmax=False)
elif mode == "fused-nobshd":
    A.flash_attention = override(out_bshd=False, out_bshd_emulate=True)

import nunchaku_tpu.ops.gemm as G

if mode.startswith("chain-t"):
    # chain-t<bm>.<bn>.<bk>: force tiles for the gelu-quant chain kernel
    bm, bn, bk = (int(x) for x in mode[7:].split("."))
    real_chain = G.svdq_gemm_w8a8_gelu_quant

    def forced(*a, **kw):
        kw.update(bm=bm, bn=bn, bk=bk)
        return real_chain(*a, **kw)

    A.svdq_gemm_w8a8_gelu_quant = forced

if mode.endswith("poly-gelu"):
    # Pade(7,6) continued-fraction tanh, clamped at |u|=4.97 where the
    # rational crosses 1; max |gelu err| 1.8e-4 (invisible under int8
    # quantization). Replaces the transcendental in the chain epilogue.
    # (A previous odd-poly fit here had sign-flipping coefficients — any
    # old measurement of this mode was numerically invalid.)
    def _poly_tanh_gelu(x):
        c = 0.7978845608028654
        u = c * (x + 0.044715 * x * x * x)
        u = jnp.clip(u, -4.97, 4.97)
        u2 = u * u
        num = u * (135135.0 + u2 * (17325.0 + u2 * (378.0 + u2)))
        den = 135135.0 + u2 * (62370.0 + u2 * (3150.0 + u2 * 28.0))
        return 0.5 * x * (1.0 + num / den)

    G._tanh_gelu = _poly_tanh_gelu

if mode.endswith("exp2-gelu"):
    # exact tanh via the exp2 identity: tanh(u) = 1 - 2/(1 + exp2(2u*log2e));
    # one hardware exp2 + one reciprocal instead of the tanh expansion
    LOG2E = 1.4426950408889634

    def _exp2_tanh_gelu(x):
        c = 0.7978845608028654
        u = c * (x + 0.044715 * x * x * x)
        e = jnp.exp2(jnp.clip(2.0 * LOG2E * u, -126.0, 126.0))
        t = 1.0 - 2.0 / (1.0 + e)
        return 0.5 * x * (1.0 + t)

    G._tanh_gelu = _exp2_tanh_gelu

if mode == "xla-all":
    G._int8_use_xla = lambda m, k, n: True
elif mode == "small-pallas":
    G._int8_use_xla = lambda m, k, n: m > 768
elif mode == "pallas-all":
    G._int8_use_xla = lambda m, k, n: False
elif mode == "pallas-deep":
    # Pallas for every int8 GEMM with full-depth K tiles
    G._int8_use_xla = lambda m, k, n: False
    real_gemm = G.svdq_gemm_w4a4

    def deep(qact, ascales, qweight, wscales, *a, **kw):
        if kw.get("precision") == "int8" and kw.get("bk") is None:
            k = qact.shape[1]
            for cand in (3072, 1536):
                if k % cand == 0:
                    kw["bk"] = cand
                    break
        return real_gemm(qact, ascales, qweight, wscales, *a, **kw)

    G.svdq_gemm_w4a4 = deep
    import nunchaku_tpu.models.linear as L

    L.svdq_gemm_w4a4 = deep

elif mode == "chain-on":
    # keep the XLA dispatch for standalone GEMMs but let the fc1->fc2
    # gelu-quant chain take the Pallas path
    real = A._can_chain
    A._can_chain = lambda fc1, fc2, m: (
        getattr(fc1, "precision", None) == "int8"
        and getattr(fc2, "precision", None) == "int8"
        and fc1.logical_out == fc1.out_features
        and fc2.logical_out == fc2.out_features
    )

from nunchaku_tpu.models.transformers.transformer_flux import FluxConfig, FluxTransformer2DModel
from __graft_entry__ import _flux_inputs

cfg = FluxConfig(precision="int8")
model = FluxTransformer2DModel.dummy_init(cfg)
if mode.startswith("fused"):
    model = model.enable_fused_qkv_prep()
if mode == "fused-producer":
    # head-gridded Pallas qkv_rope_producer instead of the XLA halfsplit chain
    model.transformer_blocks.attn.prep_producer = True
    model.single_transformer_blocks.attn.prep_producer = True
if mode == "attn-i8":
    model.transformer_blocks.attn.attn_int8 = True
    model.single_transformer_blocks.attn.attn_int8 = True
if mode == "unroll2":
    model._scan_unroll = 2
if mode == "unroll2-bf16":
    model._scan_unroll = 2
    model.set_stream_dtype(jnp.bfloat16)
args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)
fwd = jax.jit(lambda m, *a: m(*a))
out = fwd(model, *args)
_ = float(jnp.sum(out.astype(jnp.float32)))
n = 8
t0 = time.perf_counter()
for _ in range(n):
    out = fwd(model, *args)
_ = float(jnp.sum(out.astype(jnp.float32)))
print(f"[{mode}] forward: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

if mode == "bf16-stream":
    model.set_stream_dtype(jnp.bfloat16)
    out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print(f"[bf16-stream] forward: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

if mode in ("merged", "merged-bf16"):
    model.merge_dual_streams()
    if mode == "merged-bf16":
        model.set_stream_dtype(jnp.bfloat16)
    out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print(f"[{mode}+] forward: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
