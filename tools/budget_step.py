"""In-model step-time budget via a cumulative ablation ladder.

Each mode removes one more component from the FLUX int8 forward; the
difference between consecutive modes is that component's true in-model
cost (synthetic standalone probes over the axon tunnel are dispatch-
polluted and disagree with in-model rates by 2x).

  full      - unmodified
  noattn    - flash kernel -> identity            (delta = flash kernels)
  norope    - + skip rmsnorm+rope                 (delta = rmsnorm+rope)
  noattnall - + skip head transposes/concat       (delta = layout moves)
  noquant   - + quantize -> cheap fake            (delta = quantize ops)
  nogemm    - + svdq gemm -> cheap fake           (delta = quantized GEMMs)

Usage: python tools/budget_step.py [mode ...]   (default: all, in order)
"""

import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

LADDER = ["full", "noattn", "norope", "noattnall", "noquant", "nogemm"]


def patch(level: int):
    import nunchaku_tpu.models.attention as A
    import nunchaku_tpu.ops.quantize as Q
    import nunchaku_tpu.models.linear as L
    import nunchaku_tpu.ops.gemm as G

    if level >= 1 and level < 3:
        def fake_attend(self, q, k, v, out_bshd=False, prescaled=False):
            o = q + k[:, :, :1, :] * 0 + v[:, :, :1, :] * 0
            if out_bshd:
                b, h, s, d = o.shape
                o = o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
            return o
        A.FluxAttention._attend = fake_attend

    if level >= 2 and level < 3:
        def fake_prep(qkv, head_dim, norm_q, norm_k, rot, eps=1e-6, prescale=1.0):
            b, s, _ = qkv.shape
            heads = qkv.shape[-1] // 3 // head_dim
            q, k, v = jnp.split(qkv, 3, axis=-1)
            def hf(t):
                return t.reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)
            return hf(q), hf(k), hf(v)
        A.qkv_norm_rope = fake_prep

    if level >= 3:
        def fake_call(self, hidden, encoder_hidden=None, rot=None, ip_kv=None):
            b, s, _ = hidden.shape
            qkv = self.to_qkv(hidden)
            o = qkv[..., : qkv.shape[-1] // 3]
            if encoder_hidden is None:
                return o
            qkv_t = self.add_qkv_proj(encoder_hidden)
            o_t = qkv_t[..., : qkv_t.shape[-1] // 3]
            return (self.to_out(o), self.to_add_out(o_t))
        A.FluxAttention.__call__ = fake_call

    if level >= 4:
        def fake_quant(x, proj_down, smooth=None, precision="int8",
                       act_unsigned=False, fuse_glu=False, glu_act="silu"):
            m, k = x.shape
            r = proj_down.shape[1]
            dep = jnp.max(x).astype(jnp.float32) * 0  # keep x alive
            la = jnp.zeros((m, r), jnp.float32) + dep
            scale = jnp.full((1, m), 0.01, jnp.float32) + dep
            q = jnp.zeros((m, k), jnp.int8) + dep.astype(jnp.int8)
            return q, scale, la
        Q.quantize_w4a4_act_fuse_lora = fake_quant
        L.quantize_w4a4_act_fuse_lora = fake_quant

    if level >= 5:
        real_gemm = G.svdq_gemm_w4a4
        keep_grouped = os.environ.get("BUDGET_KEEP_GROUPED") == "1"
        only_small = os.environ.get("BUDGET_ONLY_SMALL") == "1"

        def fake_gemm(qact, ascales, qweight, wscales, lora_act=None,
                      proj_up=None, bias=None, rescales=None, *, precision="int4",
                      act_unsigned=False, out_dtype=jnp.bfloat16,
                      bm=None, bn=None, bk=None, interpret=None):
            keep = keep_grouped and ascales.ndim == 2 and ascales.shape[0] > 1
            if only_small and qact.shape[0] > 768:
                keep = True  # stub ONLY the small-M (txt-stream) GEMMs
            if keep:
                return real_gemm(
                    qact, ascales, qweight, wscales, lora_act, proj_up, bias,
                    rescales, precision=precision, act_unsigned=act_unsigned,
                    out_dtype=out_dtype, bm=bm, bn=bn, bk=bk, interpret=interpret,
                )
            m = qact.shape[0]
            n = qweight.shape[1]
            dep = (jnp.max(qact).astype(jnp.float32)
                   + jnp.max(qweight).astype(jnp.float32)) * 0
            if lora_act is not None:
                dep = dep + jnp.max(lora_act) * 0
            return (jnp.zeros((m, n), jnp.float32) + dep).astype(out_dtype)
        G.svdq_gemm_w4a4 = fake_gemm
        L.svdq_gemm_w4a4 = fake_gemm
        import nunchaku_tpu.models.normalization as NZ
        if hasattr(NZ, "svdq_gemm_w4a4"):
            NZ.svdq_gemm_w4a4 = fake_gemm


def run(mode: str):
    patch(LADDER.index(mode))
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig, FluxTransformer2DModel,
    )
    from __graft_entry__ import _flux_inputs

    cfg = FluxConfig(precision="int8")
    model = FluxTransformer2DModel.dummy_init(cfg)
    import os as _os
    args = _flux_inputs(cfg, B=int(_os.environ.get("BUDGET_B", "1")), S_img=4096, S_txt=512)
    fwd = jax.jit(lambda m, *a: m(*a))
    out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print(f"[{mode}] forward: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "full")
