"""In-model A/B for the round-4 epilogue levers on the int8 turbo step:

  - lora_in_producer (lever C): qkv lora-up+add moves from XLA's full-width
    (M, 3HD) fusion into the rope producer's tiles
  - RES_EPILOGUE (lever D): gated residual adds (+ the single block's
    attn_out extra/lora operands) fused into the chain consumer's epilogue

Run:  python tools/ablate_res_lora.py [configs...]
Configs: base (both off), lora, res, both (default: all four).
"""
import sys, time, os, gc, functools

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import nunchaku_tpu.models.transformers.transformer_flux as TF
from __graft_entry__ import _flux_inputs

cfg = TF.FluxConfig(precision="int8")
args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)

CONFIGS = sys.argv[1:] or ["base", "lora", "res", "both"]

import nunchaku_tpu.models.attention as MA

_real_flash = MA.flash_attention

for name in CONFIGS:
    lora_on = name in ("lora", "both", "bq2304", "bq4608")
    res_on = name in ("res", "both", "bq2304", "bq4608")
    if name.startswith("bq"):  # both levers on + flash q-tile override
        MA.flash_attention = functools.partial(_real_flash, bq=int(name[2:]))
    else:
        MA.flash_attention = _real_flash
    TF.set_res_epilogue(res_on)
    model = TF.FluxTransformer2DModel.dummy_init(cfg)
    model.set_stream_dtype(jnp.bfloat16)
    model.enable_fused_qkv_prep()
    model.transformer_blocks.attn.lora_in_producer = lora_on
    model.single_transformer_blocks.attn.lora_in_producer = lora_on
    fwd = jax.jit(lambda m, *a: m(*a))
    try:
        t0 = time.time()
        out = fwd(model, *args)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        c = time.time() - t0
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(model, *args)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: lora_in_producer={lora_on} res_epilogue={res_on} "
              f"step {dt*1e3:.1f} ms (compile {c:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:200]}", flush=True)
    finally:
        TF.set_res_epilogue(True)
    del model, fwd
    gc.collect()
    jax.clear_caches()
