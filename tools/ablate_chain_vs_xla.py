"""A/B: Pallas GELU->requant chain kernel vs XLA fc1 + Pallas plain-quantize
producer for fc2 (the producer changed the economics vs the round-2 A/B)."""
import sys, time, os, gc
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import nunchaku_tpu.models.attention as A
import nunchaku_tpu.models.linear as L
import nunchaku_tpu.models.transformers.transformer_flux as TF
from __graft_entry__ import _flux_inputs

cfg = TF.FluxConfig(precision="int8")
args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)
real_can_chain = A._can_chain

for mode in (sys.argv[1:] or ("chain", "xla+producer", "xla")):
    if mode == "chain":
        A._can_chain = real_can_chain
        L.set_pallas_quant_int8(False)
    elif mode == "xla+producer":
        A._can_chain = lambda *a: False
        L.set_pallas_quant_int8(True)
    else:
        A._can_chain = lambda *a: False
        L.set_pallas_quant_int8(False)
    model = TF.FluxTransformer2DModel.dummy_init(cfg)
    model.set_stream_dtype(jnp.bfloat16)
    fwd = jax.jit(lambda m, *a: m(*a))
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
    print(f"{mode}: step {dt*1e3:.1f} ms (compile {c:.0f}s)", flush=True)
    del model, fwd, out
    gc.collect(); jax.clear_caches()

A._can_chain = real_can_chain
L.set_pallas_quant_int8(False)
