"""Batched serving throughput: FLUX int8-turbo step latency and
images/sec/chip at B = 1, 2, 4 (1024px).

MEASURED 2026-08-17 (one v5e, fused qkv_rope_producer): B=1 334.6 ms
(215 img/h), B=2 711.8 ms (202 img/h) = 2.13x. The old 2.49x anomaly
(B=1 362.6 / B=2 902.7) was mostly the attention-prologue layout copies
the head-gridded Pallas producer eliminated. The remaining 13% excess is
XLA fusion regressions at B=2 (trace: qkv_rope_producer 3.1x, a new
19 ms convert_add_fusion, lora-add fusions 3.2x; flash/chain/fc2 all
scale at 1.9-2.0x). Single-image latency stays the serving sweet spot
on one chip; scale throughput by replicating across chips (dp)."""
import sys, time, os, gc
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import nunchaku_tpu.models.transformers.transformer_flux as TF
from __graft_entry__ import _flux_inputs

cfg = TF.FluxConfig(precision="int8")

for B in ([int(x) for x in sys.argv[1:]] or (1, 2, 4)):
    model = TF.FluxTransformer2DModel.dummy_init(cfg)
    model.set_stream_dtype(jnp.bfloat16)
    if "--no-fused" not in sys.argv:
        model.enable_fused_qkv_prep()
    args = _flux_inputs(cfg, B=B, S_img=4096, S_txt=512)
    fwd = jax.jit(lambda m, *a: m(*a))
    t0 = time.time()
    out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    c = time.time() - t0
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    img_s = B / (dt * 50)
    print(f"B={B}: step {dt*1e3:.1f} ms  {img_s*3600:.0f} img/h/chip "
          f"(50-step; compile {c:.0f}s)", flush=True)
    del model, fwd, out
    gc.collect(); jax.clear_caches()
