"""Batched serving throughput: FLUX int8-turbo step latency and
images/sec/chip at B = 1, 2, 4 (1024px).

MEASURED 2026-08-17 (one v5e): B=1 362.6 ms (199 img/h), B=2 902.7 ms
(160 img/h) — batching currently scales SUPER-linearly in-model even
though every standalone component scales sub-linearly (flash 1.48x,
int8 dot 1.59x at 2x work; compiled temp memory is only 743 MB, no HBM
pressure). Chain kernel and fused-LN producer are not the cause
(disabling either makes B=2 slower still). Until the scheduler-level
cause is found, single-image latency is the serving sweet spot on one
chip; scale throughput by replicating across chips (dp) instead."""
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
