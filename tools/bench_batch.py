"""Batched serving throughput: FLUX int8-turbo step latency and
images/sec/chip at B = 1, 2, 4 (1024px).

MEASURED 2026-08-20 (one v5e, post native-(B,S,K) operands ac446d1):
B=1 310.8 ms (232 img/h), B=2 611.1 ms (236 img/h) = **1.97x** — the
native 3D GEMM operands closed the batch anomaly (history: 2.49x with
flattened operands and XLA layout copies at the custom-call boundary,
2.13x after the head-gridded qkv_rope_producer, 1.97x once the Pallas
routes vmap the 2D kernel over an un-flattened (B,S,K) operand). Batch
now scales sublinearly-per-image; single-image latency remains best
per-request, B=2 edges ahead on throughput/chip. Scale further by
replicating across chips (dp)."""
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
