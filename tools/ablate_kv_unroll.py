"""In-model A/B: flash kernel kv_unroll=1 (bkv=1536) vs kv_unroll=2
(2x768 interleaved) on the int8-turbo FLUX step."""
import sys, time, os, gc
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import nunchaku_tpu.models.transformers.transformer_flux as TF
from nunchaku_tpu.core.module import Module
from __graft_entry__ import _flux_inputs

cfg = TF.FluxConfig(precision="int8")
args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)

for unroll in ([int(x) for x in sys.argv[1:]] or (1, 2)):
    model = TF.FluxTransformer2DModel.dummy_init(cfg)
    model.set_stream_dtype(jnp.bfloat16)
    model.transformer_blocks.attn.attn_kv_unroll = unroll
    model.single_transformer_blocks.attn.attn_kv_unroll = unroll
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
    print(f"kv_unroll={unroll}: step {dt*1e3:.1f} ms (compile {c:.0f}s)", flush=True)
    del model, fwd, out
    gc.collect(); jax.clear_caches()
