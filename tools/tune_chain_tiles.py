"""In-model tile sweep for the GELU->requantize chain kernel
(ops/gemm.svdq_gemm_w8a8_gelu_quant): full int8-turbo FLUX step per
(bm, bn, bk) candidate. Current defaults: bm=512 bn=1536 bk=3072."""
import sys, time, os, functools, gc
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import nunchaku_tpu.models.attention as A
import nunchaku_tpu.models.transformers.transformer_flux as TF
from nunchaku_tpu.ops.gemm import svdq_gemm_w8a8_gelu_quant as real_chain
from __graft_entry__ import _flux_inputs

cfg = TF.FluxConfig(precision="int8")
args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)

CANDS = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]] or [
    (512, 1536, 3072), (256, 1536, 3072), (512, 3072, 3072),
    (512, 768, 3072), (1024, 1536, 3072), (512, 1536, 1536),
]

for bm, bn, bk in CANDS:
    A.svdq_gemm_w8a8_gelu_quant = functools.partial(real_chain, bm=bm, bn=bn, bk=bk)
    model = TF.FluxTransformer2DModel.dummy_init(cfg)
    model.set_stream_dtype(jnp.bfloat16)
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
        print(f"bm={bm} bn={bn} bk={bk}: step {dt*1e3:.1f} ms (compile {c:.0f}s)", flush=True)
    except Exception as e:
        print(f"bm={bm} bn={bn} bk={bk}: FAIL {str(e)[:120]}", flush=True)
    del model, fwd
    gc.collect(); jax.clear_caches()
