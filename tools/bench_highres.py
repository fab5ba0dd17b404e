"""2048px high-resolution FLUX step: dense vs block-sparse attention.

The reference's answer to ~16K-token attention is its block-sparse kernel
(src/FluxModel.cpp:130-267 + third_party/Block-Sparse-Attention); ours is
ops/attention.py block_sparse_attention (pooled top-k + scalar-prefetch kv
index map). This benchmarks the FULL transformer step at 2048px with
sparsity 0 / 0.5 / 0.75 on the real chip.
"""

import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from nunchaku_tpu.models.transformers.transformer_flux import (
    FluxConfig, FluxTransformer2DModel,
)
from __graft_entry__ import _flux_inputs

S_IMG, S_TXT = 16384, 512  # 2048px: (2048/16)^2 image tokens

PREC = "int8"
if "-p" in sys.argv:
    i = sys.argv.index("-p")
    PREC = sys.argv[i + 1]
    del sys.argv[i : i + 2]

cfg = FluxConfig(precision=PREC)
args = _flux_inputs(cfg, B=1, S_img=S_IMG, S_txt=S_TXT)

import gc

for ratio in [float(x) for x in sys.argv[1:]] or (0.0, 0.5, 0.75):
    model = FluxTransformer2DModel.dummy_init(cfg)
    model.set_stream_dtype(jnp.bfloat16)
    if ratio > 0:
        model.set_attention_impl("blocksparse", sparsity_ratio=ratio)
    fwd = jax.jit(lambda m, *a: m(*a))
    t0 = time.time()
    out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print(f"[{PREC}] sparsity {ratio}: compile+first {time.time()-t0:.1f} s", flush=True)
    n = 4
    t0 = time.perf_counter()
    for _ in range(n - 1):
        out = fwd(model, *args)
    out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    print(f"[{PREC}] sparsity {ratio}: step {dt*1e3:.1f} ms", flush=True)
    # 12.3 GB of int8 weights per model: free before the next ratio compiles
    del out, fwd, model
    gc.collect()
    jax.clear_caches()
