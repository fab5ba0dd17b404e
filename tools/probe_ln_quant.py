"""Standalone A/B: XLA LN+modulate+int8-quantize vs the Pallas fused
producer (ops/quantize.py ln_mod_quant_int8) at FLUX shapes.

Directional only (standalone probes carry ~1 ms fixed dispatch cost);
decision-grade numbers need the in-model A/B.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from nunchaku_tpu.ops.quantize import ln_mod_quant_int8, quantize_w4a4_act_fuse_lora
from nunchaku_tpu.models.normalization import layer_norm

rng = np.random.default_rng(0)
B, S, K, R = 1, 4096, 3072, 32
x = jnp.asarray(rng.normal(size=(B, S, K)), jnp.bfloat16)
sc = jnp.asarray(rng.normal(size=(B, K)) * 0.1, jnp.bfloat16)
sh = jnp.asarray(rng.normal(size=(B, K)) * 0.1, jnp.bfloat16)
sm = jnp.asarray(np.abs(rng.normal(size=(K,))) + 0.5, jnp.bfloat16)
pd = jnp.asarray(rng.normal(size=(K, R)) * 0.05, jnp.bfloat16)

@jax.jit
def xla_path(x, sc, sh, sm, pd):
    y = layer_norm(x) * (1 + sc.astype(jnp.float32))[:, None] + sh.astype(jnp.float32)[:, None]
    y2 = y.reshape(B * S, K).astype(jnp.bfloat16)
    return quantize_w4a4_act_fuse_lora(y2, pd, sm, precision="int8")

@jax.jit
def pallas_path(x, sc, sh, sm, pd):
    return ln_mod_quant_int8(x, sc, sh, sm, pd)

def bench(f, name, n=50):
    out = f(x, sc, sh, sm, pd)
    _ = float(jnp.sum(out[0].astype(jnp.float32)))  # sync through tunnel
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(x, sc, sh, sm, pd)
    _ = float(jnp.sum(out[0].astype(jnp.float32))) + float(jnp.sum(out[1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    return out

o1 = bench(xla_path, "xla   ")
o2 = bench(pallas_path, "pallas")
print("match frac:", float(jnp.mean((o1[0].reshape(-1) == o2[0].reshape(-1)).astype(jnp.float32))))
