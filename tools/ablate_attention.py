"""In-model attention cost: stub the flash kernel with identity and diff.

Usage: python tools/ablate_attention.py [full|noattn|norope]
  full    - unmodified forward (baseline)
  noattn  - flash_attention returns q (kernel cost removed; transposes,
            rmsnorm, rope, GEMMs all remain)
  norope  - additionally skip rmsnorm+rope (qkv_norm_rope returns raw
            split+transpose)
"""

import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

mode = sys.argv[1] if len(sys.argv) > 1 else "full"

import nunchaku_tpu.models.attention as A

if mode in ("noattn", "norope"):
    def fake_attend(self, q, k, v):
        return q + k[:, :, :1, :] * 0 + v[:, :, :1, :] * 0
    A.FluxAttention._attend = fake_attend

if mode == "norope":
    def fake_prep(qkv, head_dim, norm_q, norm_k, rot, eps=1e-6):
        b, s, _ = qkv.shape
        heads = qkv.shape[-1] // 3 // head_dim
        q, k, v = jnp.split(qkv, 3, axis=-1)
        def hf(t):
            return t.reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)
        return hf(q), hf(k), hf(v)
    A.qkv_norm_rope = fake_prep

from nunchaku_tpu.models.transformers.transformer_flux import FluxConfig, FluxTransformer2DModel
from __graft_entry__ import _flux_inputs

cfg = FluxConfig(precision="int8")
model = FluxTransformer2DModel.dummy_init(cfg)
args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)
fwd = jax.jit(lambda m, *a: m(*a))
out = fwd(model, *args)
_ = float(jnp.sum(out.astype(jnp.float32)))
n = 8
t0 = time.perf_counter()
for _ in range(n):
    out = fwd(model, *args)
_ = float(jnp.sum(out.astype(jnp.float32)))
print(f"[{mode}] forward: {(time.perf_counter()-t0)/n*1e3:.1f} ms")
