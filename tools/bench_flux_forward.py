import sys, time, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from nunchaku_tpu.models.transformers.transformer_flux import FluxConfig, FluxTransformer2DModel
from __graft_entry__ import _flux_inputs

prec = sys.argv[1] if len(sys.argv) > 1 else "int4"
cfg = FluxConfig(precision=prec)
model = FluxTransformer2DModel.dummy_init(cfg)
if "fused" in sys.argv:
    model = model.enable_fused_qkv_prep()
args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)
fwd = jax.jit(lambda m, *a: m(*a))
t0 = time.time()
out = fwd(model, *args)
_ = float(jnp.sum(out.astype(jnp.float32)))
print(f"[{prec}] compile+first: {time.time()-t0:.1f} s")
n = 8
t0 = time.perf_counter()
for _ in range(n):
    out = fwd(model, *args)
_ = float(jnp.sum(out.astype(jnp.float32)))
dt = (time.perf_counter() - t0) / n
print(f"[{prec}] forward: {dt*1e3:.1f} ms -> dev-50step: {dt*50:.2f} s  vs_baseline {10.83/(dt*50):.3f}")
