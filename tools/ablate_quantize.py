import sys, time, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import nunchaku_tpu.ops.quantize as Q
from nunchaku_tpu.ops.reference import GELU_SHIFT

mode = sys.argv[1]
real = Q.quantize_w4a4_act_fuse_lora.__wrapped__ if hasattr(Q.quantize_w4a4_act_fuse_lora, "__wrapped__") else None

def make_fake(mode):
    def fake(x, proj_down, smooth=None, precision="int8", act_unsigned=False, fuse_glu=False):
        m, k = x.shape
        r = proj_down.shape[1]
        if mode == "nolora":
            la = jnp.zeros((m, r), jnp.float32) + x[0, 0].astype(jnp.float32)
        else:
            la = jnp.dot(x.astype(jnp.bfloat16), proj_down.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        xs = x.astype(jnp.float32)
        if mode == "noabsmax":
            scale = jnp.full((m,), 0.01, jnp.float32) + x[0, 0].astype(jnp.float32) * 0
            absdep = x[:, 0].astype(jnp.float32) * 0  # keep x alive
            scale = scale + absdep
        else:
            scale = jnp.max(jnp.abs(xs), axis=-1) / 127.0
        if mode == "noqpass":
            q = jnp.zeros((m, k), jnp.int8) + x[:, :1].astype(jnp.int8) * 0
        else:
            rcp = jnp.where(scale == 0, 0.0, 1.0 / jnp.where(scale == 0, 1.0, scale))
            q = jnp.clip(jnp.round(xs * rcp[:, None]), -127, 127).astype(jnp.int8)
        return q, scale.reshape(1, m), la
    return fake

if mode != "full":
    import functools
    Q.quantize_w4a4_act_fuse_lora = jax.jit(make_fake(mode), static_argnames=("precision","act_unsigned","fuse_glu"))
import nunchaku_tpu.models.linear as L
L.quantize_w4a4_act_fuse_lora = Q.quantize_w4a4_act_fuse_lora

from nunchaku_tpu.models.transformers.transformer_flux import FluxConfig, FluxTransformer2DModel
from __graft_entry__ import _flux_inputs
cfg = FluxConfig(precision="int8")
model = FluxTransformer2DModel.dummy_init(cfg)
args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)
fwd = jax.jit(lambda m, *a: m(*a))
out = fwd(model, *args); _=float(jnp.sum(out.astype(jnp.float32)))
n=8
t0=time.perf_counter()
for _ in range(n): out = fwd(model, *args)
_=float(jnp.sum(out.astype(jnp.float32)))
print(f"[{mode}] forward: {(time.perf_counter()-t0)/n*1e3:.1f} ms")
