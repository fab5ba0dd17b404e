import sys, time, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from nunchaku_tpu.ops.attention import flash_attention
B, H, S, D = 1, 24, 4608, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
fl = 4 * B * H * S * S * D
def t(f, n=20):
    r = f(); _=float(jnp.sum(r.astype(jnp.float32)))
    t0=time.perf_counter()
    for _ in range(n): r=f()
    _=float(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter()-t0)/n
for kw in [dict(bq=512,bkv=1024),dict(bq=512,bkv=768),dict(bq=768,bkv=768),
           dict(bq=384,bkv=768),dict(bq=768,bkv=1536),dict(bq=512,bkv=1536),
           dict(bq=1536,bkv=768),dict(bq=768,bkv=2304)]:
    try:
        dt=t(lambda: flash_attention(q,k,v,**kw))
        print(f"{kw}: {dt*1e3:.3f} ms {fl/dt/1e12:.1f} TF/s")
    except Exception as e:
        print(kw, "FAIL", str(e).splitlines()[0][:90])
