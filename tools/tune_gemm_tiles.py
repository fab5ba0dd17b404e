import sys, time, itertools, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4
rng = np.random.default_rng(0)
def t(f, n=30):
    r=f(); _=float(jnp.sum(r.astype(jnp.float32)))
    t0=time.perf_counter()
    for _ in range(n): r=f()
    _=float(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter()-t0)/n
shapes = [  # (M, K, N) all int8-mode FLUX GEMMs
    (4608, 3072, 9216),   # single qkv / dual img qkv (4096->4608 pad)
    (4608, 3072, 12288),  # fc1
    (4608, 12288, 3072),  # fc2
    (4608, 3072, 3072),   # attn out
    (512, 3072, 9216),    # txt qkv
    (512, 3072, 12288),   # txt fc1
    (512, 12288, 3072),   # txt fc2
]
cands = [(768,1536,768),(512,1536,512),(768,1536,512),(768,3072,768),(512,1024,512),
         (768,1024,768),(256,1536,768),(512,768,512),(512,1536,768),(768,768,768)]
best = {}
for (M,K,N) in shapes:
    qa = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    at = jnp.asarray(rng.random((1, M)), jnp.float32)
    qw = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    wt = jnp.asarray(rng.random((1, N)), jnp.float32)
    la = jnp.asarray(rng.random((M, 32)), jnp.float32)
    pu = jnp.asarray(rng.random((32, N)), jnp.bfloat16)
    b = jnp.asarray(rng.random((N,)), jnp.bfloat16)
    res = []
    for bm, bn, bk in cands:
        if M % min(bm,M) or N % min(bn,N) or K % min(bk,K): continue
        try:
            dt = t(lambda bm=bm,bn=bn,bk=bk: svdq_gemm_w4a4(qa, at, qw, wt, la, pu, b, precision="int8", bm=bm, bn=bn, bk=bk))
            res.append((dt, (bm,bn,bk)))
        except Exception:
            pass
    res.sort()
    dflt = t(lambda: svdq_gemm_w4a4(qa, at, qw, wt, la, pu, b, precision="int8"))
    print(f"({M},{K},{N}): best {res[0][1]} {res[0][0]*1e3:.3f} ms ({2*M*K*N/res[0][0]/1e12:.0f} TF) | default {dflt*1e3:.3f} ms")
