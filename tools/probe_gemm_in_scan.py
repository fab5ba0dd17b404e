"""Probe: int8 GEMM throughput when weights are scan-sliced (in-model
condition) vs loop-invariant (standalone condition).

The model stacks per-layer weights into (L, K, N) arrays and slices them
inside lax.scan — XLA may relayout/copy the slice every iteration, which
the standalone tuner (tools/tune_gemm_impl.py) never sees. This probe
quantifies that gap for both the XLA int8 dot and the Pallas kernel.
"""

import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4, _gemm_w8a8_xla

L = 4
rng = np.random.default_rng(0)

SHAPES = [tuple(int(x) for x in s.split(",")) for s in sys.argv[1:]] or [
    (4608, 3072, 9216),
    (512, 3072, 9216),
    (4608, 12288, 3072),
]


def xla_mm(qa, asc, w, ws):
    return _gemm_w8a8_xla(qa, asc, w, ws, None, None, None, jnp.bfloat16)


def pallas_mm(qa, asc, w, ws):
    return svdq_gemm_w4a4(qa, asc, w, ws, precision="int8")


def timeit(f, n=6):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


for (M, K, N) in SHAPES:
    qa = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    asc = jnp.ones((1, M), jnp.float32)
    wstack = jnp.asarray(rng.integers(-127, 127, (L, K, N)), jnp.int8)
    ws = jnp.ones((1, N), jnp.float32)
    FL = 2 * M * K * N * L

    res = {}
    for name, mm in (("xla", xla_mm), ("pallas", pallas_mm)):
        # scan-sliced weights: the in-model condition
        @jax.jit
        def scanned(qa, wstack, mm=mm):
            def body(c, w):
                o = mm(qa, asc, w, ws)
                return c + o[:1, :1].astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.zeros((1, 1), jnp.float32), wstack)
            return c

        # loop-invariant weight, scanned over dummy xs: same op count, but
        # the weight is not sliced per iteration
        w0 = wstack[0]

        @jax.jit
        def invariant(qa, w0, mm=mm):
            def body(c, _):
                o = mm(qa, asc, w0, ws)
                return c + o[:1, :1].astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.zeros((1, 1), jnp.float32),
                                jnp.arange(L))
            return c

        ts = timeit(lambda: scanned(qa, wstack))
        print(f"  ({M},{K},{N}) {name} scan {FL / ts / 1e12:6.1f} TF/s", flush=True)
        ti = timeit(lambda: invariant(qa, w0))
        print(f"  ({M},{K},{N}) {name} inv  {FL / ti / 1e12:6.1f} TF/s", flush=True)
