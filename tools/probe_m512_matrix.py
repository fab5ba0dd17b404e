"""Isolate the M=512 int8 GEMM wall: scan-sliced vs invariant weights vs
M scaling, with full-output consumption and value-sync timing."""

import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

rng = np.random.default_rng(0)
K, N, L = 3072, 9216, 4


def mm(a, w):
    return jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def timeit(f, n=8):
    _ = float(f())
    t0 = time.perf_counter()
    for _ in range(n - 1):
        f()
    _ = float(f())
    return (time.perf_counter() - t0) / n


for M in (512, 1024, 2048, 4608):
    qa = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    wstack = jnp.asarray(rng.integers(-127, 127, (L, K, N)), jnp.int8)
    w0 = wstack[0]
    FL = 2 * M * K * N * L

    @jax.jit
    def scanned(qa, wstack):
        def body(c, w):
            return c + jnp.sum(mm(qa, w)) // 1024, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), wstack)
        return c

    @jax.jit
    def invariant(qa, w0):
        def body(c, _):
            return c + jnp.sum(mm(qa, w0)) // 1024, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), jnp.arange(L))
        return c

    ts = timeit(lambda: scanned(qa, wstack))
    ti = timeit(lambda: invariant(qa, w0))
    print(
        f"M={M:5d}: scan-sliced {FL/ts/1e12:6.1f} TF/s ({ts/L*1e3:6.3f} ms/gemm)"
        f" | invariant {FL/ti/1e12:6.1f} TF/s ({ti/L*1e3:6.3f} ms/gemm)",
        flush=True,
    )
