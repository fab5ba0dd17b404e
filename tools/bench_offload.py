"""Offload benchmark: per-block streaming vs resident weights.

Measures (1) raw host<->device link bandwidth, (2) resident step latency,
(3) offloaded step latency, and reports the overlap efficiency
``offloaded / max(transfer_lower_bound, resident)`` — 1.0 means the
lookahead prefetch fully hides whichever side is slower.

IMPORTANT sandbox caveat (measured 2026-08-16): this environment reaches
its TPU through a network tunnel at ~18 MB/s host<->device — about 1000x
slower than a co-located TPU host's DMA (~10+ GB/s). Offloading a 6-12 GB
model is therefore transfer-bound here by construction; run this tool on a
real TPU VM for production numbers. The small default config still
verifies that compute/transfer overlap works (efficiency ~1).

  python tools/bench_offload.py --layers 2 --single-layers 2
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np
import jax.numpy as jnp


def measure_bandwidth(mb=32):
    dev = jax.devices()[0]
    x = np.zeros((mb, 1024, 1024), np.int8)
    t0 = time.perf_counter()
    xd = jax.device_put(x, dev)
    _ = float(jnp.sum(xd[:, :2, :2].astype(jnp.float32)))
    return mb / (time.perf_counter() - t0)  # MB/s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--single-layers", type=int, default=2)
    p.add_argument("--precision", default="int8")
    p.add_argument("--s-img", type=int, default=1024)
    p.add_argument("--lookahead", type=int, default=2)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )
    from nunchaku_tpu.utils.offload import OffloadedFluxForward
    from __graft_entry__ import _flux_inputs

    bw = measure_bandwidth()
    print(f"link bandwidth: {bw:.1f} MB/s")

    cfg = FluxConfig(num_layers=args.layers, num_single_layers=args.single_layers,
                     precision=args.precision)
    model = FluxTransformer2DModel.dummy_init(cfg)
    margs = _flux_inputs(cfg, B=1, S_img=args.s_img, S_txt=256)

    fwd = jax.jit(lambda m, *a: m(*a))
    out = fwd(model, *margs)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(model, *margs)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    resident = (time.perf_counter() - t0) / args.iters
    print(f"resident step: {resident*1e3:.0f} ms")

    nbytes = sum(
        x.nbytes for x in jax.tree.leaves(model.transformer_blocks)
    ) + sum(x.nbytes for x in jax.tree.leaves(model.single_transformer_blocks))
    transfer_lb = nbytes / (bw * 1e6)
    print(f"block weights: {nbytes/2**20:.0f} MB -> transfer lower bound {transfer_lb*1e3:.0f} ms")

    off = OffloadedFluxForward(model, lookahead=args.lookahead)
    out = off(*margs)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = off(*margs)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    offloaded = (time.perf_counter() - t0) / args.iters
    bound = max(transfer_lb, resident)
    print(f"offloaded step (lookahead={args.lookahead}): {offloaded*1e3:.0f} ms "
          f"(vs bound {bound*1e3:.0f} ms, overlap efficiency {bound/offloaded:.2f})")


if __name__ == "__main__":
    main()
