"""Latency + memory budget check on the real chip.

Counterpart of the reference's budget asserts:
  * latency — tests/flux/test_flux_speed.py:14-74 (mean e2e < expected*1.1,
    per-GPU table {3090: 16.05, 4090: 6.50, 5090: 4.79} for schnell-30-step)
  * memory  — tests/flux/test_flux_memory.py:10-46 (max_memory_reserved
    under 17/13/12/6 GiB depending on qencoder/offload)

TPU budgets (1 chip): latency keyed off BASELINE.json's north-star
(FLUX.1-dev 50-step 1024px vs the 4090 ~10.8 s scaled number); memory via
``device.memory_stats()['peak_bytes_in_use']``.

Run directly (``python tools/check_budgets.py``) or via
tests/test_budgets.py (subprocess, so the pytest CPU conftest doesn't
apply). Exits non-zero on a busted budget; prints one JSON line per check.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

# Budgets. Latency: dev-50-step/1024px per image on one chip; the pass bar
# is the recorded BENCH number * 1.10 (regression guard), with the absolute
# north star (= 4090 baseline 10.83 s) reported alongside.
LATENCY_REGRESSION_BUDGET_S = float(os.environ.get("NUNCHAKU_TPU_LATENCY_BUDGET", "25.0"))
BASELINE_S = 10.83
# Memory: int8 FLUX transformer weights ~12.3 GiB; full-step peak must fit
# a 16 GiB v5e with headroom.
PEAK_HBM_BUDGET_GIB = float(os.environ.get("NUNCHAKU_TPU_HBM_BUDGET", "15.0"))


def main() -> int:
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )
    from __graft_entry__ import _flux_inputs

    dev = jax.devices()[0]
    cfg = FluxConfig(precision="int8")
    model = FluxTransformer2DModel.dummy_init(cfg)
    args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)

    @jax.jit
    def steps(m, x, *rest):
        def body(x, _):
            out = m(x, *rest)
            return out.astype(x.dtype) * 1e-3 + x, ()

        x, _ = jax.lax.scan(body, x, None, length=50)
        return x

    out = steps(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # warmup + compile
    t0 = time.perf_counter()
    out = steps(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    latency = time.perf_counter() - t0

    stats = dev.memory_stats() or {}
    peak_gib = stats.get("peak_bytes_in_use", 0) / 1024**3

    ok_lat = latency < LATENCY_REGRESSION_BUDGET_S
    ok_mem = peak_gib < PEAK_HBM_BUDGET_GIB
    print(json.dumps({
        "check": "latency", "seconds": round(latency, 3),
        "budget": LATENCY_REGRESSION_BUDGET_S,
        "vs_baseline": round(BASELINE_S / latency, 4), "ok": ok_lat,
    }))
    print(json.dumps({
        "check": "peak_hbm", "gib": round(peak_gib, 3),
        "budget_gib": PEAK_HBM_BUDGET_GIB, "ok": ok_mem,
    }))
    return 0 if (ok_lat and ok_mem) else 1


if __name__ == "__main__":
    sys.exit(main())
