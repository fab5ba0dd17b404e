"""Capture a device trace of FLUX forward steps and print the top XLA/Pallas
ops by total device time.

The budget ladder (budget_step.py) measures *removable* cost by ablation;
this reads the actual schedule — what the chip spent time on, fusion by
fusion. Parses the xplane proto directly (tensorboard_plugin_profile's
viewer is not usable headless through the tunnel).

  python tools/trace_step.py [precision] [B] [steps]   # default int8 1 3
"""

import collections
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main():
    precision = sys.argv[1] if len(sys.argv) > 1 else "int8"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import nunchaku_tpu.models.transformers.transformer_flux as TF
    from __graft_entry__ import _flux_inputs

    cfg = TF.FluxConfig(precision=precision)
    model = TF.FluxTransformer2DModel.dummy_init(cfg)
    model.set_stream_dtype(jnp.bfloat16)
    model.enable_fused_qkv_prep()
    args = _flux_inputs(cfg, B=B, S_img=4096, S_txt=512)
    fwd = jax.jit(lambda m, *a: m(*a))

    out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # sync (tunnel-safe)

    logdir = f"/tmp/trace_step_{precision}_b{B}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(nsteps):
        out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    jax.profiler.stop_trace()

    summarize(logdir, nsteps)


def summarize(logdir: str, nsteps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = collections.Counter()
        cnt = collections.Counter()
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name:
                # on TPU planes the op line is usually "XLA Ops"; fall back
                # to the busiest line below if absent
                pass
        lines = {ln.name: ln for ln in plane.lines}
        op_line = lines.get("XLA Ops")
        if op_line is None and plane.lines:
            op_line = max(plane.lines, key=lambda ln: len(ln.events))
        if op_line is None:
            continue
        for ev in op_line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            tot[name] += ev.duration_ps
            cnt[name] += 1
        total_ps = sum(tot.values())
        print(f"\n== plane: {plane.name}  line: {op_line.name}  "
              f"total {total_ps/1e12/nsteps*1e3:.1f} ms/step over {nsteps} steps")
        print(f"{'ms/step':>9} {'%':>5} {'count':>6}  op")
        for name, ps in tot.most_common(40):
            print(f"{ps/1e12/nsteps*1e3:9.2f} {100*ps/total_ps:5.1f} "
                  f"{cnt[name]//nsteps:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
