"""Multi-chip FLUX inference with sequence (context) parallelism —
the high-resolution scaling mode.

The (txt + img) token sequence shards over the 'sp' mesh axis with weights
replicated: every per-token op runs locally and only attention communicates
(exact kv ppermute ring, parallel/sp.py). At 2048 px (16K image tokens) the
O(S^2) attention and the activations dominate — sp splits both n ways.
Combine with tensor parallelism on a 2D mesh via parallelize_2d when weight
HBM must also shrink. Validates on a virtual CPU mesh (--force-cpu-devices).
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True)
    ap.add_argument("--vae")
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("--sp", type=int, default=4)
    ap.add_argument("--tp", type=int, default=1,
                    help=">1: 2D sp x tp mesh (parallelize_2d)")
    ap.add_argument("--force-cpu-devices", type=int, default=0,
                    help="debug: N virtual CPU devices instead of real chips")
    ap.add_argument("--prompt", default="A cat holding a sign that says hello world")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="flux_sp.npy")
    args = ap.parse_args()

    if args.force_cpu_devices:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from nunchaku_tpu import (
        FluxPipeline,
        load_autoencoder,
        load_clip_text,
        load_flux_transformer,
        load_t5_encoder,
    )
    from nunchaku_tpu.parallel.sp import parallelize_2d, parallelize_sequence
    from nunchaku_tpu.pipeline.pipeline_flux import make_img_ids, unpack_latents
    from nunchaku_tpu.pipeline.scheduler import euler_step, flux_sigmas

    n = args.sp * args.tp
    transformer = load_flux_transformer(args.transformer)
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae) if args.vae else None,
        text_encoder=load_clip_text(args.clip) if args.clip else None,
        text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
    )
    prompt_embeds, pooled = pipe.encode_prompt([args.prompt])

    if args.tp > 1:
        mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(args.sp, args.tp),
                    ("sp", "tp"))
        sharded, forward = parallelize_2d(transformer, mesh)
    else:
        mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("sp",))
        sharded, forward = parallelize_sequence(transformer, mesh)

    lh, lw = args.size // 8, args.size // 8
    s_img = (lh // 2) * (lw // 2)
    assert s_img % args.sp == 0 and prompt_embeds.shape[1] % args.sp == 0
    lat = jax.random.normal(
        jax.random.PRNGKey(args.seed), (1, s_img, 64), jnp.float32
    )
    img_ids = make_img_ids(lh // 2, lw // 2)
    txt_ids = jnp.zeros((prompt_embeds.shape[1], 3), jnp.int32)
    guidance = jnp.full((1,), args.guidance, jnp.float32)
    sigmas = flux_sigmas(args.steps, s_img)

    for i in range(args.steps):
        t = jnp.full((1,), float(sigmas[i]), jnp.float32)
        vel = forward(sharded, lat.astype(jnp.bfloat16), prompt_embeds, pooled,
                      t, img_ids, txt_ids, guidance)
        lat = euler_step(lat, vel.astype(jnp.float32),
                         float(sigmas[i]), float(sigmas[i + 1]))

    result = lat.astype(jnp.bfloat16)
    if pipe.vae is not None:
        result = pipe.vae.decode(unpack_latents(result, lh, lw).astype(jnp.bfloat16))
    np.save(args.out, np.asarray(result, np.float32))
    print(f"saved {args.out} shape={result.shape}")


if __name__ == "__main__":
    main()
