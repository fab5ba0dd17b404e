"""Benchmark-dataset image generation driver (paper-reproduction harness).

Counterpart of the reference's app/flux.1/t2i/evaluate.py:1-84: iterate a
benchmark prompt set (MJHQ-30K / DCI in the reference; any JSON/txt prompt
list here — zero-egress sandboxes mount datasets locally), generate one
image per prompt with a per-prompt deterministic seed (hash of the prompt,
reference utils.hash_str_to_int), and save PNGs named by prompt index for
tools/get_metrics.py to score. ``--chunk-start/--chunk-step`` shard the
prompt list across independent processes (the reference's only
"multi-GPU" mode — embarrassingly parallel eval sharding, SURVEY §2.3).

  python tools/evaluate.py --prompts mjhq_prompts.json \
      --transformer svdq-int4-flux.1-schnell.safetensors --vae vae.safetensors \
      --t5 t5.safetensors --clip clip.safetensors -t 4 -g 0 -o results/int4/MJHQ

Without checkpoint args it smoke-runs the random-weight pipeline (tiny
config) so the harness itself is testable anywhere.
"""

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
if os.environ.get("JAX_PLATFORMS"):  # sitecustomize may pin the platform;
    # the config update (applied before first backend touch) wins over it
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def hash_str_to_int(s: str) -> int:
    """Deterministic prompt -> seed (reference app/flux.1/t2i/utils.py)."""
    return int(hashlib.sha256(s.encode()).hexdigest(), 16) % (2**31)


def load_prompts(path: str, max_size: int) -> list[str]:
    if path.endswith(".json"):
        data = json.load(open(path))
        if isinstance(data, dict):  # MJHQ meta_data.json: {name: {prompt}}
            prompts = [
                v["prompt"] if isinstance(v, dict) else str(v)
                for v in data.values()
            ]
        else:
            prompts = [p if isinstance(p, str) else p["prompt"] for p in data]
    else:
        prompts = [l.strip() for l in open(path) if l.strip()]
    return prompts[:max_size]


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", help="JSON/txt prompt list (MJHQ meta_data.json works)")
    ap.add_argument("--transformer", help="converted FLUX safetensors")
    ap.add_argument("--vae")
    ap.add_argument("--t5")
    ap.add_argument("--clip")
    ap.add_argument("-t", "--num-inference-steps", type=int, default=4)
    ap.add_argument("-g", "--guidance-scale", type=float, default=0.0)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("-o", "--output-root", default="results/eval")
    ap.add_argument("--chunk-step", type=int, default=1)
    ap.add_argument("--chunk-start", type=int, default=0)
    ap.add_argument("--max-dataset-size", type=int, default=5000)
    ap.add_argument("--smoke", action="store_true",
                    help="random tiny pipeline, 2 prompts (harness self-test)")
    args = ap.parse_args()
    assert args.chunk_step > 0 and 0 <= args.chunk_start < args.chunk_step

    if args.smoke or not args.transformer:
        from nunchaku_tpu.models.transformers.transformer_flux import (
            FluxConfig, FluxTransformer2DModel,
        )
        from nunchaku_tpu.pipeline.pipeline_flux import FluxPipeline

        cfg = FluxConfig(num_layers=1, num_single_layers=1,
                         num_attention_heads=2, joint_attention_dim=512,
                         pooled_projection_dim=256)
        pipe = FluxPipeline(
            FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
        )
        prompts = ["a cat", "a dog"]
        size = 128

        def generate(prompt, seed):
            pe = jax.random.normal(jax.random.PRNGKey(seed), (1, 64, 512), jnp.bfloat16)
            pool = jax.random.normal(jax.random.PRNGKey(seed + 1), (1, 256), jnp.bfloat16)
            out = pipe(prompt_embeds=pe, pooled_prompt_embeds=pool,
                       height=size, width=size,
                       num_inference_steps=args.num_inference_steps, seed=seed)
            lat = np.asarray(out.latents, np.float32)[0]  # (S, 64)
            side = int(np.sqrt(lat.shape[0]))
            img = lat[: side * side, :3].reshape(side, side, 3)  # proxy image
            return (img - img.min()) / (np.ptp(img) + 1e-9)
    else:
        from nunchaku_tpu import (
            FluxPipeline, load_autoencoder, load_clip_text,
            load_flux_transformer, load_t5_encoder,
        )

        pipe = FluxPipeline(
            load_flux_transformer(args.transformer),
            vae=load_autoencoder(args.vae) if args.vae else None,
            text_encoder=load_clip_text(args.clip) if args.clip else None,
            text_encoder_2=load_t5_encoder(args.t5) if args.t5 else None,
        )
        prompts = load_prompts(args.prompts, args.max_dataset_size)
        size = args.size

        def generate(prompt, seed):
            out = pipe(prompt=prompt, height=size, width=size,
                       num_inference_steps=args.num_inference_steps,
                       guidance_scale=args.guidance_scale, seed=seed)
            return np.asarray(out.images[0], np.float32)

    os.makedirs(args.output_root, exist_ok=True)
    indexed = list(enumerate(prompts))[args.chunk_start :: args.chunk_step]
    for i, prompt in indexed:
        path = os.path.join(args.output_root, f"{i:06d}.png")
        if os.path.exists(path):
            continue
        img = generate(prompt, hash_str_to_int(prompt))
        save_png(path, img)
        print(f"[{i + 1}/{len(prompts)}] {path}", flush=True)


if __name__ == "__main__":
    main()
