"""Gradio text-to-image demo for FLUX on TPU.

TPU-native counterpart of the reference's demo app
(/root/reference/app/flux.1/t2i/run_gradio.py): model/precision selection,
LoRA hot-swap, safety checker, seed control. Gradio is an optional
dependency — the module import-gates it with instructions rather than
failing at collection time.

Run:
  python -m app.flux.t2i -m dev \
      --transformer svdq-int4_r32-flux.1-dev.safetensors \
      --vae vae.safetensors --t5 t5.safetensors --clip clip.safetensors
"""

from __future__ import annotations

import argparse
import random
import time

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - optional dep
    raise SystemExit(
        "gradio is required for the demo app: pip install gradio\n"
        "(the engine itself has no gradio dependency)"
    ) from e

import jax
import numpy as np

from nunchaku_tpu import (
    FluxPipeline,
    load_autoencoder,
    load_clip_text,
    load_flux_transformer,
    load_t5_encoder,
)
from nunchaku_tpu.lora.flux.apply import update_lora_params
from nunchaku_tpu.lora.flux.convert import compose_lora
from nunchaku_tpu.models.safety_checker import SafetyChecker

MAX_SEED = np.iinfo(np.int32).max

DEFAULT_STEPS = {"schnell": 4, "dev": 28}
DEFAULT_GUIDANCE = {"schnell": 0.0, "dev": 3.5}

EXAMPLES = [
    "a photo of an astronaut riding a horse on the moon",
    "a cyberpunk cityscape at dusk, neon rain, cinematic lighting",
    "an oil painting of a fox reading a book under a lamp",
]


def get_args() -> argparse.Namespace:
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", default="dev", choices=["schnell", "dev"])
    p.add_argument("--transformer", required=True, help="nunchaku checkpoint")
    p.add_argument("--vae", required=True)
    p.add_argument("--t5", required=True)
    p.add_argument("--clip", required=True)
    p.add_argument(
        "-p", "--precision", choices=["int4", "nvfp4", "int8", "w4a8"],
        default=None, help="engine precision (None = checkpoint native)",
    )
    p.add_argument("--no-safety-checker", action="store_true")
    p.add_argument("--lora", nargs="*", default=[], help="LoRA safetensors path(s)")
    p.add_argument("--lora-strength", type=float, default=1.0)
    p.add_argument("--cache", choices=["fb", "double_fb", "teacache"], default=None)
    p.add_argument("--port", type=int, default=7860)
    return p.parse_args()


def main() -> None:
    args = get_args()
    transformer = load_flux_transformer(args.transformer, precision=args.precision)
    if args.lora:
        from nunchaku_tpu.utils.safetensors import load_safetensors

        composed = compose_lora(
            [(load_safetensors(p)[0], 1.0) for p in args.lora]
        )
        update_lora_params(transformer, composed, strength=args.lora_strength)
    pipe = FluxPipeline(
        transformer,
        vae=load_autoencoder(args.vae),
        text_encoder=load_clip_text(args.clip),
        text_encoder_2=load_t5_encoder(args.t5),
    )
    checker = SafetyChecker(disabled=args.no_safety_checker)

    def generate(prompt, seed, randomize, steps, guidance, height, width):
        if not checker(prompt):
            return None, seed, "Prompt flagged by the safety checker."
        if randomize:
            seed = random.randint(0, MAX_SEED)
        t0 = time.perf_counter()
        out = pipe(
            prompt,
            num_inference_steps=int(steps),
            guidance_scale=float(guidance),
            height=int(height),
            width=int(width),
            seed=int(seed),
            cache=args.cache,
        )
        dt = time.perf_counter() - t0
        img = np.asarray(out.images[0], np.float32)  # (H, W, 3) in [0, 1]
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        return img, seed, f"{dt:.2f} s on {jax.devices()[0].device_kind}"

    with gr.Blocks(title=f"nunchaku-tpu FLUX.1-{args.model}") as demo:
        gr.Markdown(
            f"# FLUX.1-{args.model} — nunchaku_tpu\n"
            "SVDQuant 4-bit diffusion inference on TPU."
        )
        with gr.Row():
            with gr.Column():
                prompt = gr.Textbox(label="Prompt", lines=3)
                with gr.Row():
                    seed = gr.Slider(0, MAX_SEED, step=1, value=0, label="Seed")
                    randomize = gr.Checkbox(value=True, label="Random seed")
                with gr.Row():
                    steps = gr.Slider(
                        1, 50, step=1, value=DEFAULT_STEPS[args.model], label="Steps"
                    )
                    guidance = gr.Slider(
                        0.0, 10.0, step=0.1,
                        value=DEFAULT_GUIDANCE[args.model], label="Guidance",
                    )
                with gr.Row():
                    height = gr.Slider(256, 2048, step=64, value=1024, label="Height")
                    width = gr.Slider(256, 2048, step=64, value=1024, label="Width")
                btn = gr.Button("Generate", variant="primary")
                gr.Examples(EXAMPLES, inputs=prompt)
            with gr.Column():
                out = gr.Image(label="Result")
                used_seed = gr.Number(label="Seed used")
                status = gr.Textbox(label="Status", interactive=False)
        btn.click(
            generate,
            inputs=[prompt, seed, randomize, steps, guidance, height, width],
            outputs=[out, used_seed, status],
        )
    demo.queue().launch(server_port=args.port)


if __name__ == "__main__":
    main()
