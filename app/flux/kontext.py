"""Gradio image-editing demo for FLUX.1-Kontext on TPU.

TPU-native counterpart of the reference's Kontext demo
(/root/reference/app/flux.1/kontext/run_gradio.py): upload an image, type an
edit instruction, the reference image is VAE-encoded and sequence-appended
(rope frame 1) so the transformer attends jointly (pipeline prepare_kontext).

Run:
  python -m app.flux.kontext --transformer svdq-int4_r32-flux.1-kontext-dev.safetensors \
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
from nunchaku_tpu.models.safety_checker import SafetyChecker

MAX_SEED = np.iinfo(np.int32).max

EXAMPLES = [
    "Make the sky a dramatic sunset",
    "Turn the scene into a watercolor painting",
    "Add falling snow",
]


def get_args() -> argparse.Namespace:
    p = argparse.ArgumentParser()
    p.add_argument("--transformer", required=True, help="kontext nunchaku checkpoint")
    p.add_argument("--vae", required=True)
    p.add_argument("--t5", required=True)
    p.add_argument("--clip", required=True)
    p.add_argument("-p", "--precision",
                   choices=["int4", "nvfp4", "int8", "w4a8"], default=None)
    p.add_argument("--no-safety-checker", action="store_true")
    p.add_argument("--cache", choices=["fb", "double_fb", "teacache"], default=None)
    p.add_argument("--port", type=int, default=7860)
    return p.parse_args()


def main() -> None:
    args = get_args()
    pipe = FluxPipeline(
        load_flux_transformer(args.transformer, precision=args.precision),
        vae=load_autoencoder(args.vae),
        text_encoder=load_clip_text(args.clip),
        text_encoder_2=load_t5_encoder(args.t5),
    )
    checker = SafetyChecker(disabled=args.no_safety_checker)

    def edit(image, prompt, seed, randomize, steps, guidance):
        if image is None:
            return None, seed, "Upload a reference image first."
        if not checker(prompt):
            return None, seed, "Prompt flagged by the safety checker."
        if randomize:
            seed = random.randint(0, MAX_SEED)
        # snap to multiples of 16 px (latent patch grid)
        h = (image.shape[0] // 16) * 16
        w = (image.shape[1] // 16) * 16
        ref = (image[:h, :w].astype(np.float32) / 255.0)[None]
        t0 = time.perf_counter()
        out = pipe(
            prompt,
            height=h,
            width=w,
            num_inference_steps=int(steps),
            guidance_scale=float(guidance),
            seed=int(seed),
            image=ref,
            cache=args.cache,
        )
        dt = time.perf_counter() - t0
        img = np.asarray(out.images[0], np.float32)
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        return img, seed, f"{dt:.2f} s on {jax.devices()[0].device_kind}"

    with gr.Blocks(title="nunchaku-tpu FLUX.1-Kontext") as demo:
        gr.Markdown(
            "# FLUX.1-Kontext — nunchaku_tpu\n"
            "In-context image editing, SVDQuant 4-bit on TPU."
        )
        with gr.Row():
            with gr.Column():
                image = gr.Image(label="Reference image", type="numpy")
                prompt = gr.Textbox(label="Edit instruction", lines=2)
                with gr.Row():
                    seed = gr.Slider(0, MAX_SEED, step=1, value=0, label="Seed")
                    randomize = gr.Checkbox(value=True, label="Random seed")
                with gr.Row():
                    steps = gr.Slider(1, 50, step=1, value=28, label="Steps")
                    guidance = gr.Slider(0.0, 10.0, step=0.1, value=2.5,
                                         label="Guidance")
                btn = gr.Button("Edit", variant="primary")
                gr.Examples(EXAMPLES, inputs=prompt)
            with gr.Column():
                out = gr.Image(label="Result")
                used_seed = gr.Number(label="Seed used")
                status = gr.Textbox(label="Status", interactive=False)
        btn.click(
            edit,
            inputs=[image, prompt, seed, randomize, steps, guidance],
            outputs=[out, used_seed, status],
        )
    demo.queue().launch(server_port=args.port)


if __name__ == "__main__":
    main()
