"""Gradio inpainting demo for FLUX.1-Fill on TPU.

TPU-native counterpart of the reference's fill demo
(/root/reference/app/flux.1/fill/run_gradio.py): paint a mask over the
upload; the masked image + patchified mask become the 320 extra
conditioning channels (pipeline prepare_fill).

Run:
  python -m app.flux.fill --transformer svdq-int4_r32-flux.1-fill-dev.safetensors \
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
import jax.numpy as jnp
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


def get_args() -> argparse.Namespace:
    p = argparse.ArgumentParser()
    p.add_argument("--transformer", required=True, help="fill nunchaku checkpoint")
    p.add_argument("--vae", required=True)
    p.add_argument("--t5", required=True)
    p.add_argument("--clip", required=True)
    p.add_argument("-p", "--precision",
                   choices=["int4", "nvfp4", "int8", "w4a8"], default=None)
    p.add_argument("--no-safety-checker", action="store_true")
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

    def fill(editor, prompt, seed, randomize, steps, guidance):
        if editor is None or editor.get("background") is None:
            return None, seed, "Upload an image and paint the region to fill."
        if not checker(prompt):
            return None, seed, "Prompt flagged by the safety checker."
        if randomize:
            seed = random.randint(0, MAX_SEED)
        bg = editor["background"]
        layers = editor.get("layers") or []
        h = (bg.shape[0] // 16) * 16
        w = (bg.shape[1] // 16) * 16
        img = (bg[:h, :w, :3].astype(np.float32) / 255.0)[None]
        mask = np.zeros((h, w), np.float32)
        for layer in layers:  # painted strokes: alpha > 0 marks the hole
            mask = np.maximum(mask, (layer[:h, :w, 3] > 0).astype(np.float32))
        cond = pipe.prepare_fill(
            jnp.asarray(img, jnp.float32), jnp.asarray(mask[None], jnp.float32)
        )
        t0 = time.perf_counter()
        out = pipe(
            prompt,
            height=h,
            width=w,
            num_inference_steps=int(steps),
            guidance_scale=float(guidance),
            seed=int(seed),
            control_latents=cond,
        )
        dt = time.perf_counter() - t0
        res = np.asarray(out.images[0], np.float32)
        res = np.clip(res * 255.0, 0, 255).astype(np.uint8)
        return res, seed, f"{dt:.2f} s on {jax.devices()[0].device_kind}"

    with gr.Blocks(title="nunchaku-tpu FLUX.1-Fill") as demo:
        gr.Markdown(
            "# FLUX.1-Fill — nunchaku_tpu\nInpainting, SVDQuant 4-bit on TPU."
        )
        with gr.Row():
            with gr.Column():
                editor = gr.ImageEditor(label="Image (paint the fill region)",
                                        type="numpy")
                prompt = gr.Textbox(label="Prompt", lines=2)
                with gr.Row():
                    seed = gr.Slider(0, MAX_SEED, step=1, value=0, label="Seed")
                    randomize = gr.Checkbox(value=True, label="Random seed")
                with gr.Row():
                    steps = gr.Slider(1, 50, step=1, value=50, label="Steps")
                    guidance = gr.Slider(0.0, 50.0, step=0.5, value=30.0,
                                         label="Guidance")
                btn = gr.Button("Fill", variant="primary")
            with gr.Column():
                out = gr.Image(label="Result")
                used_seed = gr.Number(label="Seed used")
                status = gr.Textbox(label="Status", interactive=False)
        btn.click(
            fill,
            inputs=[editor, prompt, seed, randomize, steps, guidance],
            outputs=[out, used_seed, status],
        )
    demo.queue().launch(server_port=args.port)


if __name__ == "__main__":
    main()
