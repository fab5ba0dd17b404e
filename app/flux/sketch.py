"""Gradio sketch-to-image demo (pix2pix-turbo control module) on TPU.

TPU-native counterpart of the reference's sketch demo
(/root/reference/app/flux.1/sketch/run_gradio.py): draw a sketch, pick a
style prompt, and a pix2pix-turbo control LoRA on quantized FLUX.1-schnell
renders it in ONE transformer step — the sketch is binarized+eroded,
VAE-encoded and mixed with noise at strength ``alpha``
(pipeline/pipeline_flux_pix2pix.py).

Run:
  python -m app.flux.sketch --transformer svdq-int4-flux.1-schnell.safetensors \
      --control sketch.safetensors --vae vae.safetensors \
      --t5 t5.safetensors --clip clip.safetensors
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
    FluxPix2pixTurboPipeline,
    load_autoencoder,
    load_clip_text,
    load_flux_transformer,
    load_t5_encoder,
)
from nunchaku_tpu.models.safety_checker import SafetyChecker
from nunchaku_tpu.utils.safetensors import load_safetensors

MAX_SEED = np.iinfo(np.int32).max

# style presets mirroring the reference demo's dropdown (vars.py STYLES)
STYLES = {
    "None": "{prompt}",
    "Cinematic": "cinematic still {prompt}. emotional, harmonious, vignette, "
    "highly detailed, high budget, bokeh, cinemascope, moody, epic, gorgeous",
    "3D Model": "professional 3d model {prompt}. octane render, highly "
    "detailed, volumetric, dramatic lighting",
    "Anime": "anime artwork {prompt}. anime style, key visual, vibrant, "
    "studio anime, highly detailed",
    "Digital Art": "concept art {prompt}. digital artwork, illustrative, "
    "painterly, matte painting, highly detailed",
    "Photographic": "cinematic photo {prompt}. 35mm photograph, film, bokeh, "
    "professional, 4k, highly detailed",
    "Pixel art": "pixel-art {prompt}. low-res, blocky, pixel art style, "
    "8-bit graphics",
    "Fantasy art": "ethereal fantasy concept art of {prompt}. magnificent, "
    "celestial, ethereal, painterly, epic, majestic, magical, fantasy art",
}


def get_args() -> argparse.Namespace:
    p = argparse.ArgumentParser()
    p.add_argument("--transformer", required=True, help="schnell nunchaku checkpoint")
    p.add_argument("--control", required=True,
                   help="pix2pix-turbo control-module LoRA (sketch.safetensors)")
    p.add_argument("--vae", required=True)
    p.add_argument("--t5", required=True)
    p.add_argument("--clip", required=True)
    p.add_argument("-p", "--precision",
                   choices=["int4", "nvfp4", "int8", "w4a8"], default=None)
    p.add_argument("--alpha", type=float, default=0.4,
                   help="default sketch guidance / LoRA strength")
    p.add_argument("--no-safety-checker", action="store_true")
    p.add_argument("--port", type=int, default=7860)
    return p.parse_args()


def main() -> None:
    args = get_args()
    pipe = FluxPix2pixTurboPipeline(
        load_flux_transformer(args.transformer, precision=args.precision),
        vae=load_autoencoder(args.vae),
        text_encoder=load_clip_text(args.clip),
        text_encoder_2=load_t5_encoder(args.t5),
    )
    pipe.load_control_module(load_safetensors(args.control)[0], alpha=args.alpha)
    checker = SafetyChecker(disabled=args.no_safety_checker)

    def run(sketch, prompt, style, alpha, seed, randomize):
        if sketch is None:
            return None, seed, "Draw a sketch first."
        if not checker(prompt):
            return None, seed, "Prompt flagged by the safety checker."
        if randomize:
            seed = random.randint(0, MAX_SEED)
        img = sketch["composite"] if isinstance(sketch, dict) else sketch
        img = np.asarray(img)
        if img.ndim == 3 and img.shape[-1] == 4:  # drop alpha channel
            img = img[..., :3]
        h = (img.shape[0] // 16) * 16
        w = (img.shape[1] // 16) * 16
        x = (img[:h, :w].astype(np.float32) / 255.0)[None]
        styled = STYLES.get(style, "{prompt}").format(prompt=prompt)
        t0 = time.perf_counter()
        out = pipe(x, prompt=styled, alpha=float(alpha), seed=int(seed))
        dt = time.perf_counter() - t0
        res = np.clip(np.asarray(out.images[0], np.float32) * 255, 0, 255)
        return res.astype(np.uint8), seed, (
            f"1-step render: {dt:.2f} s on {jax.devices()[0].device_kind}"
        )

    with gr.Blocks(title="nunchaku-tpu FLUX.1 sketch") as demo:
        gr.Markdown(
            "# Sketch-to-image (pix2pix-turbo) — nunchaku_tpu\n"
            "One-step generation from a hand sketch, SVDQuant 4-bit on TPU."
        )
        with gr.Row():
            with gr.Column():
                sketch = gr.ImageEditor(label="Sketch", type="numpy",
                                        canvas_size=(1024, 1024))
                prompt = gr.Textbox(label="Prompt", lines=2)
                style = gr.Dropdown(list(STYLES), value="None", label="Style")
                alpha = gr.Slider(0.0, 1.0, step=0.05, value=args.alpha,
                                  label="Sketch guidance (alpha)")
                with gr.Row():
                    seed = gr.Slider(0, MAX_SEED, step=1, value=0, label="Seed")
                    randomize = gr.Checkbox(value=True, label="Random seed")
                btn = gr.Button("Render", variant="primary")
            with gr.Column():
                out = gr.Image(label="Result")
                used_seed = gr.Number(label="Seed used")
                status = gr.Textbox(label="Status", interactive=False)
        btn.click(
            run,
            inputs=[sketch, prompt, style, alpha, seed, randomize],
            outputs=[out, used_seed, status],
        )
    demo.queue().launch(server_port=args.port)


if __name__ == "__main__":
    main()
