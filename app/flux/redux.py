"""Gradio image-variation demo for FLUX.1-Redux on TPU.

TPU-native counterpart of the reference's redux demo
(/root/reference/app/flux.1/redux/run_gradio.py, which drives diffusers'
FluxPriorReduxPipeline): the uploaded image runs through the SigLIP tower
+ Redux embedder (nunchaku_tpu/models/redux.py) into image-prompt tokens
appended to the (optional) text prompt, then the plain FLUX.1-dev denoise
loop generates a variation.

Run:
  python -m app.flux.redux \
      --transformer svdq-int4_r32-flux.1-dev.safetensors \
      --vae vae.safetensors --t5 t5.safetensors --clip clip.safetensors \
      --siglip redux/image_encoder.safetensors \
      --embedder redux/image_embedder.safetensors
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
from nunchaku_tpu.models.redux import load_redux_prior, preprocess_siglip_image
from nunchaku_tpu.models.safety_checker import SafetyChecker

MAX_SEED = np.iinfo(np.int32).max


def get_args() -> argparse.Namespace:
    p = argparse.ArgumentParser()
    p.add_argument("--transformer", required=True,
                   help="base flux.1-dev nunchaku checkpoint")
    p.add_argument("--vae", required=True)
    p.add_argument("--t5", required=True)
    p.add_argument("--clip", required=True)
    p.add_argument("--siglip", required=True,
                   help="Redux image_encoder (SigLIP-so400m) safetensors")
    p.add_argument("--embedder", required=True,
                   help="Redux image_embedder safetensors")
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
    prior = load_redux_prior(args.siglip, args.embedder)
    checker = SafetyChecker(disabled=args.no_safety_checker)

    def generate(image, prompt, seed, randomize, steps, guidance):
        if image is None:
            return None, seed, "Upload an image first."
        if prompt and not checker(prompt):
            return None, seed, "Prompt flagged by the safety checker."
        if randomize:
            seed = random.randint(0, MAX_SEED)
        img = image[..., :3].astype(np.float32) / 255.0
        t0 = time.perf_counter()
        text_embeds, pooled = pipe.encode_prompt(prompt or "")
        prompt_embeds = prior.prompt_embeds(
            preprocess_siglip_image(img), text_embeds
        )
        out = pipe(
            prompt_embeds=prompt_embeds.astype(jnp.bfloat16),
            pooled_prompt_embeds=pooled,
            num_inference_steps=int(steps),
            guidance_scale=float(guidance),
            seed=int(seed),
        )
        dt = time.perf_counter() - t0
        res = np.clip(
            np.asarray(out.images[0], np.float32) * 255, 0, 255
        ).astype(np.uint8)
        return res, seed, f"{dt:.2f} s on {jax.devices()[0].device_kind}"

    with gr.Blocks(title="nunchaku-tpu FLUX.1-Redux") as demo:
        gr.Markdown(
            "# FLUX.1-Redux-dev — nunchaku_tpu\n"
            "Image variation via SigLIP prompt tokens, SVDQuant 4-bit on TPU."
        )
        with gr.Row():
            with gr.Column():
                image = gr.Image(label="Reference image", type="numpy")
                prompt = gr.Textbox(label="Optional text prompt", lines=2)
                with gr.Row():
                    seed = gr.Slider(0, MAX_SEED, step=1, value=0, label="Seed")
                    randomize = gr.Checkbox(value=True, label="Random seed")
                with gr.Row():
                    steps = gr.Slider(1, 50, step=1, value=50, label="Steps")
                    guidance = gr.Slider(0.0, 10.0, step=0.1, value=2.5,
                                         label="Guidance")
                run = gr.Button("Generate")
            with gr.Column():
                result = gr.Image(label="Variation")
                latency = gr.Textbox(label="Latency", interactive=False)
        run.click(
            generate,
            inputs=[image, prompt, seed, randomize, steps, guidance],
            outputs=[result, seed, latency],
        )
    demo.launch(server_name="0.0.0.0", server_port=args.port)


if __name__ == "__main__":
    main()
