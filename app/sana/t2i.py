"""Gradio text-to-image demo for SANA on TPU.

TPU-native counterpart of the reference's SANA demo
(/root/reference/app/sana/t2i/run_gradio.py): Gemma-2 encoder ->
SVDQuant SANA transformer (LiteLA linear attention) -> DC-AE 32x decoder,
with optional PAG (perturbed-attention guidance).

Run:
  python -m app.sana.t2i --transformer svdq-int4-sana1.6b.safetensors \
      --dc-ae dc_ae.safetensors --gemma gemma2.safetensors --tokenizer <dir>
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

from nunchaku_tpu import load_dc_ae, load_gemma2_encoder, load_sana_transformer
from nunchaku_tpu.models.safety_checker import SafetyChecker
from nunchaku_tpu.pipeline.pipeline_sana import SanaPipeline
from nunchaku_tpu.pipeline.tokenizers import gemma_tokenizer

MAX_SEED = np.iinfo(np.int32).max

EXAMPLES = [
    "A cute 🐼 eating 🎋, ink drawing style",
    "a tiny astronaut hatching from an egg on the moon",
    "isometric voxel art of a cozy coffee shop",
]


def get_args() -> argparse.Namespace:
    p = argparse.ArgumentParser()
    p.add_argument("--transformer", required=True, help="SANA nunchaku checkpoint")
    p.add_argument("--dc-ae", required=True)
    p.add_argument("--gemma", required=True)
    p.add_argument("--tokenizer", required=True, help="gemma tokenizer dir")
    p.add_argument("--no-safety-checker", action="store_true")
    p.add_argument("--cache", choices=["fb"], default=None)
    p.add_argument("--port", type=int, default=7860)
    return p.parse_args()


def main() -> None:
    args = get_args()
    pipe = SanaPipeline(
        load_sana_transformer(args.transformer),
        vae=load_dc_ae(args.dc_ae),
        text_encoder=load_gemma2_encoder(args.gemma),
        tokenizer=gemma_tokenizer(args.tokenizer),
    )
    checker = SafetyChecker(disabled=args.no_safety_checker)

    def generate(prompt, seed, randomize, steps, guidance, pag):
        if not checker(prompt):
            return None, seed, "Prompt flagged by the safety checker."
        if randomize:
            seed = random.randint(0, MAX_SEED)
        t0 = time.perf_counter()
        out = pipe(
            prompt,
            num_inference_steps=int(steps),
            guidance_scale=float(guidance),
            pag_scale=float(pag),
            seed=int(seed),
            cache=args.cache,
        )
        dt = time.perf_counter() - t0
        img = np.asarray(out.images[0], np.float32)
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        return img, seed, f"{dt:.2f} s on {jax.devices()[0].device_kind}"

    with gr.Blocks(title="nunchaku-tpu SANA") as demo:
        gr.Markdown("# SANA 1.6B — nunchaku_tpu\nSVDQuant 4-bit on TPU.")
        with gr.Row():
            with gr.Column():
                prompt = gr.Textbox(label="Prompt", lines=3)
                with gr.Row():
                    seed = gr.Slider(0, MAX_SEED, step=1, value=0, label="Seed")
                    randomize = gr.Checkbox(value=True, label="Random seed")
                with gr.Row():
                    steps = gr.Slider(1, 50, step=1, value=20, label="Steps")
                    guidance = gr.Slider(1.0, 10.0, step=0.1, value=4.5,
                                         label="Guidance")
                    pag = gr.Slider(0.0, 4.0, step=0.5, value=0.0,
                                    label="PAG scale")
                btn = gr.Button("Generate", variant="primary")
                gr.Examples(EXAMPLES, inputs=prompt)
            with gr.Column():
                out = gr.Image(label="Result")
                used_seed = gr.Number(label="Seed used")
                status = gr.Textbox(label="Status", interactive=False)
        btn.click(
            generate,
            inputs=[prompt, seed, randomize, steps, guidance, pag],
            outputs=[out, used_seed, status],
        )
    demo.queue().launch(server_port=args.port)


if __name__ == "__main__":
    main()
