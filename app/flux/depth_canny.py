"""Gradio structural-control demo for FLUX.1-Canny/Depth on TPU.

TPU-native counterpart of the reference's depth_canny demo
(/root/reference/app/flux.1/depth_canny/run_gradio.py). The control map
(canny edges / depth) is produced host-side from the upload — a simple
numpy Sobel edge fallback stands in for cv2.Canny / DepthAnything (both
optional heavy deps) — then VAE-encoded and channel-concatenated
(pipeline prepare_control; the official control variants use
in_channels=128).

Run:
  python -m app.flux.depth_canny --mode canny \
      --transformer svdq-int4_r32-flux.1-canny-dev.safetensors \
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


def sobel_edges(img: np.ndarray, thresh: float = 0.25) -> np.ndarray:
    """Dependency-free canny stand-in: Sobel gradient magnitude, thresholded.
    Swap in cv2.Canny when opencv is available."""
    g = img.mean(axis=-1)
    gx = np.zeros_like(g)
    gy = np.zeros_like(g)
    gx[1:-1, 1:-1] = (
        g[1:-1, 2:] - g[1:-1, :-2]
        + 0.5 * (g[:-2, 2:] - g[:-2, :-2] + g[2:, 2:] - g[2:, :-2])
    )
    gy[1:-1, 1:-1] = (
        g[2:, 1:-1] - g[:-2, 1:-1]
        + 0.5 * (g[2:, :-2] - g[:-2, :-2] + g[2:, 2:] - g[:-2, 2:])
    )
    mag = np.sqrt(gx * gx + gy * gy)
    mag /= mag.max() + 1e-8
    edges = (mag > thresh).astype(np.float32)
    return np.repeat(edges[..., None], 3, axis=-1)


def get_args() -> argparse.Namespace:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["canny", "depth"], default="canny")
    p.add_argument("--transformer", required=True,
                   help="canny-dev or depth-dev nunchaku checkpoint")
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
    default_guidance = 30.0 if args.mode == "canny" else 10.0

    def generate(image, is_control_map, prompt, seed, randomize, steps, guidance):
        if image is None:
            return None, None, seed, "Upload an image first."
        if not checker(prompt):
            return None, None, seed, "Prompt flagged by the safety checker."
        if randomize:
            seed = random.randint(0, MAX_SEED)
        h = (image.shape[0] // 16) * 16
        w = (image.shape[1] // 16) * 16
        img = image[:h, :w, :3].astype(np.float32) / 255.0
        if is_control_map:
            ctrl = img
        elif args.mode == "canny":
            ctrl = sobel_edges(img)
        else:
            return None, None, seed, (
                "Depth mode needs a precomputed depth map upload "
                "(check 'input is control map'): run DepthAnything host-side."
            )
        t0 = time.perf_counter()
        out = pipe(
            prompt,
            height=h,
            width=w,
            num_inference_steps=int(steps),
            guidance_scale=float(guidance),
            seed=int(seed),
            control_latents=pipe.prepare_control(ctrl[None]),
        )
        dt = time.perf_counter() - t0
        res = np.clip(np.asarray(out.images[0], np.float32) * 255, 0, 255).astype(np.uint8)
        ctrl_view = np.clip(ctrl * 255, 0, 255).astype(np.uint8)
        return res, ctrl_view, seed, f"{dt:.2f} s on {jax.devices()[0].device_kind}"

    with gr.Blocks(title=f"nunchaku-tpu FLUX.1-{args.mode}") as demo:
        gr.Markdown(
            f"# FLUX.1-{args.mode.capitalize()}-dev — nunchaku_tpu\n"
            "Structural control, SVDQuant 4-bit on TPU."
        )
        with gr.Row():
            with gr.Column():
                image = gr.Image(label="Input image", type="numpy")
                is_map = gr.Checkbox(value=False, label="input is control map")
                prompt = gr.Textbox(label="Prompt", lines=2)
                with gr.Row():
                    seed = gr.Slider(0, MAX_SEED, step=1, value=0, label="Seed")
                    randomize = gr.Checkbox(value=True, label="Random seed")
                with gr.Row():
                    steps = gr.Slider(1, 50, step=1, value=50, label="Steps")
                    guidance = gr.Slider(0.0, 50.0, step=0.5,
                                         value=default_guidance, label="Guidance")
                btn = gr.Button("Generate", variant="primary")
            with gr.Column():
                out = gr.Image(label="Result")
                ctrl_view = gr.Image(label="Control map used")
                used_seed = gr.Number(label="Seed used")
                status = gr.Textbox(label="Status", interactive=False)
        btn.click(
            generate,
            inputs=[image, is_map, prompt, seed, randomize, steps, guidance],
            outputs=[out, ctrl_view, used_seed, status],
        )
    demo.queue().launch(server_port=args.port)


if __name__ == "__main__":
    main()
