"""Multiple LoRAs on one quantized FLUX (counterpart of the reference's
examples/flux.1-dev-multiple-lora.py, which calls update_lora_params with a
composed state dict from compose_lora).

Two ways to stack LoRAs here, both shown:
  * compose first (one SVD-branch append, strengths baked into the fold) —
    the reference's compose_lora path, cheapest at serve time;
  * apply sequentially (each keeps its own appended rank block) — lets
    set_lora_strength rescale the WHOLE stack live afterwards (absolute
    semantics: repeated calls do not compound).
"""

import argparse

import numpy as np

from nunchaku_tpu import (
    FluxPipeline,
    compose_lora,
    load_flux_transformer,
    set_lora_strength,
    update_lora_params,
)
from nunchaku_tpu.utils.safetensors import load_safetensors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True,
                    help="svdq-int4_r32-flux.1-dev.safetensors")
    ap.add_argument("--lora", action="append", required=True,
                    help="path[:strength], repeat (e.g. ghibsky:1.0 anime:0.6)")
    ap.add_argument("--mode", choices=["compose", "sequential"],
                    default="compose")
    ap.add_argument("--strength", type=float, default=None,
                    help="sequential mode: rescale the whole stack after "
                         "application (set_lora_strength, absolute)")
    ap.add_argument("--prompt",
                    default="GHIBSKY style, anime, a serene mountain lake")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--out", default="flux_multiple_lora.npy")
    args = ap.parse_args()

    model = load_flux_transformer(args.transformer)

    loras = []
    for spec in args.lora:
        path, _, s = spec.partition(":")
        sd, _ = load_safetensors(path)
        loras.append((sd, float(s) if s else 1.0))

    if args.mode == "compose":
        model = update_lora_params(model, compose_lora(loras))
    else:
        for sd, s in loras:
            model = update_lora_params(model, sd, strength=s)
        if args.strength is not None:
            model = set_lora_strength(model, args.strength)

    pipe = FluxPipeline(model)
    out = pipe(
        prompt_embeds=np.load("prompt_embeds.npy"),
        pooled_prompt_embeds=np.load("pooled_embeds.npy"),
        num_inference_steps=args.steps,
    )
    np.save(args.out, np.asarray(out.latents, np.float32))
    print(f"saved {args.out} ({len(loras)} LoRAs, mode={args.mode})")


if __name__ == "__main__":
    main()
