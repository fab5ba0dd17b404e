"""Attention implementation selection (counterpart of the reference's
examples/flux.1-dev-fp16attn.py, which calls
``transformer.set_attention_impl("nunchaku-fp16")``).

On TPU one Pallas flash kernel covers both of the reference's dense impls
("flashattn2" and "nunchaku-fp16" — the fixed-shift exp2 softmax already
runs the whole softmax in low precision); "blocksparse" adds the pooled
top-k high-resolution path (reference docs/source/usage/attention.rst).
"""

import argparse

import numpy as np

from nunchaku_tpu import FluxPipeline, load_flux_transformer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transformer", required=True)
    ap.add_argument("--attention", default="nunchaku-fp16",
                    choices=["flashattn2", "nunchaku-fp16", "blocksparse"])
    ap.add_argument("--sparsity", type=float, default=0.5,
                    help="kv-block skip fraction (blocksparse only)")
    ap.add_argument("--prompt-embeds", required=True, help=".npy (B, S, 4096)")
    ap.add_argument("--pooled-embeds", required=True, help=".npy (B, 768)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="flux_fp16attn.npy")
    args = ap.parse_args()

    model = load_flux_transformer(args.transformer)
    model.set_attention_impl(
        args.attention,
        **({"sparsity_ratio": args.sparsity}
           if args.attention == "blocksparse" else {}),
    )
    model.enable_fused_qkv_prep()
    pipe = FluxPipeline(model)
    out = pipe(
        prompt_embeds=np.load(args.prompt_embeds),
        pooled_prompt_embeds=np.load(args.pooled_embeds),
        height=args.size,
        width=args.size,
        num_inference_steps=args.steps,
        seed=args.seed,
    )
    np.save(args.out, np.asarray(out.latents, np.float32))
    print(f"saved {args.out} attention={args.attention}")


if __name__ == "__main__":
    main()
