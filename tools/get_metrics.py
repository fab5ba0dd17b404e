"""Paper-metric harness: similarity + quality metrics over image folders.

Counterpart of the reference's app/flux.1/t2i/get_metrics.py:26-60:
  * similarity metrics between two generated-image folders (quantized vs
    bf16 reference): PSNR / LPIPS / SSIM — all computed locally (LPIPS is
    the repo's from-scratch torch-CPU implementation in
    nunchaku_tpu/metrics/lpips.py, AlexNet weights env-gated).
  * dataset quality metrics (FID / ImageReward / CLIP-IQA) require their
    scorer model weights; they activate when the corresponding env vars
    point at local checkouts and report "skipped" otherwise (zero-egress
    sandboxes can still run the similarity tier).

  python tools/get_metrics.py gen_int4/ gen_bf16/ -o metrics.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_images(root):
    """Load all PNG/JPG/NPY images of a folder as f32 (H, W, 3) in [0,1]."""
    out = {}
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        stem, ext = os.path.splitext(name)
        if ext == ".npy":
            img = np.load(path).astype(np.float32)
        elif ext in (".png", ".jpg", ".jpeg"):
            try:
                from PIL import Image
            except ImportError:
                continue
            img = np.asarray(Image.open(path).convert("RGB")).astype(np.float32) / 255.0
        else:
            continue
        if img.max() > 1.5:
            img = img / 255.0
        out[stem] = img
    return out


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


def ssim(a, b, c1=0.01**2, c2=0.03**2):
    """Global SSIM over the luma channel (box statistics, 8x8 windows)."""
    def luma(x):
        return x @ np.array([0.299, 0.587, 0.114], np.float32)

    x, y = luma(a), luma(b)
    h, w = x.shape
    h8, w8 = h // 8 * 8, w // 8 * 8
    x = x[:h8, :w8].reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3)
    y = y[:h8, :w8].reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3)
    mx, my = x.mean((-1, -2)), y.mean((-1, -2))
    vx, vy = x.var((-1, -2)), y.var((-1, -2))
    cov = ((x - mx[..., None, None]) * (y - my[..., None, None])).mean((-1, -2))
    s = ((2 * mx * my + c1) * (2 * cov + c2)) / ((mx**2 + my**2 + c1) * (vx + vy + c2))
    return float(s.mean())


def compute_similarity(dir1, dir2):
    imgs1 = load_images(dir1)
    imgs2 = load_images(dir2)
    keys = sorted(set(imgs1) & set(imgs2))
    if not keys:
        raise SystemExit(f"no common images between {dir1} and {dir2}")

    from nunchaku_tpu.metrics.lpips import compute_lpips

    res = {"psnr": [], "ssim": []}
    for k in keys:
        a, b = imgs1[k], imgs2[k]
        res["psnr"].append(psnr(a, b))
        res["ssim"].append(ssim(a, b))
    out = {k: float(np.mean(v)) for k, v in res.items()}
    out["lpips"] = compute_lpips(
        np.stack([imgs1[k] for k in keys]), np.stack([imgs2[k] for k in keys])
    )
    out["n_images"] = len(keys)
    return out


def _load_prompts(path):
    """Prompt list/dict aligned with image stems (tools/evaluate.py layout:
    images named by prompt index, or a {stem: prompt} JSON)."""
    data = json.load(open(path))
    if isinstance(data, dict):
        return {str(k): (v["prompt"] if isinstance(v, dict) else str(v))
                for k, v in data.items()}
    return {f"{i:05d}": (p if isinstance(p, str) else p["prompt"])
            for i, p in enumerate(data)}


def compute_quality(gen_dir, ref_dir=None, prompts_path=None):
    """FID / ImageReward / CLIP-IQA / CLIPScore — env-gated on LOCAL scorer
    weights (reference tier: app/flux.1/t2i/get_metrics.py:26-60)."""
    from nunchaku_tpu.metrics.clip_iqa import compute_clip_iqa, compute_clip_score
    from nunchaku_tpu.metrics.fid import compute_fid
    from nunchaku_tpu.metrics.image_reward import compute_image_reward

    gen = load_images(gen_dir)
    keys = sorted(gen)
    stack = np.stack([gen[k] for k in keys]) if keys else None
    out = {}

    if stack is None:
        return {"error": f"no images in {gen_dir}"}

    if ref_dir:
        ref = load_images(ref_dir)
        rstack = np.stack([ref[k] for k in sorted(ref)]) if ref else None
    else:
        rstack = None
    fid = compute_fid(stack, rstack) if rstack is not None else None
    out["fid"] = (
        fid if fid is not None else
        "skipped (set NUNCHAKU_TPU_INCEPTION to a TorchScript InceptionV3"
        " and pass a reference folder)"
    )

    iqa = compute_clip_iqa(stack)
    out["clip_iqa"] = (
        iqa if iqa is not None else
        "skipped (set NUNCHAKU_TPU_CLIP_DIR to a local CLIP checkout)"
    )

    if prompts_path:
        prompts = _load_prompts(prompts_path)
        aligned = [(gen[k], prompts[k]) for k in keys if k in prompts]
        if aligned:
            imgs = np.stack([a for a, _ in aligned])
            txts = [t for _, t in aligned]
            cs = compute_clip_score(imgs, txts)
            out["clip_score"] = cs if cs is not None else "skipped (CLIP dir)"
            ir = compute_image_reward(imgs, txts)
            out["image_reward"] = (
                ir if ir is not None else
                "skipped (set NUNCHAKU_TPU_IMAGE_REWARD[_REPO])"
            )
        else:
            out["clip_score"] = out["image_reward"] = (
                "skipped (no prompt/image stem overlap)"
            )
    else:
        out["clip_score"] = out["image_reward"] = "skipped (pass --prompts)"
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input_roots", nargs="+",
                   help="1 folder: quality metrics; 2 folders: similarity "
                        "(+ FID between them)")
    p.add_argument("-o", "--output-path", default="metrics.json")
    p.add_argument("--prompts", default=None,
                   help="prompt JSON aligned with image stems (enables "
                        "CLIPScore / ImageReward)")
    args = p.parse_args()

    results = {}
    if len(args.input_roots) == 2:
        results["similarity"] = compute_similarity(*args.input_roots)
    results["quality"] = compute_quality(
        args.input_roots[0],
        ref_dir=args.input_roots[1] if len(args.input_roots) == 2 else None,
        prompts_path=args.prompts,
    )

    print(json.dumps(results, indent=2))
    with open(args.output_path, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)


if __name__ == "__main__":
    main()
