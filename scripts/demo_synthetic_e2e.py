"""End-to-end system demo on real hardware: train -> infer -> eval J&F.

The build environment has no Ref-DAVIS assets and no reference checkpoint
(zero egress), so the "within 0.1 J&F" target cannot be measured directly.
This script is the next-strongest whole-system evidence: it drives the
PRODUCTION pipeline — `cli.train` (jitted SPMD step, ClipLoader, orbax
checkpoints) -> `cli.infer_davis` (ClipInferenceEngine, annotator merge,
palette PNGs) -> `evaluation.davis_eval` (J&F, Hungarian protocol) — on a
synthetic Ref-DAVIS tree of two language-distinguished moving objects, and
asserts that training moves J&F far above the random-weight baseline.

Reference equivalents: /root/reference/main.py (train) ->
/root/reference/inference_davis.py:164-271 -> /root/reference/eval_davis.py.

Usage:
    python scripts/demo_synthetic_e2e.py [--epochs 12] [--workdir DIR]
        [--dtype bfloat16] [--out E2E_SYNTH.json]

Writes a JSON artifact {jf_random, jf_trained, steps, loss_first, loss_last,
platform, ...} and prints one summary line.  Runs on the real TPU chip when
one is attached (the flagship path), or on CPU (slow; use --epochs 2 for a
smoke run).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 128, 160
N_FRAMES = 8

# one model for all phases: small enough to train in minutes from random
# init, big enough to bind "red"/"blue" to the right object through the
# VL-fusion path.  lst warmup is shortened (production 100k) because with
# binary full-supervision heatmaps the masked-CE confidence weight
# degenerates to zero inside the box (clip->|.-0.5| is constant, so the
# min-max normalization zeroes it, criterion.py:masked_ce_loss) — the mask
# interior is learned by the post-warmup Chan-Vese levelset phase, exactly
# as in tests/test_convergence.py.
DEMO_CFG = {
    "enc_layers": 2, "dec_layers": 2, "dim_feedforward": 512,
    "num_queries": 5,
    "text_layers": 2, "text_hidden": 128, "text_heads": 4, "text_ffn": 256,
    "text_vocab": 2048,
    "lst_warmup_iters": 200,
}

# 4 annotator phrasings per object (valid-split convention:
# exp index = obj_id * 4 + anno_id, inference_davis.py:167)
PHRASINGS = {
    "red": ["the red box", "red box", "the red square", "a red box"],
    "blue": ["the blue box", "blue box", "the blue square", "a blue box"],
}

RED, BLUE = (236, 95, 103), (87, 145, 249)


def _video_masks(rng: np.random.Generator) -> np.ndarray:
    """(T, H, W) uint8 label maps: two moving boxes with random trajectories."""
    out = np.zeros((N_FRAMES, H, W), np.uint8)
    bh, bw = 36, 28
    # keep starting corners apart so the objects never fully overlap
    y1, x1 = rng.integers(4, H - bh - 20), rng.integers(4, W // 2 - bw)
    y2, x2 = rng.integers(4, H - bh - 20), rng.integers(W // 2, W - bw - 20)
    v1 = rng.integers(-2, 3, size=2)
    v2 = rng.integers(-2, 3, size=2)
    for t in range(N_FRAMES):
        a = (int(np.clip(y1 + v1[0] * t, 0, H - bh)),
             int(np.clip(x1 + v1[1] * t, 0, W - bw)))
        b = (int(np.clip(y2 + v2[0] * t, 0, H - bh)),
             int(np.clip(x2 + v2[1] * t, 0, W - bw)))
        out[t, a[0]:a[0] + bh, a[1]:a[1] + bw] = 1     # red object
        out[t, b[0]:b[0] + bh, b[1]:b[1] + bw] = 2     # blue object
    return out


def build_tree(root: Path, n_train: int, n_valid: int, seed: int = 0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    palette = [0, 0, 0, *RED, *BLUE] + [0] * (256 * 3 - 9)

    def write_split(split, videos, meta_exps):
        meta = {"videos": {}}
        for video in videos:
            gt = _video_masks(rng)
            (root / split / "JPEGImages" / video).mkdir(parents=True)
            (root / split / "Annotations" / video).mkdir(parents=True)
            frames = [f"{i:05d}" for i in range(N_FRAMES)]
            base = rng.integers(30, 70, size=(H, W, 3)).astype(np.uint8)
            for t, name in enumerate(frames):
                rgb = base.copy()
                rgb[gt[t] == 1] = RED
                rgb[gt[t] == 2] = BLUE
                Image.fromarray(rgb).save(
                    root / split / "JPEGImages" / video / f"{name}.jpg",
                    quality=95)
                pimg = Image.fromarray(gt[t], mode="P")
                pimg.putpalette(palette)
                pimg.save(root / split / "Annotations" / video / f"{name}.png")
                if split == "valid":
                    # scorer-side GT lives at the tree root (davis_eval)
                    (root / "Annotations" / video).mkdir(parents=True,
                                                         exist_ok=True)
                    pimg.save(root / "Annotations" / video / f"{name}.png")
            meta["videos"][video] = {"frames": frames,
                                     "expressions": meta_exps}
        (root / "meta_expressions" / split).mkdir(parents=True)
        with open(root / "meta_expressions" / split /
                  "meta_expressions.json", "w") as f:
            json.dump(meta, f)
        return list(meta["videos"])

    # train split: one expression per object (DAVISDataset needs obj_id)
    write_split("train", [f"tr{v}" for v in range(n_train)], {
        "0": {"exp": PHRASINGS["red"][0], "obj_id": "1"},
        "1": {"exp": PHRASINGS["blue"][0], "obj_id": "2"},
    })
    # valid split: 4 annotator phrasings per object, exp i = obj*4 + anno
    valid_videos = [f"va{v}" for v in range(n_valid)]
    write_split("valid", valid_videos, {
        str(i): {"exp": (PHRASINGS["red"] + PHRASINGS["blue"])[i]}
        for i in range(8)
    })
    (root / "ImageSets" / "2017").mkdir(parents=True)
    with open(root / "ImageSets" / "2017" / "val.txt", "w") as f:
        f.write("\n".join(valid_videos) + "\n")


def _with_argv(argv, fn):
    saved = sys.argv
    sys.argv = argv
    try:
        return fn()
    finally:
        sys.argv = saved


def run_train(root: Path, out_dir: Path, args) -> dict:
    from ocpg_tpu.cli import train as train_cli

    t0 = time.time()
    _with_argv([
        "train", "--dataset_file", "davis", "--davis_path", str(root),
        "--supervision", "full", "--backbone", args.backbone,
        "--num_frames", "2", "--batch_size", "1",
        "--epochs", str(args.epochs), "--num_workers", str(args.workers),
        "--lr", "5e-4", "--lr_backbone", "5e-4",
        "--output_dir", str(out_dir), "--canvas", str(H), str(W),
        "--log_every", "100", "--tb_every", "0",
        "--compute_dtype", args.dtype, "--seed", "7",
        "--config_overrides", json.dumps(DEMO_CFG),
    ], train_cli.main)
    wall = time.time() - t0
    with open(out_dir / "log.txt") as f:
        epochs = [json.loads(l) for l in f if l.strip()]
    return {"train_wall_s": round(wall, 1),
            "loss_first": round(epochs[0]["loss"], 3),
            "loss_last": round(epochs[-1]["loss"], 3),
            "epochs": len(epochs)}


def run_infer(root: Path, out_dir: Path, ckpt, args):
    from ocpg_tpu.cli import infer_davis as infer_cli

    argv = [
        "infer_davis", "--davis_path", str(root),
        "--output_dir", str(out_dir), "--backbone", args.backbone,
        "--split", "valid", "--clip_len", str(N_FRAMES),
        "--resize", str(H), "--max_size", str(W),
        "--config_overrides", json.dumps(
            {**DEMO_CFG, "compute_dtype": args.dtype}),
    ]
    if ckpt:
        argv += ["--checkpoint", str(ckpt)]
    _with_argv(argv, infer_cli.main)


def score(root: Path, out_dir: Path) -> dict:
    from ocpg_tpu.evaluation.davis_eval import evaluate_davis, global_summary

    jf = []
    for anno_id in range(4):
        results = out_dir / "valid" / f"anno_{anno_id}"
        metrics = evaluate_davis(str(root), str(results), "val")
        jf.append(global_summary(metrics)["J&F-Mean"])
    return {"jf_mean": round(float(np.mean(jf)), 4),
            "jf_per_annotator": [round(float(v), 4) for v in jf]}


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--epochs", type=int, default=12,
                   help="128 steps/epoch at the default tree size")
    p.add_argument("--train_videos", type=int, default=8)
    p.add_argument("--valid_videos", type=int, default=2)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--workdir", default=None,
                   help="keep intermediate tree/checkpoints here "
                        "(default: a temp dir, deleted on success)")
    p.add_argument("--out", default="E2E_SYNTH.json")
    args = p.parse_args()

    work = Path(args.workdir) if args.workdir else Path(
        tempfile.mkdtemp(prefix="ocpg_demo_"))
    work.mkdir(parents=True, exist_ok=True)
    tree = work / "davis"
    if not (tree / "meta_expressions").exists():
        build_tree(tree, args.train_videos, args.valid_videos)

    import jax

    record = {"platform": jax.default_backend(),
              "devices": jax.device_count(),
              "config": DEMO_CFG, "dtype": args.dtype,
              "epochs": args.epochs,
              "steps": args.epochs * args.train_videos * 2 * N_FRAMES}

    print("== phase 1: random-weight baseline infer -> eval ==", flush=True)
    run_infer(tree, work / "out_random", None, args)
    record["random"] = score(tree, work / "out_random")

    print("== phase 2: train ==", flush=True)
    record["train"] = run_train(tree, work / "train", args)

    print("== phase 3: trained infer -> eval ==", flush=True)
    run_infer(tree, work / "out_trained", work / "train" / "checkpoints", args)
    record["trained"] = score(tree, work / "out_trained")

    record["jf_random"] = record["random"]["jf_mean"]
    record["jf_trained"] = record["trained"]["jf_mean"]
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: record[k] for k in
                      ("platform", "steps", "jf_random", "jf_trained")}))
    if not args.workdir:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
