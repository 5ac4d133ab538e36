"""Host input-pipeline throughput bench: can ClipLoader feed the TPU step?

A 200 ms/step train loop needs ~5 batches/s sustained from the host
(PROFILE.md).  This bench builds a synthetic on-disk Ref-YTVOS tree at real
frame sizes (JPEG ~720x1280 + weak-heatmap h5), then measures ClipLoader
batches/s at train shapes (T=3, 512x640 canvas) across worker counts.
Reference equivalent: torch DataLoader num_workers=4
(/root/reference/main.py:197-214).

Usage:  python scripts/bench_loader.py [--frames-per-video 24] [--videos 4]
                                       [--batches 20] [--batch-size 1]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_tree(root, videos, frames_per_video, h=720, w=1280):
    import h5py
    from PIL import Image

    rng = np.random.default_rng(0)
    meta = {"videos": {}}
    for v in range(videos):
        video = f"vid{v}"
        os.makedirs(f"{root}/train/JPEGImages/{video}")
        os.makedirs(f"{root}/train/Annotations/{video}")
        os.makedirs(f"{root}/train/AnnotationsWeakly/{video}")
        frames = [f"{i:05d}" for i in range(frames_per_video)]
        base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        pal = np.zeros((h, w), np.uint8)
        pal[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 1
        heat = np.zeros((1, h, w), np.float32)
        heat[0, h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 0.9
        for name in frames:
            Image.fromarray(base).save(
                f"{root}/train/JPEGImages/{video}/{name}.jpg", quality=85)
            Image.fromarray(pal, mode="P").save(
                f"{root}/train/Annotations/{video}/{name}.png")
            with h5py.File(f"{root}/train/AnnotationsWeakly/{video}/{name}.h5", "w") as f:
                f.create_dataset("obj_ids", data=np.asarray([1]))
                f.create_dataset("heatPoint", data=heat)
                f.create_dataset("heatBBox", data=heat)
        meta["videos"][video] = {
            "frames": frames,
            "expressions": {"0": {"exp": "the big square", "obj_id": "1"}},
        }
    os.makedirs(f"{root}/meta_expressions/train")
    with open(f"{root}/meta_expressions/train/meta_expressions.json", "w") as f:
        json.dump(meta, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--frames-per-video", type=int, default=24)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--num-frames", type=int, default=3)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 4, 8])
    args = ap.parse_args()

    from ocpg_tpu.data.datasets import build_dataset
    from ocpg_tpu.data.loader import ClipLoader

    root = tempfile.mkdtemp(prefix="loaderbench_")
    try:
        t0 = time.time()
        build_tree(root, args.videos, args.frames_per_video)
        print(f"fixture tree built in {time.time() - t0:.1f}s", flush=True)
        ds = build_dataset("ytvos", root, "train", args.num_frames, "box")

        results = {}
        for nw in args.workers:
            loader = ClipLoader(ds, args.batch_size, canvas=(512, 640),
                                train=True, num_workers=nw,
                                text_vocab=50265)
            it = loader.epoch(0)
            next(it)                                   # warm: first batch
            t0 = time.time()
            count = 0
            for batch in it:
                count += 1
                if count >= args.batches:
                    break
            dt = time.time() - t0
            bps = count / dt
            results[nw] = bps
            fps = bps * args.batch_size * args.num_frames
            print(f"workers={nw}: {bps:.2f} batches/s "
                  f"({fps:.1f} train-frames/s, {1000 / bps:.0f} ms/batch)",
                  flush=True)
        best = max(results.values())
        budget = 1000.0 / 200.9                         # TPU steps/s (PROFILE.md)
        print(json.dumps({
            "metric": "loader_batches_per_sec", "value": round(best, 2),
            "tpu_steps_per_sec_budget": round(budget, 2),
            "feeds_one_chip": best >= budget,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
