"""On-chip end-to-end A2D evaluate: the full CLI path fed by the real loader.

VERDICT r3 next #5: train (E2E_TRAIN_TPU.json) and inference (PROFILE.md
round-10) have on-chip e2e artifacts, but `evaluate` — forward + postprocess
to RLE at native resolution + COCO-style metrics (reference
engine.py:126-194) — was only evidenced on the CPU mesh.  This builds a
synthetic on-disk A2D-Sentences tree (mp4 clips + h5 instance masks +
heatmaps at the real 320H resolution), runs `engine.evaluate.evaluate_a2d`
with the production R101 config on the chip, and records ms/clip e2e vs the
resident-batch device floor.  Writes E2E_EVAL_TPU.json at the repo root.

Usage: python scripts/bench_eval_e2e.py [--videos 12] [--frames 3]
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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

H, W = 320, 568          # A2D clips320H native resolution


def build_a2d_tree(root: str, n_videos: int, n_frames: int) -> None:
    import cv2
    import h5py

    rng = np.random.default_rng(7)
    os.makedirs(os.path.join(root, "Release", "clips320H"))
    os.makedirs(os.path.join(root, "text_annotations"))
    ann_lines = ["video_id,instance_id,query"]
    set_lines = []
    for v in range(n_videos):
        vid = f"vid{v:03d}"
        inst_dir = os.path.join(root, "text_annotations",
                                "a2d_annotation_with_instances", vid)
        os.makedirs(inst_dir)
        writer = cv2.VideoWriter(
            os.path.join(root, "Release", "clips320H", f"{vid}.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 10, (W, H))
        for _ in range(n_frames):
            writer.write((rng.random((H, W, 3)) * 255).astype(np.uint8))
        writer.release()
        mask = np.zeros((H, W), np.uint8)
        y, x = rng.integers(40, 200), rng.integers(40, 400)
        mask[y:y + 80, x:x + 120] = 1
        heat = np.zeros((1, H, W), np.float32)
        heat[0, y - 8:y + 88, x - 8:x + 128] = 0.8
        mid = f"{n_frames // 2:05d}.h5"
        with h5py.File(os.path.join(inst_dir, mid), "w") as f:
            f.create_dataset("instance", data=np.asarray([2]))
            f.create_dataset("reMask", data=mask.T)
            f.create_dataset("heatBBox", data=heat)
            f.create_dataset("heatPoint", data=heat)
        ann_lines.append(f"{vid},2,the large moving object on the left")
        set_lines.append(f"{vid},x,x,x,x,x,x,x,1")
    with open(os.path.join(root, "text_annotations", "a2d_annotation.txt"), "w") as f:
        f.write("\n".join(ann_lines) + "\n")
    with open(os.path.join(root, "Release", "videoset.csv"), "w") as f:
        f.write("\n".join(set_lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=12)
    ap.add_argument("--frames", type=int, default=8,
                    help="frames per mp4 (the eval loader samples T=3 around "
                         "the annotated frame, as the reference does)")
    ap.add_argument("--resident_iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ocpg_tpu.config import a2d_r101_boxsup
    from ocpg_tpu.data.datasets import build_dataset
    from ocpg_tpu.data.loader import ClipLoader
    from ocpg_tpu.engine.evaluate import evaluate_a2d
    from ocpg_tpu.models import build_model
    from ocpg_tpu.models.text_encoder import SimpleTokenizer

    root = tempfile.mkdtemp(prefix="e2eeval_")
    try:
        t0 = time.time()
        build_a2d_tree(root, args.videos, args.frames)
        print(f"fixture tree built in {time.time() - t0:.1f}s", flush=True)

        cfg = a2d_r101_boxsup().replace(compute_dtype="bfloat16")
        model, *_ = build_model(cfg)
        dataset = build_dataset("a2d", root, "val", cfg.num_frames)
        loader = ClipLoader(dataset, 1,
                            tokenizer=SimpleTokenizer(None, vocab_size=cfg.text_vocab),
                            train=False, compact=True)
        host = next(iter(loader.epoch(0)))
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(host["samples"]), jnp.asarray(host["samples_mask"]),
            jnp.asarray(host["text_ids"]), jnp.asarray(host["text_mask"]),
            jnp.asarray(host["targets"]["size"]),
            valid_indices=jnp.zeros(len(host["samples"]), jnp.int32),
            train=False))()

        # warm passes: compile both configurations (discarded)
        t0 = time.time()
        evaluate_a2d(model, params, loader, readback="f16",
                     postprocess="host")
        warm_s = time.time() - t0
        print(f"warm host pass (incl. compile): {warm_s:.1f}s", flush=True)
        t0 = time.time()
        evaluate_a2d(model, params, loader, postprocess="device")
        print(f"warm device pass (incl. compile): "
              f"{time.time() - t0:.1f}s", flush=True)

        n_clips = len(dataset)
        # measured pass A — round-4 configuration: host postprocess over the
        # f16 full-canvas logit wire (the then-best serving knob)
        t0 = time.time()
        metrics_host = evaluate_a2d(model, params, loader, readback="f16",
                                    postprocess="host")
        e2e_ms = (time.time() - t0) / n_clips * 1000
        # measured pass B — round-5 default: device-fused postprocess
        # (crop + traced resize-to-original + threshold + bit-pack; the mask
        # wire is packed binary at native resolution, VERDICT r4 next-step 8)
        t0 = time.time()
        metrics = evaluate_a2d(model, params, loader, postprocess="device")
        e2e_dev_ms = (time.time() - t0) / n_clips * 1000

        # measured pass C — batched dispatch: this tunneled host is per-call
        # LATENCY-bound (round 5 measurement: cutting the mask wire 57x moved
        # e2e by ~0%), so the lever here is fewer round trips per clip.
        # batch=4 amortizes upload/execute/readback RTTs over 4 clips.
        loader4 = ClipLoader(dataset, 4,
                             tokenizer=SimpleTokenizer(None, vocab_size=cfg.text_vocab),
                             train=False, compact=True)
        evaluate_a2d(model, params, loader4, postprocess="device")  # warm
        t0 = time.time()
        metrics_b4 = evaluate_a2d(model, params, loader4, postprocess="device")
        e2e_dev_b4_ms = (time.time() - t0) / n_clips * 1000

        # device floor: same jitted forward on one resident batch, async
        # dispatch, block once at the end
        from ocpg_tpu.engine.evaluate import _eval_forward

        forward = _eval_forward(model, params, ("pred_logits", "pred_masks"))
        vi = jnp.zeros(len(host["samples"]), jnp.int32)
        out = forward(host["samples"], host["samples_mask"], host["text_ids"],
                      host["text_mask"], host["targets"]["size"], vi)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.resident_iters):
            out = forward(host["samples"], host["samples_mask"],
                          host["text_ids"], host["text_mask"],
                          host["targets"]["size"], vi)
        jax.block_until_ready(out)
        resident_ms = (time.perf_counter() - t0) / args.resident_iters * 1000

        artifact = {
            "backbone": "resnet101",
            "clips": n_clips,
            "shape": f"T={cfg.num_frames} canvas 512x640 bf16 "
                     f"({H}x{W} native mp4)",
            "e2e_eval_ms_per_clip_host_f16": round(e2e_ms, 1),
            "e2e_eval_ms_per_clip_device_post": round(e2e_dev_ms, 1),
            "e2e_eval_ms_per_clip_device_post_b4": round(e2e_dev_b4_ms, 1),
            "resident_forward_ms_per_clip": round(resident_ms, 1),
            "feed_overhead_pct_host_f16": round((e2e_ms / resident_ms - 1) * 100, 1),
            "feed_overhead_pct_device_post": round((e2e_dev_ms / resident_ms - 1) * 100, 1),
            "feed_overhead_pct_device_post_b4": round((e2e_dev_b4_ms / resident_ms - 1) * 100, 1),
            "metrics_b1_vs_b4_max_abs_delta": max(
                abs(metrics[k] - metrics_b4[k]) for k in metrics),
            "wire_format": "compact uint8 frames up; device post: packed "
                           "binary masks at native resolution down "
                           "(8 px/byte) + f32 logits",
            "metrics_finite": all(np.isfinite(v) for v in metrics.values()),
            "metrics_host_vs_device_max_abs_delta": max(
                abs(metrics[k] - metrics_host[k]) for k in metrics),
            "note": "pass-2 wall clock of engine.evaluate.evaluate_a2d over "
                    "the synthetic on-disk A2D tree (mp4 decode + h5 masks + "
                    "RLE postprocess + native-resolution metrics), reference "
                    "engine.py:126-194; resident floor is the same jitted "
                    "eval forward on a device-resident batch.  NB this "
                    "tunneled host is per-call latency-bound with ~2x "
                    "bandwidth drift between runs — compare passes within "
                    "one run only",
        }
        out_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "E2E_EVAL_TPU.json")
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(json.dumps(artifact))
        print(f"wrote {out_path}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
