"""Train operating-point study: bs x frames sweep on the real chip.

VERDICT r3 weak #1 / next #1: the reference recipe trains at --batch_size 2
per GPU (/root/reference/scripts/dist_train_a2d_resnet101_boxsup.sh:23) and
T=5 recipes exist (opts.py:62-63), but every round-3 train number was bs=1
with no MFU.  This driver measures the train step at bs in {1, 2, 4} x
frames in {3, 5} for the requested backbones, each point in a FRESH process
(clean HBM; an OOM kills only that point and is recorded as such), and
writes TRAIN_OPPOINTS.json at the repo root.

Usage: python scripts/bench_train_sweep.py [--backbones resnet101 video_swin_b_p4w7]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(backbone, batch, frames, height, width, timeout=3600):
    out = tempfile.mktemp(suffix=".jsonl")
    cmd = [
        sys.executable, os.path.join(ROOT, "scripts", "bench_train.py"),
        "--backbone", backbone, "--batch", str(batch), "--frames", str(frames),
        "--height", str(height), "--width", str(width), "--json_out", out,
    ]
    # APPEND to PYTHONPATH: the login profile points it at the axon TPU
    # plugin's site dir; clobbering it kills the backend (verify SKILL.md)
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        return {"backbone": backbone, "batch": batch, "frames": frames,
                "status": "timeout"}
    rec = {"backbone": backbone, "batch": batch, "frames": frames,
           "height": height, "width": width,
           "wall_s": round(time.time() - t0, 1)}
    if proc.returncode == 0 and os.path.exists(out):
        with open(out) as f:
            rec.update(json.loads(f.readlines()[-1]))
        rec["status"] = "ok"
    else:
        tail = (proc.stderr or "")[-4000:]
        oom = ("RESOURCE_EXHAUSTED" in tail or "Out of memory" in tail
               or "out of memory" in tail)
        rec["status"] = "oom" if oom else f"failed(rc={proc.returncode})"
        rec["stderr_tail"] = tail[-800:]
    if os.path.exists(out):
        os.unlink(out)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbones", nargs="+",
                    default=["resnet101", "video_swin_b_p4w7"])
    ap.add_argument("--batches", nargs="+", type=int, default=[1, 2, 4])
    ap.add_argument("--frames", nargs="+", type=int, default=[3, 5])
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args()

    out_path = os.path.join(ROOT, "TRAIN_OPPOINTS.json")
    # merge with prior invocations: partial grids accumulate into one
    # artifact, keyed by (backbone, batch, frames); re-measuring replaces
    points = []
    if os.path.exists(out_path):
        try:
            old = json.load(open(out_path)).get("points", [])
            points = [p for p in old if p.get("status") != "failed(rc=1)"]
        except Exception:
            pass

    def upsert(rec):
        key = (rec["backbone"], rec["batch"], rec["frames"])
        points[:] = [p for p in points
                     if (p["backbone"], p["batch"], p["frames"]) != key]
        points.append(rec)

    def write_artifact():
        # incremental: a killed sweep still leaves every finished point
        artifact = {
            "canvas": f"{args.height}x{args.width} bf16",
            "method": "chained-scan paired-median (scripts/bench_train.py), "
                      "one fresh process per point",
            "reference_operating_point": "bs=2/GPU T=3 "
                "(dist_train_a2d_resnet101_boxsup.sh:23, opts.py:62-63)",
            "points": points,
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)

    for backbone in args.backbones:
        for frames in args.frames:
            for batch in args.batches:
                print(f"--- {backbone} bs={batch} T={frames} ---", flush=True)
                rec = run_point(backbone, batch, frames, args.height, args.width)
                print(json.dumps(rec), flush=True)
                upsert(rec)
                write_artifact()
                if rec["status"] == "oom":
                    # larger batches at this T will also OOM; skip them
                    break
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
