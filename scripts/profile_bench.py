"""Profile the bench forward on the real TPU and print an op-level breakdown.

Usage:  python scripts/profile_bench.py [--frames 5] [--height 384] [--width 640]
                                        [--backbone resnet101] [--out PROFILE.md]

Captures a jax.profiler trace of the same chained-scan forward bench.py times,
parses the xplane with jax.profiler.ProfileData (no tensorboard needed), and
aggregates device-time by HLO op category and by top individual fusions.
This is the round-2 "performance pass" evidence artifact (VERDICT.md item 2).
"""

import argparse
import collections
import functools
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def categorize(name: str) -> str:
    """Map an HLO event to a coarse category.

    Uses only the RESULT name (before '=') — matching the full text would
    misattribute ops whose operand list mentions %convert/%copy operands
    (e.g. the MSDA custom-call used to land in "convolution").
    """
    n = name.split(" = ")[0].lower() if " = " in name else name.lower()
    if "custom-call" in n or "ms_deform" in n:
        return "custom-call(pallas|fft)"
    if "conv" in n and "convert" not in n:
        return "convolution"
    if "convolution" in n:
        return "convolution"
    if "dot" in n or "matmul" in n or "einsum" in n:
        return "matmul"
    if "gather" in n:
        return "gather"
    if "scatter" in n:
        return "scatter"
    if "fft" in n:
        return "fft"
    if "reduce-window" in n or "reduce_window" in n:
        return "reduce_window"
    if "all-reduce" in n or "all-gather" in n or "collective" in n or "psum" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "bitcast" in n or "reshape" in n:
        return "layout/copy"
    if "convert_reduce" in n or n.startswith("%reduce"):
        return "reduce(norms)"
    if "fusion" in n or "fused" in n:
        return "fusion(elementwise)"
    if "infeed" in n or "outfeed" in n or "transfer" in n:
        return "host_transfer"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--backbone", default="resnet101")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--trace_dir", default="/tmp/ocpg_profile")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ocpg_tpu.config import a2d_r101_boxsup
    from ocpg_tpu.models import build_model
    from ocpg_tpu.data.synthetic import synthetic_batch

    cfg = a2d_r101_boxsup().replace(compute_dtype="bfloat16", backbone=args.backbone)
    model, *_ = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, batch=1, frames=args.frames,
                            height=args.height, width=args.width)

    samples = jnp.asarray(batch["samples"])
    rest = (
        jnp.asarray(batch["samples_mask"]),
        jnp.asarray(batch["text_ids"]), jnp.asarray(batch["text_mask"]),
        jnp.asarray(batch["targets"]["size"]),
    )
    vi = jnp.zeros((1,), jnp.int32)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), samples, *rest,
                           valid_indices=vi, train=False))()

    @functools.partial(jax.jit, static_argnums=(2,))
    def chained(params, s, n_iters):
        def body(carry, _):
            out = model.apply(params, s + carry * 1e-6, *rest, valid_indices=vi,
                              train=False)["pred_masks"]
            return out.mean().astype(s.dtype), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), s.dtype), None, length=n_iters)
        return carry

    print("warmup/compile ...", flush=True)
    float(chained(params, samples, args.iters))

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        t0 = time.perf_counter()
        float(chained(params, samples, args.iters))
        wall = time.perf_counter() - t0
    print(f"traced {args.iters} iters in {wall*1e3:.1f} ms "
          f"({args.frames*args.iters/wall:.1f} f/s incl. dispatch)", flush=True)

    # newest .xplane.pb under trace_dir
    paths = sorted(glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no xplane under {args.trace_dir}"
    data = jax.profiler.ProfileData.from_file(paths[-1])

    # Collect every device-plane line, then keep the single busiest "op"
    # line (lines can repeat the same events at different nesting levels,
    # and the outer `while` wrapper would double-count its children).
    candidates = []   # (line_name, [(name, dur_ns), ...])
    for plane in data.planes:
        pname = plane.name or ""
        if "TPU" not in pname and "/device:" not in pname:
            continue
        for line in plane.lines:
            evs = [(ev.name, int(ev.duration_ns)) for ev in line.events]
            if evs:
                candidates.append((line.name or "?", evs))
    assert candidates, "no device-plane events in trace"

    def line_total(evs):
        return sum(d for n, d in evs if not n.startswith("%while"))

    # Prefer the synchronous "XLA Ops" line: "Async XLA Ops" durations overlap
    # compute and double-count wall time; "XLA Modules" has no op detail.
    sync = [c for c in candidates if c[0] == "XLA Ops"]
    lname, evs = sync[0] if sync else max(candidates, key=lambda c: line_total(c[1]))
    print(f"using line: {lname!r} ({len(evs)} events)")
    per_op = collections.Counter()          # ns by op, `while` wrappers excluded
    per_cat = collections.Counter()
    device_total = 0
    for name, dur in evs:
        if name.startswith("%while"):
            continue        # scan wrapper: its children are counted directly
        per_op[name] += dur
        per_cat[categorize(name)] += dur
        device_total += dur

    lines_out = []
    lines_out.append(f"device total: {device_total/1e6:.2f} ms over {args.iters} iters "
                     f"({device_total/1e6/args.iters:.2f} ms/clip, "
                     f"{args.frames*args.iters*1e9/max(device_total,1):.1f} f/s device-time)")
    lines_out.append("")
    lines_out.append("## By category")
    lines_out.append("")
    lines_out.append("| category | ms | % |")
    lines_out.append("|---|---|---|")
    for cat, ns in per_cat.most_common():
        lines_out.append(f"| {cat} | {ns/1e6:.2f} | {100*ns/max(device_total,1):.1f}% |")
    lines_out.append("")
    lines_out.append("## Top 40 ops")
    lines_out.append("")
    lines_out.append("| op | ms | % |")
    lines_out.append("|---|---|---|")
    for name, ns in per_op.most_common(40):
        short = re.sub(r"\s+", " ", name)[:110]
        lines_out.append(f"| `{short}` | {ns/1e6:.2f} | {100*ns/max(device_total,1):.1f}% |")

    # custom-call detail: every Pallas call individually (encoder vs decoder
    # MSDA calls have very different query counts but identical kernel names)
    lines_out.append("")
    lines_out.append("## custom-call detail")
    lines_out.append("")
    lines_out.append("| op | ms | count |")
    lines_out.append("|---|---|---|")
    cc_counts = collections.Counter()
    for name, dur in evs:
        if name.startswith("%while"):
            continue
        if categorize(name) == "custom-call(pallas|fft)":
            cc_counts[name] += 1
    for name, ns in per_op.most_common():
        if categorize(name) != "custom-call(pallas|fft)":
            continue
        short = re.sub(r"\s+", " ", name)[:130]
        lines_out.append(f"| `{short}` | {ns/1e6:.2f} | {cc_counts[name]} |")

    # layout/copy deep-dive: aggregate by result shape so thousands of small
    # partition/relayout copies become attributable
    shape_re = re.compile(r"=\s+\(?\s*([a-z0-9]+\[[0-9,]*\])")
    per_copy_shape = collections.Counter()
    copy_counts = collections.Counter()
    for name, dur in evs:
        if name.startswith("%while") or categorize(name) != "layout/copy":
            continue
        m = shape_re.search(name)
        key = m.group(1) if m else "?"
        per_copy_shape[key] += dur
        copy_counts[key] += 1
    lines_out.append("")
    lines_out.append("## layout/copy by result shape (top 25)")
    lines_out.append("")
    lines_out.append("| shape | ms | count |")
    lines_out.append("|---|---|---|")
    for key, ns in per_copy_shape.most_common(25):
        lines_out.append(f"| `{key}` | {ns/1e6:.2f} | {copy_counts[key]} |")

    report = "\n".join(lines_out)
    print(report)
    if args.out and args.out != "-":     # "-" = stdout only
        with open(args.out, "w") as f:
            f.write(f"# Bench profile — {args.backbone} {args.frames}f "
                    f"{args.height}x{args.width} bf16\n\n" + report + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
