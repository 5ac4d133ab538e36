"""HBM envelope: XLA compiled-memory analysis per production config.

VERDICT r3 next #6: table per-config device memory (R101 / Swin-B x train /
eval x recipe shapes x remat on/off) so batch-size scaling and whole-video
YTVOS inference (/root/reference/inference_ytvos.py:198 runs the full video
in one forward) have documented headroom.  Uses AOT `lower().compile()
.memory_analysis()` — the compiler's own peak-allocation accounting, no
execution needed — on whatever backend is default (the real chip under
axon).

Writes HBM_ENVELOPE.json at the repo root; each row records argument/output/
temp/total bytes.  v5e HBM is 16 GiB/chip.

Usage: python scripts/hbm_envelope.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

def _hbm_bytes():
    """HBM capacity of the attached device (ocpg_tpu.utils.hw) — not a
    hard-coded v5e constant (ADVICE r4)."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ocpg_tpu.utils.hw import tpu_spec

    return tpu_spec().hbm_bytes




def analyze_train(backbone, batch, frames, height, width, use_checkpoint):
    import jax
    import jax.numpy as jnp

    from ocpg_tpu.config import ytvos_r101_boxsup
    from ocpg_tpu.models import build_model
    from ocpg_tpu.engine import build_optimizer, create_train_state, make_train_step
    from ocpg_tpu.data.synthetic import synthetic_batch

    cfg = ytvos_r101_boxsup().replace(
        compute_dtype="bfloat16", backbone=backbone, num_frames=frames,
        use_checkpoint=use_checkpoint)
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    model, _, criterion_cfg, weight_dict = build_model(cfg)
    host = synthetic_batch(np.random.default_rng(0), batch=batch,
                           frames=frames, height=height, width=width)
    batch_d = {
        "samples": jnp.asarray(host["samples"]),
        "samples_mask": jnp.asarray(host["samples_mask"]),
        "text_ids": jnp.asarray(host["text_ids"]),
        "text_mask": jnp.asarray(host["text_mask"]),
        "targets": {k: jnp.asarray(v) for k, v in host["targets"].items()},
    }
    params = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), batch_d["samples"], batch_d["samples_mask"],
        batch_d["text_ids"], batch_d["text_mask"], batch_d["targets"]["size"],
        targets=batch_d["targets"], train=True))
    optimizer = build_optimizer(cfg, lr_drop_steps=[10**9])
    state = jax.eval_shape(lambda: create_train_state(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params), optimizer))
    step = make_train_step(model, criterion_cfg, weight_dict, optimizer)
    compiled = jax.jit(step, donate_argnums=(0,)).lower(state, batch_d).compile()
    return compiled.memory_analysis()


def analyze_eval(backbone, batch, frames, height, width):
    import jax
    import jax.numpy as jnp

    from ocpg_tpu.config import a2d_r101_boxsup
    from ocpg_tpu.models import build_model
    from ocpg_tpu.data.synthetic import synthetic_batch

    cfg = a2d_r101_boxsup().replace(compute_dtype="bfloat16", backbone=backbone)
    model, *_ = build_model(cfg)
    host = synthetic_batch(np.random.default_rng(0), batch=batch,
                           frames=frames, height=height, width=width)
    samples = jnp.asarray(host["samples"])
    args = (jnp.asarray(host["samples_mask"]), jnp.asarray(host["text_ids"]),
            jnp.asarray(host["text_mask"]), jnp.asarray(host["targets"]["size"]))
    vi = jnp.zeros((batch,), jnp.int32)
    params = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), samples, *args, valid_indices=vi, train=False))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    def fwd(p, s):
        return model.apply(p, s, *args, valid_indices=vi, train=False)["pred_masks"]

    compiled = jax.jit(fwd).lower(params, samples).compile()
    return compiled.memory_analysis()


def row_from(ma, **kw):
    rec = dict(kw)
    for field in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(ma, field, None)
        if v is not None:
            rec[field.replace("_in_bytes", "_mib")] = round(v / 1024**2, 1)
    total = sum(getattr(ma, f, 0) or 0
                for f in ("argument_size_in_bytes", "output_size_in_bytes",
                          "temp_size_in_bytes"))
    rec["total_mib"] = round(total / 1024**2, 1)
    rec["hbm_frac"] = round(total / _hbm_bytes(), 3)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only the four headline configs")
    args = ap.parse_args()

    rows = []

    train_grid = [
        # (backbone, bs, T, remat) at the train canvas 512x640
        ("resnet101", 1, 3, False),
        ("resnet101", 2, 3, False),
        ("resnet101", 4, 3, False),
        ("resnet101", 2, 5, False),
        ("video_swin_b_p4w7", 1, 3, True),
        ("video_swin_b_p4w7", 2, 3, True),
        ("video_swin_b_p4w7", 2, 3, False),
    ]
    eval_grid = [
        # (backbone, bs, T) at the inference canvas 384x640
        ("resnet101", 1, 5),
        ("resnet101", 1, 36),
        ("resnet101", 1, 72),          # whole-video YTVOS headroom probe
        ("video_swin_b_p4w7", 1, 5),
        ("video_swin_b_p4w7", 1, 36),
    ]
    if args.quick:
        train_grid = train_grid[:2]
        eval_grid = eval_grid[:2]

    for backbone, bs, t, remat in train_grid:
        tag = f"train {backbone} bs{bs} T{t} remat={'on' if remat else 'off'}"
        print(f"--- {tag} ---", flush=True)
        t0 = time.time()
        try:
            ma = analyze_train(backbone, bs, t, 512, 640, remat)
            rows.append(row_from(ma, mode="train", backbone=backbone, batch=bs,
                                 frames=t, canvas="512x640", remat=remat))
        except Exception as e:
            msg = str(e)
            oom = "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower()
            rows.append({"mode": "train", "backbone": backbone, "batch": bs,
                         "frames": t, "canvas": "512x640", "remat": remat,
                         "status": "compile_oom" if oom else "error",
                         "error": msg[:300]})
        print(json.dumps(rows[-1]), f"({time.time()-t0:.0f}s)", flush=True)

    for backbone, bs, t in eval_grid:
        tag = f"eval {backbone} bs{bs} T{t}"
        print(f"--- {tag} ---", flush=True)
        t0 = time.time()
        try:
            ma = analyze_eval(backbone, bs, t, 384, 640)
            rows.append(row_from(ma, mode="eval", backbone=backbone, batch=bs,
                                 frames=t, canvas="384x640"))
        except Exception as e:
            msg = str(e)
            oom = "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower()
            rows.append({"mode": "eval", "backbone": backbone, "batch": bs,
                         "frames": t, "canvas": "384x640",
                         "status": "compile_oom" if oom else "error",
                         "error": msg[:300]})
        print(json.dumps(rows[-1]), f"({time.time()-t0:.0f}s)", flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(root, "HBM_ENVELOPE.json")
    artifact = {
        "hbm_bytes_per_chip": _hbm_bytes(),
        "method": "jax.jit(...).lower(...).compile().memory_analysis() — "
                  "XLA's own peak-allocation accounting, AOT (no execution); "
                  "train rows donate the TrainState (in-place param/opt "
                  "buffers, as the production step does)",
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
