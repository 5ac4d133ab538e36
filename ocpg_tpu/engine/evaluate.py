"""A2D/JHMDB evaluation loop.

Reference: /root/reference/engine.py:126-194 — forward -> postprocess -> RLE
predictions -> (reference: pickled all_gather) -> COCOeval segm useCats=0 +
P@K/IoU.  Here predictions accumulate on the host per shard; the COCO-style
mAP and P@K/IoU come from ocpg_tpu.evaluation.a2d_metrics (pycocotools-free).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..evaluation.a2d_metrics import evaluate_a2d as _metrics
from ..evaluation.refexp_metrics import evaluate_refexp as _refexp_metrics
from ..evaluation.rle import rle_encode
from ..models.postprocessors import a2d_postprocess, refcoco_postprocess


def _eval_forward(model, params, outputs, mesh=None, out_dtype=None):
    """Jitted eval forward sharded over a 1-D data mesh.

    The reference shards eval across GPUs via DDP + pickled all_gather
    (engine.py:126-194); here the batch axis shards over `mesh` as one SPMD
    program (single-device meshes are the degenerate no-op case).

    `pred_masks` is cast to `out_dtype` ON DEVICE before readback: the a2d
    branch returns full-res all-query mask logits (B,T,Q,H,W) and that f32
    readback dominated the measured e2e eval wire (E2E_EVAL_TPU.json — the
    device forward is 71 ms/clip; ~10 of the ~13 MB/clip moved is masks).
    f16 halves it; mask logits are O(10), so sigmoid/threshold downstream
    moves by <1e-3 (same analysis as the serving engine's f16 readback,
    PROFILE.md round-12).  Other outputs (class logits, BOXES — whose
    cxcywh coordinates feed IoU-threshold metrics and must not be
    quantized) always stay f32.  The default is None (bit-exact f32 wire):
    these loops REPORT METRICS, so parity-grade is the right default —
    pass out_dtype='float16' (CLI: --readback f16) for wire-bound serving
    hosts.
    """
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, repl)

    def fwd(params, *args):
        import jax.numpy as jnp

        samples, samples_mask = args[0], args[1]
        if samples.dtype == jnp.uint8:
            # compact wire (ClipLoader(compact=True)): normalize on device,
            # padding re-zeroed in normalized space (see loader.decompress_batch)
            from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

            x = samples.astype(jnp.float32) / 255.0
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            args = (jnp.where(samples_mask[..., None], 0.0, x),) + args[1:]
        # 6 trailing args means the last is valid_indices (a2d/jhmdb path)
        out = model.apply(params, *args[:-1], valid_indices=args[-1], train=False) \
            if len(args) == 6 else model.apply(params, *args, train=False)
        # compact readback wire: cast ONLY the big mask tensor (see docstring)
        def _cast(k, x):
            if (out_dtype is not None and k == "pred_masks"
                    and jnp.issubdtype(x.dtype, jnp.floating)):
                return x.astype(out_dtype)
            return x
        return tuple(_cast(k, out[k]) for k in outputs)

    jitted = {}

    ndev = int(mesh.devices.size)

    def run(*args):
        import jax.numpy as jnp

        n_in = len(args)
        if n_in not in jitted:
            jitted[n_in] = jax.jit(fwd, in_shardings=(repl,) + (data,) * n_in,
                                   out_shardings=data)
        # P('data') requires batch % n_devices == 0: pad by repeating the
        # last sample (loaders usually pre-pad the tail; this guards callers
        # with arbitrary batch sizes, e.g. pretrain's val loader) and slice
        # the padding back off the outputs
        n = int(np.shape(args[0])[0])
        pad = (-n) % ndev
        if pad:
            args = tuple(
                jnp.concatenate([jnp.asarray(a)] + [jnp.asarray(a)[-1:]] * pad,
                                axis=0) for a in args)
        placed = [jax.device_put(jnp.asarray(a), data) for a in args]
        out = jitted[n_in](params, *placed)
        if pad:
            out = tuple(o[:n] for o in out)
        return out

    return run


def _resize_matrix_traced(src_len: int, dst_len: int, valid_src, valid_dst):
    """(dst_len, src_len) bilinear align_corners=False resize matrix whose
    source/target extents are TRACED scalars — the device-side counterpart of
    ops/image._resize_matrix for per-sample sizes inside one static-shape
    program.  Rows >= valid_dst are zeroed (host slices them off); columns
    >= valid_src are never touched (corner indices clamp to valid_src-1),
    so applying it to the padded canvas equals applying the static matrix to
    the cropped valid region.
    """
    import jax.numpy as jnp

    # src = (o + 0.5) * vs/vd - 0.5 = ((2o+1)*vs - vd) / (2*vd): the corner
    # index and fraction are computed with EXACT integer arithmetic (floor
    # division + remainder; all magnitudes < 2^23) so the weights match the
    # host path's float64-built static matrix to <= 1 ulp of f32 — a pure
    # f32 (o+0.5)*scale loses ~1 ulp of src (3e-5 at src~500), which moved
    # corner fractions by up to 5e-6 vs ops/image._resize_matrix.
    o = jnp.arange(dst_len, dtype=jnp.int32)
    vs_i = valid_src.astype(jnp.int32)
    vd_i = valid_dst.astype(jnp.int32)
    num2 = (2 * o + 1) * vs_i - vd_i           # 2*vd*src as an exact int
    den2 = 2 * vd_i
    x0 = jnp.floor_divide(num2, den2)
    dx = (num2 - x0 * den2).astype(jnp.float32) / den2.astype(jnp.float32)
    hi = vs_i - 1
    i0 = jnp.clip(x0, 0, hi)
    i1 = jnp.clip(x0 + 1, 0, hi)
    cols = jnp.arange(src_len, dtype=jnp.int32)[None, :]
    m = ((cols == i0[:, None]) * (1.0 - dx)[:, None]
         + (cols == i1[:, None]) * dx[:, None])
    return m * (o < vd_i)[:, None]


def _device_postprocess_forward(model, params, mesh, out_bucket):
    """Jitted eval forward that ALSO runs the A2D postprocess on device
    (VERDICT r4 next-step 8): crop to the valid region, bilinear-resize to
    the per-sample ORIGINAL size (traced resize matrices, static (OH, OW)
    output bucket), sigmoid-threshold, and bit-pack 8 pixels/byte.  The mask
    wire drops from f32-canvas (Q*H*W*4 bytes) to packed binary at native
    resolution (Q*OH*OW/8) — ~150x at bench shapes — and the per-sample
    host->device resize round-trip of the host postprocess disappears.

    The resize math mirrors the host path (two HIGHEST-precision einsums
    with torch align_corners=False corner weights), so thresholded outputs
    can differ only where the resized logit sits within float-reduction
    noise of exactly 0 (tests/test_engine.py pins agreement).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, repl)
    obh, obw = out_bucket
    ndev = int(mesh.devices.size)

    def fwd(params, samples, samples_mask, ids, amask, sizes, vi, orig_sizes):
        if samples.dtype == jnp.uint8:
            from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

            x = samples.astype(jnp.float32) / 255.0
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            samples = jnp.where(samples_mask[..., None], 0.0, x)
        out = model.apply(params, samples, samples_mask, ids, amask, sizes,
                          valid_indices=vi, train=False)
        masks = out["pred_masks"][:, 0].astype(jnp.float32)     # (B, Q, H, W)
        bsz, q, hc, wc = masks.shape

        def one(m, size, osize):
            mh = _resize_matrix_traced(hc, obh, size[0], osize[0])   # (OH, H)
            mw = _resize_matrix_traced(wc, obw, size[1], osize[1])   # (OW, W)
            y = jnp.einsum("oh,qhw->qow", mh, m,
                           precision=jax.lax.Precision.HIGHEST)
            y = jnp.einsum("pw,qow->qop", mw, y,
                           precision=jax.lax.Precision.HIGHEST)
            return y                                                  # (Q, OH, OW)

        resized = jax.vmap(one)(masks, sizes, orig_sizes)
        binary = (jax.nn.sigmoid(resized) > 0.5).astype(jnp.uint8)
        # bit-pack along W: 8 pixels/byte (np.unpackbits-compatible,
        # bitorder='big': first pixel in the MSB)
        packed = binary.reshape(bsz, q, obh, obw // 8, 8)
        weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
        packed = (packed * weights).sum(axis=-1).astype(jnp.uint8)
        return out["pred_logits"], packed

    jitted = jax.jit(fwd, in_shardings=(repl,) + (data,) * 7,
                     out_shardings=data)

    def run(*args):
        n = int(np.shape(args[0])[0])
        pad = (-n) % ndev
        if pad:
            args = tuple(
                jnp.concatenate([jnp.asarray(a)] + [jnp.asarray(a)[-1:]] * pad,
                                axis=0) for a in args)
        placed = [jax.device_put(jnp.asarray(a), data) for a in args]
        logits, packed = jitted(params, *placed)
        if pad:
            logits, packed = logits[:n], packed[:n]
        return logits, packed

    return run


def evaluate_a2d(model, params, loader, dataset_name: str = "a2d",
                 invert_masks: bool = False, mesh=None,
                 readback: str = "f32",
                 postprocess: str = "device") -> Dict[str, float]:
    """postprocess='device' (default) fuses crop/resize/threshold/bit-pack
    into the jitted forward (see _device_postprocess_forward); 'host' is the
    legacy bit-exact wire (full-canvas f32/f16 logits + numpy postprocess).
    """
    import jax
    import jax.numpy as jnp

    if postprocess == "device":
        return _evaluate_a2d_device(model, params, loader, invert_masks, mesh)

    forward = _eval_forward(
        model, params, ("pred_logits", "pred_masks"), mesh,
        out_dtype="float16" if readback == "f16" else None)

    predictions: List[Dict] = []
    ground_truths: List[Dict] = []
    img_counter = 0
    for batch in loader.epoch(0):
        real = int(batch.get("real_count", len(batch["samples"])))
        vi = jnp.asarray(batch.get("valid_indices", np.zeros(len(batch["samples"]), np.int32)))
        logits, masks = forward(
            batch["samples"], batch["samples_mask"],
            batch["text_ids"], batch["text_mask"],
            batch["targets"]["size"], vi)
        # f16 wire -> f32 for the numpy postprocess (bilinear resize etc.)
        logits = np.asarray(logits).astype(np.float32)
        masks = np.asarray(masks).astype(np.float32)
        sizes = np.asarray(batch["targets"]["size"])
        # dataset-native resolutions: the reference resizes predictions to the
        # original size before RLE (postprocessors.py:31-40) and scores against
        # native COCO annotations (engine.py:170-190)
        orig_sizes = np.asarray(batch["targets"].get("orig_size", sizes))
        results = a2d_postprocess(
            logits, masks,
            resized_sizes=[tuple(s) for s in sizes],
            orig_sizes=[tuple(s) for s in orig_sizes],
            invert_masks=invert_masks,
        )
        orig_masks = batch.get("orig_masks")
        gt_masks = np.asarray(batch["targets"]["masks"])
        vi_np = np.asarray(vi)
        for i, res in enumerate(results[:real]):
            image_id = f"img_{img_counter}"
            img_counter += 1
            for q in range(len(res["scores"])):
                predictions.append({
                    "image_id": image_id,
                    "score": float(res["scores"][q]),
                    "rle": res["rle_masks"][q],
                })
            t_annot = 0 if gt_masks.shape[1] == 1 else int(vi_np[i])
            if orig_masks is not None:
                gt = orig_masks[i][min(t_annot, orig_masks[i].shape[0] - 1)]
            else:
                h, w = sizes[i]
                gt = gt_masks[i, t_annot, :h, :w]
            ground_truths.append({
                "image_id": image_id,
                "rle": rle_encode(gt.astype(np.uint8)),
            })
    return _metrics(predictions, ground_truths)


def _evaluate_a2d_device(model, params, loader, invert_masks=False,
                         mesh=None) -> Dict[str, float]:
    """A2D eval with the device-fused postprocess (packed-binary mask wire).

    One jitted program per /64-bucketed max-original-size seen (A2D val is
    clips320H — effectively one bucket); predictions/ground truths and the
    metric surface are identical to the host path.
    """
    import collections

    forwards = {}
    predictions: List[Dict] = []
    ground_truths: List[Dict] = []
    img_counter = [0]
    # double-buffered dispatch (as the serving engine): JAX dispatch is
    # async, so the np.asarray readback of batch i happens only after batch
    # i+1 has been uploaded and dispatched — loader decode + host RLE work
    # overlap device compute instead of serializing with it
    inflight = collections.deque()

    def drain(item):
        batch, vi, sizes, orig_sizes, real, logits, packed = item
        logits = np.asarray(logits).astype(np.float32)
        packed = np.asarray(packed)                     # (B, Q, OH, OW//8) u8
        scores_all = 1.0 / (1.0 + np.exp(-logits[:, 0, :, 0]))
        orig_masks = batch.get("orig_masks")
        gt_masks = np.asarray(batch["targets"]["masks"])
        for i in range(real):
            oh, ow = orig_sizes[i]
            bits = np.unpackbits(packed[i], axis=-1)     # (Q, OH, OW)
            binary = bits[:, :oh, :ow].astype(bool)
            if invert_masks:
                binary = ~binary
            image_id = f"img_{img_counter[0]}"
            img_counter[0] += 1
            for q in range(binary.shape[0]):
                predictions.append({
                    "image_id": image_id,
                    "score": float(scores_all[i, q]),
                    "rle": rle_encode(binary[q].astype(np.uint8)),
                })
            t_annot = 0 if gt_masks.shape[1] == 1 else int(vi[i])
            if orig_masks is not None:
                gt = orig_masks[i][min(t_annot, orig_masks[i].shape[0] - 1)]
            else:
                h, w = sizes[i]
                gt = gt_masks[i, t_annot, :h, :w]
            ground_truths.append({
                "image_id": image_id,
                "rle": rle_encode(gt.astype(np.uint8)),
            })

    for batch in loader.epoch(0):
        real = int(batch.get("real_count", len(batch["samples"])))
        vi = np.asarray(batch.get("valid_indices",
                                  np.zeros(len(batch["samples"]), np.int32)))
        sizes = np.asarray(batch["targets"]["size"])
        orig_sizes = np.asarray(batch["targets"].get("orig_size", sizes))
        obh = int(-(-int(orig_sizes[:, 0].max()) // 64) * 64)
        obw = int(-(-int(orig_sizes[:, 1].max()) // 64) * 64)
        if (obh, obw) not in forwards:
            forwards[(obh, obw)] = _device_postprocess_forward(
                model, params, mesh, (obh, obw))
        logits, packed = forwards[(obh, obw)](
            batch["samples"], batch["samples_mask"],
            batch["text_ids"], batch["text_mask"],
            batch["targets"]["size"], vi, orig_sizes.astype(np.int32))
        inflight.append((batch, vi, sizes, orig_sizes, real, logits, packed))
        if len(inflight) >= 2:
            drain(inflight.popleft())
    while inflight:
        drain(inflight.popleft())
    return _metrics(predictions, ground_truths)


def evaluate_refexp_loop(model, params, loader, mesh=None,
                         readback: str = "f32") -> Dict[str, float]:
    """RefCOCO val evaluation: bbox P@k + segm P@K/IoU/mAP.

    Mirrors the reference pretrain eval (`/root/reference/main_pretrain.py:
    138-170` -> `engine.py:197-300`): PostProcess boxes + PostProcessSegm
    masks -> CocoEvaluator(bbox+segm) + RefExpEvaluator.  Here: native
    referring P@k for boxes (refexp_metrics) and the pycocotools-free
    COCO-style segm metrics (a2d_metrics), both at dataset-native resolution.
    """
    import jax
    import jax.numpy as jnp

    forward = _eval_forward(
        model, params, ("pred_logits", "pred_boxes", "pred_masks"), mesh,
        out_dtype="float16" if readback == "f16" else None)

    box_preds: List[Dict] = []
    box_gts: List[Dict] = []
    segm_preds: List[Dict] = []
    segm_gts: List[Dict] = []
    img_counter = 0
    for batch in loader.epoch(0):
        real = int(batch.get("real_count", len(batch["samples"])))
        logits, boxes, masks = forward(
            batch["samples"], batch["samples_mask"],
            batch["text_ids"], batch["text_mask"], batch["targets"]["size"])
        logits, boxes, masks = (np.asarray(a).astype(np.float32)
                                for a in (logits, boxes, masks))
        sizes = np.asarray(batch["targets"]["size"])
        orig_sizes = np.asarray(batch["targets"].get("orig_size", sizes))
        box_results = refcoco_postprocess(logits, boxes,
                                          [tuple(s) for s in orig_sizes])
        segm_results = a2d_postprocess(
            logits, masks, [tuple(s) for s in sizes],
            [tuple(s) for s in orig_sizes])
        gt_boxes = np.asarray(batch["targets"]["boxes"])     # normalized cxcywh
        orig_masks = batch.get("orig_masks")
        gt_masks = np.asarray(batch["targets"]["masks"])
        for i in range(real):
            image_id = img_counter
            img_counter += 1
            box_preds.append({
                "image_id": image_id,
                "boxes": box_results[i]["boxes"],
                "scores": box_results[i]["scores"],
            })
            oh, ow = orig_sizes[i]
            cx, cy, w, h = gt_boxes[i, 0]
            box_gts.append({
                "image_id": image_id,
                "box": np.asarray([(cx - w / 2) * ow, (cy - h / 2) * oh,
                                   (cx + w / 2) * ow, (cy + h / 2) * oh],
                                  np.float32),
            })
            for q in range(len(segm_results[i]["scores"])):
                segm_preds.append({
                    "image_id": image_id,
                    "score": float(segm_results[i]["scores"][q]),
                    "rle": segm_results[i]["rle_masks"][q],
                })
            if orig_masks is not None:
                gt = orig_masks[i][0]
            else:
                hh, ww = sizes[i]
                gt = gt_masks[i, 0, :hh, :ww]
            segm_gts.append({"image_id": image_id,
                             "rle": rle_encode(gt.astype(np.uint8))})
    out = {f"bbox_{k}": v for k, v in _refexp_metrics(box_preds, box_gts).items()}
    out.update({f"segm_{k}": v for k, v in _metrics(segm_preds, segm_gts).items()})
    # full CocoEvaluator bbox stats (AP/AP50/AP75, area ranges, maxDets) —
    # the reference prints these for pretrain eval (engine.py:256-271,
    # datasets/coco_eval.py:21-207)
    from ..evaluation.coco_eval import CocoEvaluatorLite

    coco_dts = [
        {"image_id": p["image_id"], "score": float(s), "box": np.asarray(b, np.float64)}
        for p in box_preds for s, b in zip(p["scores"], p["boxes"])
    ]
    coco_gts = [{"image_id": g["image_id"], "box": np.asarray(g["box"], np.float64)}
                for g in box_gts]
    out.update({f"coco_bbox_{k}": v
                for k, v in CocoEvaluatorLite("bbox").evaluate(coco_dts, coco_gts).items()})
    return out
