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
from ..evaluation.rle import rle_encode
from ..models.postprocessors import a2d_postprocess


def evaluate_a2d(model, params, loader, dataset_name: str = "a2d",
                 invert_masks: bool = False) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def forward(params, samples, samples_mask, ids, attn, sizes, vi):
        out = model.apply(params, samples, samples_mask, ids, attn, sizes,
                          valid_indices=vi, train=False)
        return out["pred_logits"], out["pred_masks"]

    predictions: List[Dict] = []
    ground_truths: List[Dict] = []
    img_counter = 0
    for batch in loader.epoch(0):
        vi = jnp.asarray(batch.get("valid_indices", np.zeros(len(batch["samples"]), np.int32)))
        logits, masks = forward(
            params, jnp.asarray(batch["samples"]), jnp.asarray(batch["samples_mask"]),
            jnp.asarray(batch["text_ids"]), jnp.asarray(batch["text_mask"]),
            jnp.asarray(batch["targets"]["size"]), vi)
        logits = np.asarray(logits)
        masks = np.asarray(masks)
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
        for i, res in enumerate(results):
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
