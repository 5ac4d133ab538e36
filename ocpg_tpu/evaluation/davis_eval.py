"""DAVIS 2017 evaluation harness (J&F over saved PNG results).

Reference: /root/reference/davis2017/ — DAVIS reader (davis.py), Results PNG
reader (results.py), semi-supervised and unsupervised protocols with
per-sequence Hungarian matching of proposals (evaluation.py:28-64), and
mean/recall/decay statistics (utils.py:135-162).  Framework-free numpy.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

from .davis_metrics import db_eval_boundary, db_eval_iou
from ..data.imageio import read_palette


def db_statistics(per_frame: np.ndarray) -> Tuple[float, float, float]:
    """(mean, recall, decay) over frames, dropping first/last (utils.py:135-162)."""
    M = np.nanmean(per_frame)
    R = np.nanmean(per_frame > 0.5)
    n_bins = 4
    ids = np.round(np.linspace(1, len(per_frame), n_bins + 1) + 1e-10) - 1
    ids = ids.astype(np.uint8)
    d_bins = [per_frame[ids[i]:ids[i + 1] + 1] for i in range(n_bins)]
    D = np.nanmean(d_bins[0]) - np.nanmean(d_bins[3])
    return float(M), float(R), float(D)


class DavisDataset:
    """Standard DAVIS17 layout reader: JPEGImages/, Annotations/, ImageSets/2017/."""

    def __init__(self, root: str, subset: str = "val", task: str = "unsupervised"):
        self.root = Path(root)
        self.task = task
        anno_dir = "Annotations_unsupervised" if task == "unsupervised" else "Annotations"
        self.anno_root = self.root / anno_dir
        if not self.anno_root.exists():
            self.anno_root = self.root / "Annotations"
        split_file = self.root / "ImageSets" / "2017" / f"{subset}.txt"
        if split_file.exists():
            self.sequences = [l.strip() for l in open(split_file) if l.strip()]
        else:
            self.sequences = sorted(p.name for p in self.anno_root.iterdir() if p.is_dir())

    def get_all_masks(self, seq: str) -> Tuple[np.ndarray, List[str]]:
        """Returns per-object GT masks (num_obj, T, H, W) and frame ids."""
        from PIL import Image

        files = sorted((self.anno_root / seq).glob("*.png"))
        ids = [f.stem for f in files]
        frames = np.stack([read_palette(f) for f in files])
        obj_ids = [int(o) for o in np.unique(frames) if o not in (0, 255)]
        masks = np.stack([(frames == o).astype(np.float32) for o in obj_ids]) \
            if obj_ids else np.zeros((0,) + frames.shape, np.float32)
        return masks, ids


class ResultsReader:
    def __init__(self, root: str):
        self.root = Path(root)

    def read_masks(self, seq: str, frame_ids: Sequence[str], num_objects: int) -> np.ndarray:
        from PIL import Image

        first = read_palette(self.root / seq / f"{frame_ids[0]}.png")
        frames = np.zeros((len(frame_ids),) + first.shape, first.dtype)
        for i, fid in enumerate(frame_ids):
            p = self.root / seq / f"{fid}.png"
            if p.exists():
                frames[i] = read_palette(p)
        obj_ids = [int(o) for o in np.unique(frames) if o not in (0, 255)]
        obj_ids = obj_ids or list(range(1, num_objects + 1))
        return np.stack([(frames == o).astype(np.float32) for o in obj_ids])


def evaluate_davis(davis_root: str, results_path: str, subset: str = "val",
                   task: str = "unsupervised") -> Dict:
    """DAVISEvaluation.evaluate equivalent (evaluation.py:66-110)."""
    dataset = DavisDataset(davis_root, subset, task)
    results = ResultsReader(results_path)
    metrics = {
        "J": {"M": [], "R": [], "D": [], "M_per_object": {}},
        "F": {"M": [], "R": [], "D": [], "M_per_object": {}},
    }
    for seq in dataset.sequences:
        gt_masks, frame_ids = dataset.get_all_masks(seq)
        if gt_masks.shape[0] == 0:
            continue
        if task == "semi-supervised":
            gt_masks, frame_ids = gt_masks[:, 1:-1], frame_ids[1:-1]
        res_masks = results.read_masks(seq, frame_ids, gt_masks.shape[0])
        if res_masks.shape[0] < gt_masks.shape[0]:
            pad = np.zeros((gt_masks.shape[0] - res_masks.shape[0],) + res_masks.shape[1:])
            res_masks = np.concatenate([res_masks, pad], axis=0)

        if task == "unsupervised":
            n_res, n_gt = res_masks.shape[0], gt_masks.shape[0]
            j = np.zeros((n_res, n_gt, gt_masks.shape[1]))
            f = np.zeros_like(j)
            for ii in range(n_gt):
                for jj in range(n_res):
                    j[jj, ii] = db_eval_iou(gt_masks[ii], res_masks[jj])
                    f[jj, ii] = db_eval_boundary(gt_masks[ii], res_masks[jj])
            score = (j.mean(axis=2) + f.mean(axis=2)) / 2
            row, col = linear_sum_assignment(-score)
            j_res, f_res = j[row, col], f[row, col]
        else:
            n_gt = gt_masks.shape[0]
            j_res = np.stack([db_eval_iou(gt_masks[i], res_masks[i]) for i in range(n_gt)])
            f_res = np.stack([db_eval_boundary(gt_masks[i], res_masks[i]) for i in range(n_gt)])

        for ii in range(gt_masks.shape[0]):
            name = f"{seq}_{ii + 1}"
            for key, arr in (("J", j_res), ("F", f_res)):
                m, r, d = db_statistics(arr[ii])
                metrics[key]["M"].append(m)
                metrics[key]["R"].append(r)
                metrics[key]["D"].append(d)
                metrics[key]["M_per_object"][name] = m
    return metrics


def global_summary(metrics: Dict) -> Dict[str, float]:
    J, F = metrics["J"], metrics["F"]
    return {
        "J&F-Mean": (float(np.mean(J["M"])) + float(np.mean(F["M"]))) / 2,
        "J-Mean": float(np.mean(J["M"])), "J-Recall": float(np.mean(J["R"])),
        "J-Decay": float(np.mean(J["D"])), "F-Mean": float(np.mean(F["M"])),
        "F-Recall": float(np.mean(F["R"])), "F-Decay": float(np.mean(F["D"])),
    }
