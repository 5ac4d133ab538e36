"""Offline pseudo-label generation for A2D and Ref-YouTube-VOS.

Reference: /root/reference/pre_process/generate_anno_a2d.py and
generate_anno_ytvos.py — per annotated frame: derive the object center via a
distance transform (`cv2.minMaxLoc(cv2.distanceTransform(mask))`,
generate_anno_a2d.py:110-114) and the GT box; run SimModel in point and bbox
modes; write `heatBBox`, `heatPoint`, `centerPoint` into an h5 next to the
original annotation keys (:146-155), consumed at train time by the dataset
readers.

Usage:
    python -m ocpg_tpu.preprocess.generate_anno --dataset a2d --root /data/a2d \
        --densecl checkpoints/densecl_r101.pth [--crf]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import cv2

from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
from ..data.imageio import read_palette, read_rgb


def object_center(mask: np.ndarray) -> tuple:
    """Interior point via distance transform (generate_anno_a2d.py:110-114)."""
    dist = cv2.distanceTransform((mask > 0).astype(np.uint8), cv2.DIST_L2, 5)
    _, _, _, max_loc = cv2.minMaxLoc(dist)
    return max_loc  # (x, y) pixels


def generate_for_frame(model, params, image_rgb: np.ndarray, inst_masks: np.ndarray,
                       use_crf: bool = False):
    """image_rgb: (H, W, 3) uint8; inst_masks: (N, H, W) binary GT.

    Returns (heatBBox (N, h, w), heatPoint (N, h, w), centerPoint (N, 2)).
    h, w are the image size (soft masks upsampled like the reference).
    """
    import jax.numpy as jnp

    from .sim_model import forward_bbox, forward_point

    h, w = image_rgb.shape[:2]
    x = (image_rgb.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    x = jnp.asarray(x[None])

    heat_bbox, heat_point, centers = [], [], []
    for m in inst_masks:
        if not (m > 0).any():
            heat_bbox.append(np.zeros((h, w), np.float32))
            heat_point.append(np.zeros((h, w), np.float32))
            centers.append((0, 0))
            continue
        cx, cy = object_center(m)
        ys, xs = np.where(m > 0)
        box = (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))

        hp = forward_point(model, params, x, (cx / w, cy / h))
        hb = forward_bbox(model, params, x, box)
        hp = cv2.resize(hp, (w, h), interpolation=cv2.INTER_LINEAR)
        hb = cv2.resize(hb, (w, h), interpolation=cv2.INTER_LINEAR)
        if use_crf:
            from .dense_crf import apply_dense_crf

            hp = apply_dense_crf(image_rgb, hp)
            hb = apply_dense_crf(image_rgb, hb)
        heat_point.append(hp.astype(np.float32))
        heat_bbox.append(hb.astype(np.float32))
        centers.append((cx, cy))
    return np.stack(heat_bbox), np.stack(heat_point), np.asarray(centers, np.float32)


def run_a2d(root: str, model, params, use_crf: bool):
    import h5py

    root_p = Path(root)
    mask_dir = root_p / "text_annotations" / "a2d_annotation_with_instances"
    videos_dir = root_p / "Release" / "clips320H"
    for vdir in sorted(mask_dir.iterdir()):
        if not vdir.is_dir():
            continue
        cap = cv2.VideoCapture(str(videos_dir / f"{vdir.name}.mp4"))
        frames = []
        while True:
            ok, fr = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
        cap.release()
        for hf in sorted(vdir.glob("*.h5")):
            frame_idx = int(hf.stem) - 1
            with h5py.File(hf, "r+") as f:
                masks = np.asarray(f["reMask"])
                if masks.ndim == 2:
                    masks = masks[None]
                masks = np.transpose(masks, (0, 2, 1))
                hb, hp, cp = generate_for_frame(model, params, frames[frame_idx],
                                                masks, use_crf)
                for key, val in (("heatBBox", hb), ("heatPoint", hp), ("centerPoint", cp)):
                    if key in f:
                        del f[key]
                    f.create_dataset(key, data=val)
        print(f"done {vdir.name}", flush=True)


def run_ytvos(root: str, model, params, use_crf: bool, split: str = "train"):
    import h5py
    from PIL import Image

    root_p = Path(root) / split
    ann_dir = root_p / "Annotations"
    img_dir = root_p / "JPEGImages"
    out_dir = root_p / "AnnotationsWeakly"
    for vdir in sorted(ann_dir.iterdir()):
        if not vdir.is_dir():
            continue
        (out_dir / vdir.name).mkdir(parents=True, exist_ok=True)
        for png in sorted(vdir.glob("*.png")):
            pal = read_palette(png)
            obj_ids = [int(o) for o in np.unique(pal) if o != 0]
            if not obj_ids:
                continue
            img = read_rgb(img_dir / vdir.name / f"{png.stem}.jpg")
            masks = np.stack([(pal == o).astype(np.float32) for o in obj_ids])
            hb, hp, cp = generate_for_frame(model, params, img, masks, use_crf)
            with h5py.File(out_dir / vdir.name / f"{png.stem}.h5", "w") as f:
                f.create_dataset("obj_ids", data=np.asarray(obj_ids))
                f.create_dataset("heatBBox", data=hb)
                f.create_dataset("heatPoint", data=hp)
                f.create_dataset("centerPoint", data=cp)
        print(f"done {vdir.name}", flush=True)


def main():
    p = argparse.ArgumentParser("pseudo-label generation")
    p.add_argument("--dataset", choices=["a2d", "ytvos"], required=True)
    p.add_argument("--root", required=True)
    p.add_argument("--densecl", default=None, help="DenseCL ResNet-101 torch ckpt")
    p.add_argument("--crf", action="store_true", help="apply dense-CRF refinement")
    args = p.parse_args()

    import jax

    from .sim_model import init_sim_model

    model, params = init_sim_model(jax.random.PRNGKey(0))
    if args.densecl:
        from ..utils.torch_weights import convert_resnet, load_torch_file

        sd = load_torch_file(args.densecl)
        p_conv, f_conv = convert_resnet(sd, (3, 4, 23, 3))
        params = {"params": p_conv, "frozen": f_conv}

    if args.dataset == "a2d":
        run_a2d(args.root, model, params, args.crf)
    else:
        run_ytvos(args.root, model, params, args.crf)


if __name__ == "__main__":
    main()
