"""Data stack tests: synthetic on-disk YTVOS layout -> reader -> transforms
-> fixed-canvas loader batches."""
import json
import random

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def ytvos_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ytvos")
    rng = np.random.default_rng(0)
    video = "vid0"
    frames = [f"{i:05d}" for i in range(6)]
    (root / "train" / "JPEGImages" / video).mkdir(parents=True)
    (root / "train" / "Annotations" / video).mkdir(parents=True)
    (root / "train" / "AnnotationsWeakly" / video).mkdir(parents=True)
    h, w = 64, 80
    for name in frames:
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "train" / "JPEGImages" / video / f"{name}.jpg")
        pal = np.zeros((h, w), np.uint8)
        pal[20:40, 25:55] = 1
        Image.fromarray(pal, mode="P").save(root / "train" / "Annotations" / video / f"{name}.png")
        heat = np.zeros((1, h, w), np.float32)
        heat[0, 18:42, 22:58] = 0.9
        with h5py.File(root / "train" / "AnnotationsWeakly" / video / f"{name}.h5", "w") as f:
            f.create_dataset("obj_ids", data=np.asarray([1]))
            f.create_dataset("heatPoint", data=heat)
            f.create_dataset("heatBBox", data=heat)
    meta = {"videos": {video: {
        "frames": frames,
        "expressions": {"0": {"exp": "a red square on the left", "obj_id": "1"}},
    }}}
    (root / "meta_expressions" / "train").mkdir(parents=True)
    with open(root / "meta_expressions" / "train" / "meta_expressions.json", "w") as f:
        json.dump(meta, f)
    return root


def test_ytvos_reader(ytvos_root):
    from ocpg_tpu.data.datasets import YTVOSDataset

    ds = YTVOSDataset(str(ytvos_root), num_frames=3, supervision="box")
    assert len(ds) == 6  # one meta per anchor frame
    rec = ds.get_clip(0, random.Random(0))
    clip = rec.clip
    assert clip.frames.shape == (3, 64, 80, 3)
    assert clip.masks.shape == (3, 64, 80)
    assert clip.valid.all()
    assert clip.weak_masks.max() == 1.0
    assert clip.boxes.shape == (3, 4)
    assert (clip.boxes[:, 2] > clip.boxes[:, 0]).all()
    assert clip.caption == "a red square on the left"


def test_transforms_and_loader(ytvos_root):
    from ocpg_tpu.data.datasets import YTVOSDataset
    from ocpg_tpu.data.loader import ClipLoader

    ds = YTVOSDataset(str(ytvos_root), num_frames=3, supervision="box")
    loader = ClipLoader(ds, batch_size=2, canvas=(512, 640), train=True,
                        num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 3  # 6 samples / batch 2
    b = batches[0]
    assert b["samples"].shape == (2, 3, 512, 640, 3)
    assert b["samples_mask"].shape == (2, 3, 512, 640)
    assert b["targets"]["boxes"].shape == (2, 3, 4)
    # boxes normalized cxcywh
    assert (b["targets"]["boxes"] >= 0).all() and (b["targets"]["boxes"] <= 1).all()
    assert b["targets"]["masks"].shape == (2, 3, 512, 640)
    assert b["text_ids"].shape[0] == 2
    # pad mask is True outside the resized image
    sizes = b["targets"]["size"]
    for i in range(2):
        hh, ww = sizes[i]
        assert not b["samples_mask"][i, :, :hh, :ww].any()
        assert b["samples_mask"][i, :, hh:, :].all() or hh == 512


def test_hflip_caption_swap():
    from ocpg_tpu.data.transforms import Clip, random_hflip

    clip = Clip(
        frames=np.zeros((1, 8, 8, 3), np.float32),
        boxes=np.array([[1.0, 2.0, 5.0, 6.0]], np.float32),
        masks=np.zeros((1, 8, 8), np.float32),
        weak_masks=np.zeros((1, 8, 8), np.float32),
        weights=np.zeros((1, 8, 8), np.float32),
        valid=np.ones(1, np.int32),
        labels=np.zeros(1, np.int32),
        caption="the left dog right here",
    )
    out = random_hflip(clip, p=1.1)  # always flip
    assert out.caption == "the right dog left here"
    np.testing.assert_allclose(out.boxes[0], [8 - 5, 2, 8 - 1, 6])


def test_weight2mask():
    from ocpg_tpu.data.datasets import weight2mask

    heat = np.zeros((2, 10, 12), np.float32)
    heat[0, 2:6, 3:9] = 0.9
    heat[1, 7:9, 1:4] = 0.8
    mask, box = weight2mask(heat, 0)
    assert mask.shape == (10, 12)
    assert mask[3, 5] == 1 and mask[8, 2] == 0
    x0, y0, x1, y1 = box
    assert 2 <= x0 <= 4 and 8 <= x1 <= 10 and 1 <= y0 <= 3 and 5 <= y1 <= 7
