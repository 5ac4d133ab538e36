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
                        num_workers=2, text_vocab=50265)
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


def test_refer_api_and_refexp2coco(tmp_path):
    """Standalone REFER API (reference datasets/refer.py) + the refexp2coco
    conversion tool on synthetic refs(unc).p + instances.json fixtures."""
    import json
    import pickle

    import numpy as np

    refs = [
        {"ref_id": 1, "ann_id": 10, "image_id": 100, "category_id": 1,
         "split": "train",
         "sentences": [{"sent_id": 0, "sent": "the red dog",
                        "tokens": ["the", "red", "dog"]},
                       {"sent_id": 1, "sent": "left animal",
                        "tokens": ["left", "animal"]}]},
        {"ref_id": 2, "ann_id": 11, "image_id": 100, "category_id": 2,
         "split": "val",
         "sentences": [{"sent_id": 2, "sent": "blue box",
                        "tokens": ["blue", "box"]}]},
        {"ref_id": 3, "ann_id": 12, "image_id": 101, "category_id": 1,
         "split": "testA",
         "sentences": [{"sent_id": 3, "sent": "a thing",
                        "tokens": ["a", "thing"]}]},
    ]
    instances = {
        "images": [
            {"id": 100, "file_name": "a.jpg", "height": 20, "width": 30},
            {"id": 101, "file_name": "b.jpg", "height": 16, "width": 16},
        ],
        "annotations": [
            {"id": 10, "image_id": 100, "bbox": [2, 2, 8, 6],
             "segmentation": [[2, 2, 10, 2, 10, 8, 2, 8]], "category_id": 1},
            {"id": 11, "image_id": 100, "bbox": [12, 3, 5, 5],
             "segmentation": [[12, 3, 17, 3, 17, 8, 12, 8]], "category_id": 2},
            {"id": 12, "image_id": 101, "bbox": [1, 1, 4, 4],
             "segmentation": [[1, 1, 5, 1, 5, 5, 1, 5]], "category_id": 1},
        ],
        "categories": [{"id": 1, "name": "dog"}, {"id": 2, "name": "box"}],
    }
    root = tmp_path / "refcoco"
    root.mkdir()
    with open(root / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    with open(root / "instances.json", "w") as f:
        json.dump(instances, f)

    from ocpg_tpu.data.refer import REFER

    refer = REFER(str(tmp_path), "refcoco", "unc")
    assert refer.getRefIds(split="train") == [1]
    assert refer.getRefIds(split="test") == [3]       # "test" matches testA
    assert refer.getRefIds(image_ids=[100]) == [1, 2]
    assert refer.getRefIds(cat_ids=[1]) == [1, 3]
    assert refer.getAnnIds(ref_ids=[2]) == [11]
    assert set(refer.getImgIds(ref_ids=[1, 3])) == {100, 101}
    assert refer.loadCats(1) == ["dog"]
    assert refer.getRefBox(1) == [2, 2, 8, 6]
    assert refer.sentToRef[2]["ref_id"] == 2
    m = refer.getMask(refer.Refs[1])
    assert m["mask"].shape == (20, 30) and m["area"] > 0

    from ocpg_tpu.cli.tools import refexp_to_coco

    out_dir = tmp_path / "out"
    refexp_to_coco(str(tmp_path), "refcoco", "unc", str(out_dir))
    with open(out_dir / "instances_refcoco_train.json") as f:
        train = json.load(f)
    assert len(train["images"]) == 2            # one per (ref, sentence)
    assert train["images"][0]["caption"] == "the red dog"
    assert len(train["annotations"]) == 2
    assert (out_dir / "instances_refcoco_val.json").exists()
    assert (out_dir / "instances_refcoco_testA.json").exists()


def test_eval_loader_covers_all_samples(ytvos_root):
    """Eval iteration must score every sample: the tail batch is padded
    (repeating the last sample) and carries real_count for slicing."""
    from ocpg_tpu.data.datasets import YTVOSDataset
    from ocpg_tpu.data.loader import ClipLoader

    ds = YTVOSDataset(str(ytvos_root), num_frames=2, supervision="box")
    assert len(ds) == 6
    loader = ClipLoader(ds, batch_size=4, train=False, canvas=(512, 640),
                        num_workers=2, text_vocab=50265)
    batches = list(loader.epoch(0))
    assert len(batches) == 2                       # ceil(6 / 4)
    reals = [b.get("real_count", len(b["samples"])) for b in batches]
    assert sorted(reals) == [2, 4]                 # 6 samples total
    for b in batches:
        assert b["samples"].shape[0] == 4          # static batch shape

    # train mode keeps drop-remainder semantics (static step count)
    tr = ClipLoader(ds, batch_size=4, train=True, canvas=(512, 640),
                    num_workers=2, text_vocab=50265)
    tr_batches = list(tr.epoch(0))
    assert len(tr_batches) == 1
    assert "real_count" not in tr_batches[0]


def test_loader_deterministic_across_runs(ytvos_root):
    """Two loaders with the same seed must produce identical batches
    (epoch-seeded determinism incl. the transform rng — reference
    DistributedSampler semantics, datasets/samplers.py:16-72)."""
    from ocpg_tpu.data.datasets import YTVOSDataset
    from ocpg_tpu.data.loader import ClipLoader

    ds = YTVOSDataset(str(ytvos_root), num_frames=2, supervision="box")

    def run():
        loader = ClipLoader(ds, batch_size=2, train=True, canvas=(512, 640),
                            num_workers=2, seed=7, text_vocab=50265)
        return {bi: b for bi, b in enumerate(loader.epoch(3))}

    a, b = run(), run()
    assert a.keys() == b.keys()
    tot = 0.0
    for k in a:
        np.testing.assert_array_equal(a[k]["samples"], b[k]["samples"])
        np.testing.assert_array_equal(a[k]["targets"]["boxes"], b[k]["targets"]["boxes"])
        tot += float(np.abs(a[k]["samples"]).sum())
    assert tot > 0


@pytest.fixture(scope="module")
def a2d_root(tmp_path_factory):
    """Synthetic A2D-Sentences layout: mp4 clip + instance h5 + annotation csv."""
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("a2d")
    vid = "vidA"
    h, w, n_frames = 64, 80, 8
    (root / "Release" / "clips320H").mkdir(parents=True)
    (root / "text_annotations" / "a2d_annotation_with_instances" / vid).mkdir(parents=True)

    rng = np.random.default_rng(1)
    writer = cv2.VideoWriter(
        str(root / "Release" / "clips320H" / f"{vid}.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    for _ in range(n_frames):
        writer.write((rng.random((h, w, 3)) * 255).astype(np.uint8))
    writer.release()

    # annotated frame 4 (1-indexed), instance 2; reMask stored TRANSPOSED
    mask = np.zeros((h, w), np.uint8)
    mask[20:40, 30:60] = 1
    heat = np.zeros((1, h, w), np.float32)
    heat[0, 18:42, 28:62] = 0.8
    with h5py.File(root / "text_annotations" / "a2d_annotation_with_instances"
                   / vid / "00004.h5", "w") as f:
        f.create_dataset("instance", data=np.asarray([2]))
        f.create_dataset("reMask", data=mask.T)
        f.create_dataset("heatBBox", data=heat)
        f.create_dataset("heatPoint", data=heat)

    with open(root / "text_annotations" / "a2d_annotation.txt", "w") as f:
        f.write("video_id,instance_id,query\n")
        f.write(f"{vid},2,a person running left\n")
    with open(root / "Release" / "videoset.csv", "w") as f:
        f.write(f"{vid},x,x,x,x,x,x,x,0\n")
    return root


def test_a2d_reader(a2d_root):
    """A2D reader: mp4 decode, transposed reMask, heat weak boxes,
    valid_indices on the annotated frame (reference datasets/a2d.py)."""
    import random as random_mod

    from ocpg_tpu.data.datasets import A2DSentencesDataset

    ds = A2DSentencesDataset(str(a2d_root), num_frames=3, supervision="box",
                             split="train")
    assert len(ds) == 1
    rec = ds.get_clip(0, random_mod.Random(0))
    clip = rec.clip
    assert clip.frames.shape == (3, 64, 80, 3)
    # single annotated frame: (1, h, w) targets + valid_indices
    assert clip.masks.shape == (1, 64, 80)
    assert rec.valid_indices is not None
    # reMask was stored transposed; the reader must undo it
    ys, xs = np.where(clip.masks[0] > 0)
    assert ys.min() == 20 and ys.max() == 39
    assert xs.min() == 30 and xs.max() == 59
    assert clip.valid[0] == 1
    assert clip.boxes.shape == (1, 4)
    x0, y0, x1, y1 = clip.boxes[0]
    assert 25 <= x0 <= 32 and 15 <= y0 <= 22
    assert clip.caption == "a person running left"

    # val split centers the window on the annotated frame
    ds_val = A2DSentencesDataset(str(a2d_root), num_frames=3,
                                 supervision="box", split="train")
    rec2 = ds_val.get_clip(0, random_mod.Random(1))
    assert rec2.clip.weights.shape == (1, 64, 80)
    assert rec2.clip.weights.max() > 0


def test_jhmdb_reader_deterministic(tmp_path_factory):
    """JHMDB reader: .mat puppet masks, centered window, and deterministic
    per-sample frame choice (two eval runs -> identical clips)."""
    sio = pytest.importorskip("scipy.io")
    root = tmp_path_factory.mktemp("jhmdb")
    vid = "vidJ"
    h, w, n_frames = 48, 64, 6
    rng = np.random.default_rng(2)
    (root / "Rename_Images" / "catch" / vid).mkdir(parents=True)
    (root / "puppet_mask" / "catch" / vid).mkdir(parents=True)
    for i in range(n_frames):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "Rename_Images" / "catch" / vid / f"{i+1:05d}.png")
    puppet = np.zeros((h, w, 4), np.uint8)   # 4 annotated frames
    puppet[10:30, 20:50, :] = 1
    sio.savemat(root / "puppet_mask" / "catch" / vid / "puppet_mask.mat",
                {"part_mask": puppet})
    with open(root / "jhmdb_annotation.txt", "w") as f:
        f.write("video_id,query\n")
        f.write(f"{vid},someone catching a ball\n")

    import random as random_mod

    from ocpg_tpu.data.datasets import JHMDBSentencesDataset

    ds = JHMDBSentencesDataset(str(root), num_frames=3)
    assert len(ds) == 1
    rec1 = ds.get_clip(0, random_mod.Random(0))
    rec2 = ds.get_clip(0, random_mod.Random(999))  # caller rng must not matter
    np.testing.assert_array_equal(rec1.clip.frames, rec2.clip.frames)
    assert rec1.valid_indices == rec2.valid_indices
    clip = rec1.clip
    assert clip.frames.shape == (3, h, w, 3)
    assert clip.masks.shape == (1, h, w)
    assert clip.valid[0] == 1
    ys, xs = np.where(clip.masks[0] > 0)
    assert ys.min() == 10 and xs.max() == 49
    assert clip.caption == "someone catching a ball"


def test_davis_reader(ytvos_root, tmp_path_factory):
    """Ref-DAVIS reader: ytvos-style metas with fully-supervised palette masks."""
    from ocpg_tpu.data.datasets import DAVISDataset

    # the ytvos fixture layout matches DAVIS' (meta_expressions + JPEGImages +
    # Annotations); reuse it as a DAVIS root
    import random as random_mod

    ds = DAVISDataset(str(ytvos_root), num_frames=3, split="train")
    assert len(ds) > 0
    rec = ds.get_clip(0, random_mod.Random(0))
    clip = rec.clip
    assert clip.frames.shape == (3, 64, 80, 3)
    assert clip.masks.shape == (3, 64, 80)
    assert clip.masks.max() == 1.0            # object id 1 selected
    assert clip.valid.any()
    assert (clip.boxes[:, 2] > clip.boxes[:, 0]).all()


def test_joint_registry(ytvos_root, tmp_path_factory):
    """`joint` / `joint_coco` / `ytvos_joint_davis` registry entries
    (reference: datasets/concat_dataset.py:19-62, datasets/__init__.py:30-46)."""
    from ocpg_tpu.data.datasets import build_dataset

    # minimal COCO-format refexp tree: train2014/ images + per-dataset JSONs
    coco = tmp_path_factory.mktemp("coco")
    (coco / "train2014").mkdir()
    rng = np.random.default_rng(1)
    img = (rng.random((32, 40, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(coco / "train2014" / "a.jpg")
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 32, "width": 40,
                    "caption": "the red thing"}],
        "annotations": [{"id": 1, "image_id": 1, "bbox": [4, 4, 12, 10],
                         "segmentation": [[4, 4, 16, 4, 16, 14, 4, 14]],
                         "category_id": 1}],
        "categories": [{"id": 1, "name": "thing"}],
    }
    for n in ("refcoco", "refcoco+", "refcocog"):
        with open(coco / f"instances_{n}_train.json", "w") as f:
            json.dump(ann, f)

    ds = build_dataset("joint", str(ytvos_root), "train", 3, "full",
                       coco_path=str(coco))
    # 3 refcoco datasets x 1 item + 6 ytvos metas
    assert len(ds) == 3 * 1 + 6
    first = ds.get_clip(0, random.Random(0)).clip        # refcoco pseudo-clip
    last = ds.get_clip(len(ds) - 1, random.Random(0)).clip  # ytvos clip
    assert first.frames.shape[0] == 3 and first.caption == "the red thing"
    assert last.frames.shape == (3, 64, 80, 3)

    ds_coco = build_dataset("joint_coco", None, "train", 3, "full",
                            coco_path=str(coco))
    assert len(ds_coco) == 3

    ds_jd = build_dataset("ytvos_joint_davis", str(ytvos_root), "train", 3,
                          "full", davis_path=str(ytvos_root))
    # davis x5 oversampling + ytvos (fixture layouts are compatible)
    assert len(ds_jd) == 5 * 6 + 6

    with pytest.raises(ValueError):
        build_dataset("joint", str(ytvos_root), "train", 3, "full")


def test_compact_wire_roundtrip(ytvos_root):
    """Compact wire batches (uint8 frames, u8 masks, f16 heatmaps) must
    decompress on device to the f32 pipeline's output: exact for the binary
    maps, <=0.5/255 pixel rounding for frames, ~f16 eps for heatmaps."""
    import jax

    from ocpg_tpu.data.datasets import YTVOSDataset
    from ocpg_tpu.data.loader import ClipLoader, decompress_batch

    ds = YTVOSDataset(str(ytvos_root), num_frames=3, supervision="box")
    kw = dict(batch_size=2, canvas=(512, 640), train=True, num_workers=1,
              seed=7, text_vocab=50265)
    ref = next(iter(ClipLoader(ds, **kw).epoch(0)))
    raw = next(iter(ClipLoader(ds, compact=True, **kw).epoch(0)))

    assert raw["samples"].dtype == np.uint8
    assert raw["targets"]["masks"].dtype == np.uint8
    assert raw["targets"]["weights"].dtype == np.float16
    got = jax.device_get(decompress_batch(raw))
    assert got["samples"].dtype == np.float32

    # frames: rounding of interpolated pixels, <= (0.5/255)/min(std)
    np.testing.assert_allclose(got["samples"], ref["samples"], atol=0.01)
    # padded region re-zeroed in normalized space (NestedTensor semantics)
    pad = ref["samples_mask"]
    np.testing.assert_array_equal(got["samples"][pad], 0.0)
    np.testing.assert_array_equal(got["targets"]["masks"],
                                  ref["targets"]["masks"])
    np.testing.assert_array_equal(got["targets"]["weak_masks"],
                                  ref["targets"]["weak_masks"])
    np.testing.assert_allclose(got["targets"]["weights"],
                               ref["targets"]["weights"], atol=1e-3)
    np.testing.assert_array_equal(got["targets"]["boxes"],
                                  ref["targets"]["boxes"])
