"""ClipInferenceEngine: mesh-sharded batching, bucketed static shapes.

Validates the TPU replacement for the reference's per-GPU mp.Process
inference sharding (/root/reference/inference_davis.py:97-109): requests of
varying shapes run over an 8-device CPU mesh with a bounded compile count,
outputs are sharded over all devices, and results match a direct single-clip
forward on the same canvas.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ocpg_tpu.config import OCPGConfig
from ocpg_tpu.engine.infer import ClipInferenceEngine, InferRequest, pick_bucket
from ocpg_tpu.models import build_model


def test_pick_bucket():
    buckets = ((384, 640), (512, 640), (640, 512))
    assert pick_bucket(360, 640, buckets) == (384, 640)
    assert pick_bucket(384, 640, buckets) == (384, 640)
    assert pick_bucket(400, 600, buckets) == (512, 640)
    assert pick_bucket(640, 480, buckets) == (640, 512)
    # nothing fits: /64-aligned exact canvas
    assert pick_bucket(700, 700, buckets) == (704, 704)


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = OCPGConfig(
        backbone="resnet50", enc_layers=1, dec_layers=2, dim_feedforward=64,
        num_queries=5, num_frames=2, compute_dtype="float32",
        dataset_file="davis",
        text_layers=2, text_hidden=128, text_heads=4, text_ffn=256,
        text_vocab=2048,
    )
    model, *_ = build_model(cfg)
    t, h, w, lt = 2, 64, 64, 8
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, t, h, w, 3)),
        jnp.zeros((1, t, h, w), bool), jnp.zeros((1, lt), jnp.int32),
        jnp.ones((1, lt), jnp.int32), jnp.asarray([[h, w]], jnp.int32),
        train=False)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("data",))
    engine = ClipInferenceEngine(model, params, mesh=mesh, clip_len=2,
                                 buckets=((64, 64), (64, 128)))
    return model, params, engine


def test_engine_batches_buckets_and_crops(rng, tiny_engine):
    model, params, engine = tiny_engine
    lt = 8
    reqs = []
    # 10 requests in bucket (64, 64) with ragged t/h/w + 3 in (64, 128)
    for i in range(10):
        t = 1 + (i % 2)
        h, w = 56 + 8 * (i % 2), 64
        reqs.append(InferRequest(
            np.asarray(rng.standard_normal((t, h, w, 3)), np.float32),
            np.asarray([0] + [5 + i] * 5 + [2, 1], np.int32),
            np.asarray([1] * 7 + [0], np.int32)))
    for i in range(3):
        reqs.append(InferRequest(
            np.asarray(rng.standard_normal((2, 64, 96, 3)), np.float32),
            np.asarray([0, 9, 2] + [1] * 5, np.int32),
            np.asarray([1, 1, 1] + [0] * 5, np.int32)))

    results = engine.run(reqs)
    assert engine.compile_count == 2          # one program per bucket
    # 10 reqs over 8 devices -> 2 batches, + 1 batch for the second bucket
    assert engine.n_batches == 3
    for r, out in zip(reqs, results):
        t, h, w = r.frames.shape[:3]
        assert out.shape == (t, h, w)
        assert np.isfinite(out).all()


def test_engine_matches_direct_forward(rng, tiny_engine):
    model, params, engine = tiny_engine
    frames = np.asarray(rng.standard_normal((2, 64, 64, 3)), np.float32)
    ids = np.asarray([0, 11, 12, 2, 1, 1, 1, 1], np.int32)
    attn = np.asarray([1, 1, 1, 1, 0, 0, 0, 0], np.int32)
    got = engine.run([InferRequest(frames, ids, attn)])[0]

    direct = model.apply(
        params, jnp.asarray(frames[None]), jnp.zeros((1, 2, 64, 64), bool),
        jnp.asarray(ids[None]), jnp.asarray(attn[None]),
        jnp.asarray([[64, 64]], jnp.int32), train=False)["pred_masks"]
    np.testing.assert_allclose(got, np.asarray(direct)[0, :, 0],
                               rtol=1e-4, atol=1e-4)


def test_engine_per_device_batch(rng, tiny_engine):
    """per_device_batch>1 packs several clips per chip per dispatch and
    produces the same results as the 1-per-chip engine."""
    model, params, engine1 = tiny_engine
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("data",))
    engine2 = ClipInferenceEngine(model, params, mesh=mesh, clip_len=2,
                                  buckets=((64, 64),), per_device_batch=2)
    assert engine2.slots == 16
    lt = 8
    reqs = []
    for i in range(10):
        t = 1 + (i % 2)
        frames = rng.standard_normal((t, 64, 64, 3)).astype(np.float32)
        ids = np.full((lt,), 1, np.int32)
        ids[0] = 0
        reqs.append(InferRequest(frames, ids, np.ones((lt,), np.int32)))
    out1 = engine1.run(reqs)
    n1 = engine1.n_batches
    out2 = engine2.run(reqs)
    # 10 requests over 16 slots -> one dispatch
    assert engine2.n_batches == 1 and n1 >= 2
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
