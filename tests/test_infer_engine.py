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


def test_parse_buckets():
    """--buckets spec validation (advisor round-3): named modes resolve,
    custom lists must be positive /64 multiples, malformed specs raise a
    clear SystemExit instead of a bare ValueError or a deep XLA failure."""
    from ocpg_tpu.cli.infer_davis import parse_buckets
    from ocpg_tpu.engine.infer import DEFAULT_BUCKETS

    assert parse_buckets("exact") == ()
    assert parse_buckets("serving") == DEFAULT_BUCKETS
    assert parse_buckets("default") == DEFAULT_BUCKETS   # deprecated alias
    assert parse_buckets("384x640,640x512") == ((384, 640), (640, 512))
    import pytest as _pytest
    for bad in ("384x640x2", "384,640", "abcxdef", "384x639", "0x64", "-64x64"):
        with _pytest.raises(SystemExit):
            parse_buckets(bad)


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
    assert got.dtype == np.float32

    direct = model.apply(
        params, jnp.asarray(frames[None]), jnp.zeros((1, 2, 64, 64), bool),
        jnp.asarray(ids[None]), jnp.asarray(attn[None]),
        jnp.asarray([[64, 64]], jnp.int32), train=False)["pred_masks"]
    direct = np.asarray(direct)[0, :, 0]
    # default engine wire is bit-tight f32 (ADVICE r4: f16 is opt-in now)
    np.testing.assert_allclose(got, direct, rtol=1e-4, atol=1e-4)

    # explicit f16 serving opt-in: compact wire, ~1e-3 relative
    engine16 = ClipInferenceEngine(model, params, mesh=engine.mesh,
                                   clip_len=2, buckets=engine.buckets,
                                   out_dtype=jnp.float16)
    got16 = engine16.run([InferRequest(frames, ids, attn)])[0]
    np.testing.assert_allclose(got16, direct, rtol=2e-3, atol=2e-3)


def test_engine_pipeline_depths_agree(rng, tiny_engine):
    """Double-buffered dispatch (depth 2, the default) returns the same
    results in the same order as the fully synchronous depth-1 loop."""
    model, params, engine2 = tiny_engine
    assert engine2.pipeline_depth == 2
    engine1 = ClipInferenceEngine(model, params, mesh=engine2.mesh,
                                  clip_len=2, buckets=engine2.buckets,
                                  pipeline_depth=1)
    lt = 8
    reqs = []
    for i in range(20):       # 3 groups in bucket 1 + 1 group in bucket 2
        h, w = ((64, 64) if i % 3 else (64, 96))
        ids = np.full((lt,), 1, np.int32)
        ids[0] = 0
        ids[1] = 3 + i
        reqs.append(InferRequest(
            rng.standard_normal((1 + i % 2, h, w, 3)).astype(np.float32),
            ids, np.ones((lt,), np.int32)))
    seen = []
    out2 = engine2.run(reqs, progress=lambda n: seen.append(n))
    out1 = engine1.run(reqs)
    assert sum(seen) == len(reqs)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(a, b)


def test_engine_compact_uint8_wire_matches_f32(rng, tiny_engine):
    """Fast-suite e2e of the compact inference wire (advisor round-3): a
    uint8 request (normalized on device inside the jitted forward) must
    produce the same masks as the equivalent host-normalized f32 request."""
    from ocpg_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    model, params, engine = tiny_engine
    frames_u8 = rng.integers(0, 256, (2, 56, 64, 3)).astype(np.uint8)
    frames_f32 = ((frames_u8.astype(np.float32) / 255.0 - IMAGENET_MEAN)
                  / IMAGENET_STD).astype(np.float32)
    lt = 8
    ids = np.full((lt,), 1, np.int32)
    ids[0] = 0
    attn = np.ones((lt,), np.int32)
    got_u8 = engine.run([InferRequest(frames_u8, ids, attn)])[0]
    got_f32 = engine.run([InferRequest(frames_f32, ids, attn)])[0]
    assert got_u8.shape == (2, 56, 64)
    # identical inputs modulo the f32 normalize ordering; f16 readback wire
    np.testing.assert_allclose(got_u8, got_f32, rtol=2e-3, atol=2e-3)


def test_engine_ref_points_readback(rng, tiny_engine):
    """want_ref_points=True (the --visualize path) also reads back the
    model's per-frame normalized reference points and the per-request
    canvas, without changing the mask results."""
    model, params, engine = tiny_engine
    e = ClipInferenceEngine(model, params, mesh=engine.mesh, clip_len=2,
                            buckets=((64, 64),), want_ref_points=True)
    lt = 8
    ids = np.full((lt,), 1, np.int32)
    ids[0] = 0
    frames = rng.standard_normal((2, 56, 64, 3)).astype(np.float32)
    req = InferRequest(frames, ids, np.ones((lt,), np.int32))
    out = e.run([req])[0]
    base = engine.run([req])[0]
    np.testing.assert_allclose(out, base, rtol=2e-3, atol=2e-3)
    refs = e.last_ref_points[0]
    assert refs.shape == (2, 2)
    assert np.all(refs >= 0.0) and np.all(refs <= 1.0)   # sigmoid coords
    assert e.last_canvas[0] == (64, 64)


def test_engine_rejects_mixed_wire_dtypes(rng, tiny_engine):
    """A mixed uint8/f32 request pool must fail loudly, not truncate f32
    frames into a uint8 group buffer (advisor round-3)."""
    _, _, engine = tiny_engine
    lt = 8
    ids = np.full((lt,), 1, np.int32)
    ids[0] = 0
    attn = np.ones((lt,), np.int32)
    r_f32 = InferRequest(
        rng.standard_normal((2, 64, 64, 3)).astype(np.float32), ids, attn)
    r_u8 = InferRequest(
        rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8), ids, attn)
    with pytest.raises(ValueError, match="dtype"):
        engine.run([r_f32, r_u8])


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
    # f16 readback wire: batch-dim change perturbs fusion tiling by ~1 ulp
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_cross_chunk_global_query_consistency(rng, tiny_engine):
    """A video split into chunks must end up with the SAME chosen decoder
    query as one whole-video forward (VERDICT r4 next-step 5; reference
    inference_ytvos.py:192-213 runs the full video in one forward, so its
    best-query choice is global and the referred-object identity cannot
    switch mid-video).  Pins: (a) the frame-count-weighted aggregation of
    per-chunk `query_scores` equals the whole-video scores exactly (chunks
    partition the frames and the backbone path is per-frame), (b) forcing
    the global query via InferRequest.query_override reproduces the
    whole-video masks, (c) the override is actually live."""
    model, params, engine0 = tiny_engine
    e = ClipInferenceEngine(model, params, mesh=engine0.mesh, clip_len=6,
                            buckets=((64, 64),), want_query_scores=True)
    lt = 8
    ids = np.full((lt,), 1, np.int32)
    ids[0] = 0
    ids[1:4] = (7, 9, 2)
    attn = np.ones((lt,), np.int32)
    frames = rng.standard_normal((6, 64, 64, 3)).astype(np.float32)

    whole = e.run([InferRequest(frames, ids, attn)])[0]
    whole_scores = e.last_query_scores[0]
    assert whole_scores.shape[0] == 5                      # (Q, K)
    gq_whole = int(whole_scores.max(axis=-1).argmax())

    chunks = [frames[:3], frames[3:]]                      # padded to clip_len
    res = e.run([InferRequest(c, ids, attn) for c in chunks])
    scores = e.last_query_scores
    agg = (scores[0] * 3 + scores[1] * 3) / 6.0
    np.testing.assert_allclose(agg, whole_scores, rtol=1e-5, atol=1e-6)
    gq = int(agg.max(axis=-1).argmax())
    assert gq == gq_whole

    forced = e.run([InferRequest(c, ids, attn, query_override=gq)
                    for c in chunks])
    np.testing.assert_allclose(np.concatenate(forced, axis=0), whole,
                               rtol=1e-4, atol=1e-4)

    # the override is live: forcing a different query changes the masks
    other = (gq + 1) % 5
    res_other = e.run([InferRequest(chunks[0], ids, attn,
                                    query_override=other)])[0]
    assert not np.allclose(res_other, forced[0], atol=1e-4)


def test_exact_mode_compile_guard(rng, tiny_engine):
    """buckets=() (exact mode) must stop compiling one program per distinct
    canvas once max_exact_shapes is exceeded: later NEW shapes fall back to
    the serving trio while already-compiled exact canvases keep being used
    (ADVICE r4: mixed-aspect pools triggered unbounded multi-minute XLA
    compiles)."""
    model, params, engine0 = tiny_engine
    e = ClipInferenceEngine(model, params, mesh=engine0.mesh, clip_len=1,
                            buckets=(), max_exact_shapes=2)
    lt = 8
    ids = np.full((lt,), 1, np.int32)
    ids[0] = 0
    attn = np.ones((lt,), np.int32)

    def req(h, w):
        return InferRequest(
            rng.standard_normal((1, h, w, 3)).astype(np.float32), ids, attn)

    # two distinct exact canvases: within the cap, both compile exact
    out = e.run([req(64, 64), req(64, 128)])
    assert e.compile_count == 2
    assert set(e._fns) == {(64, 64), (64, 128)}

    # a third shape pushes past the cap: it lands on a serving-trio bucket,
    # while the already-compiled exact canvases keep serving their shapes
    out = e.run([req(64, 64), req(128, 192)])
    assert (64, 64) in e._fns
    from ocpg_tpu.engine.infer import DEFAULT_BUCKETS

    new_buckets = set(e._fns) - {(64, 64), (64, 128)}
    assert new_buckets and new_buckets <= set(DEFAULT_BUCKETS)
    assert out[0].shape == (1, 64, 64) and out[1].shape == (1, 128, 192)
    assert all(np.isfinite(o).all() for o in out)
