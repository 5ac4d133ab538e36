"""Multi-device, static-shape clip inference engine.

Replaces the reference's inference parallelism and dynamic shapes:
  * /root/reference/inference_davis.py:97-109,131 shards videos over GPUs
    with one mp.Process + model replica per device; here the whole pool of
    (video, expression, chunk) requests is batched across a
    `jax.sharding.Mesh('data')` as ONE SPMD program — idle chips get padding
    clips instead of idling.
  * The reference resizes every video to its own aspect-dependent (h, w)
    (inference_davis.py:211-218), which eager torch tolerates; under XLA each
    distinct shape is a fresh compile.  Requests are padded to a small set of
    canvas BUCKETS and a fixed chunk length, so the whole split compiles at
    most `len(buckets)` programs.

The dispatch loop is double-buffered: JAX dispatch is asynchronous, so the
engine keeps up to `pipeline_depth` groups in flight — while group i computes
on the devices, the host assembles + uploads group i+1 and reads back group
i-1.  The reference hides the same latency with one OS process per GPU
(inference_davis.py:97-109); here it is one process, one pipeline.  The
readback can be made compact: with `out_dtype=jnp.float16` (explicit serving
opt-in; default is bit-tight f32) the jitted forward casts the full-canvas
logits to f16 on device, halving device->host bytes per group; consumers get
f32 after the host-side crop to the request's true (t, h, w).

Usage:
    engine = ClipInferenceEngine(model, params, clip_len=36)
    results = engine.run(requests)     # list[InferRequest] -> list[np (t,h,w)]
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Canvas buckets for the reference inference scale (Resize 360 / max 640):
# landscape videos land on (360, 640) -> (384, 640); portrait ones on
# (640, <=480) -> (640, 512); square-ish on (512, 640).  /64-aligned so every
# feature level keeps integral shapes.
DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = ((384, 640), (512, 640), (640, 512))


@dataclasses.dataclass
class InferRequest:
    # (t, h, w, 3), t <= clip_len: either UN-normalized uint8 RGB (the
    # compact wire — ImageNet normalization happens on device inside the
    # jitted forward, 4x fewer host->device bytes) or already-normalized
    # float32 (legacy; passed through untouched)
    frames: np.ndarray
    text_ids: np.ndarray      # (Lt,) int32
    text_mask: np.ndarray     # (Lt,) int32
    # DAVIS/YTVOS branch only: >=0 forces that decoder query (cross-chunk-
    # consistent selection, see cli/infer_ytvos.py); -1 = per-forward argmax
    query_override: int = -1


def pick_bucket(h: int, w: int,
                buckets: Sequence[Tuple[int, int]]) -> Tuple[int, int]:
    """Smallest-area bucket that contains (h, w); falls back to a /64-aligned
    exact canvas when nothing fits (counts as an extra compile)."""
    fitting = [b for b in buckets if b[0] >= h and b[1] >= w]
    if fitting:
        return min(fitting, key=lambda b: b[0] * b[1])
    return (-(-h // 64) * 64, -(-w // 64) * 64)


class ClipInferenceEngine:
    """Batches clip requests over the device mesh with bucketed static shapes."""

    def __init__(self, model, params, mesh: Optional[Mesh] = None,
                 clip_len: int = 36,
                 buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
                 per_device_batch: int = 1,
                 out_dtype=jnp.float32,
                 pipeline_depth: int = 2,
                 want_ref_points: bool = False,
                 max_exact_shapes: int = 4,
                 want_query_scores: bool = False):
        self.model = model
        self.clip_len = clip_len
        self.buckets = tuple(buckets)
        # Default f32 for bit-tight parity with direct forwards (matches the
        # CLI --readback default; ADVICE r4: f16-by-default silently relaxed
        # API callers' precision).  Pass jnp.float16 as an explicit serving
        # opt-in: it halves the device->host readback (logits are O(10), far
        # inside f16 range; sigmoid(f16 logit) deviates <1e-3 from f32 —
        # PROFILE.md round-11), at the cost of argmax flips when per-object
        # scores tie within the f16 quantum (PIPELINE_PARITY.json).
        self.out_dtype = out_dtype
        # in-flight dispatch groups; 1 disables overlap (old behavior)
        self.pipeline_depth = max(1, pipeline_depth)
        # also read back the model's per-frame reference points (normalized
        # x, y) for `--visualize` overlays; exposed as self.last_ref_points
        self.want_ref_points = want_ref_points
        self.last_ref_points: List[Optional[np.ndarray]] = []
        # also read back per-query (Q, K) valid-frame-mean scores (DAVIS/
        # YTVOS eval branch) as self.last_query_scores — the tiny wire that
        # lets a caller re-select ONE query across a video's chunks and force
        # it via InferRequest.query_override (reference whole-video
        # semantics, inference_ytvos.py:198-213)
        self.want_query_scores = want_query_scores
        self.last_query_scores: List[Optional[np.ndarray]] = []
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), ("data",))
        self.mesh = mesh
        # requests per SPMD dispatch = n_dev * per_device_batch; batching >1
        # clip per chip raises MXU utilization for small models (throughput
        # numbers in PROFILE.md) at the cost of per-request latency
        self.slots = mesh.devices.size * max(1, per_device_batch)
        # exact mode (buckets=()) compiles one XLA program per distinct
        # /64-aligned canvas.  On mixed-aspect-ratio request pools that can
        # mean many multi-minute TPU compiles (ADVICE r4), so once more than
        # `max_exact_shapes` distinct canvases have been seen, NEW shapes
        # fall back to the bounded serving trio (already-compiled exact
        # canvases keep being used — no recompilation).
        self.max_exact_shapes = max_exact_shapes
        self._exact_fallback_warned = False
        self._fns: Dict[Tuple[int, int], object] = {}   # bucket -> jitted fn
        repl = NamedSharding(mesh, P())
        self.params = jax.device_put(params, repl)
        self._batch_shard = lambda x: NamedSharding(
            mesh, P("data", *([None] * (np.ndim(x) - 1))))
        self.n_batches = 0

    # -- one jitted program per bucket ------------------------------------
    def _fn(self, bucket: Tuple[int, int]):
        if bucket not in self._fns:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))

            def fwd(params, samples, samples_mask, ids, attn, sizes, qov):
                if samples.dtype == jnp.uint8:
                    # compact wire: normalize on device, re-zero the canvas
                    # padding in normalized space (NestedTensor semantics)
                    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

                    x = samples.astype(jnp.float32) / 255.0
                    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
                    samples = jnp.where(samples_mask[..., None], 0.0, x)
                out = self.model.apply(params, samples, samples_mask, ids,
                                       attn, sizes, query_override=qov,
                                       train=False)
                # compact readback wire: cast on device, halve the bytes down
                ret = {"masks": out["pred_masks"].astype(self.out_dtype)}  # (B,T,1|Q,H,W)
                if self.want_ref_points:
                    ret["refs"] = out["reference_points"]          # (B,T,1,2)
                if self.want_query_scores:
                    ret["scores"] = out["query_scores"]            # (B,Q,K) f32
                return ret

            out_shardings = {"masks": data}
            if self.want_ref_points:
                out_shardings["refs"] = data
            if self.want_query_scores:
                out_shardings["scores"] = data
            self._fns[bucket] = jax.jit(
                fwd,
                in_shardings=(repl, data, data, data, data, data, data),
                out_shardings=out_shardings,
            )
        return self._fns[bucket]

    # -- request batching ---------------------------------------------------
    def _dispatch(self, requests, bucket, group):
        """Assemble + upload one group and dispatch its (async) forward."""
        bh, bw = bucket
        samples = np.zeros((self.slots, self.clip_len, bh, bw, 3),
                           requests[group[0]].frames.dtype)
        mask = np.ones((self.slots, self.clip_len, bh, bw), bool)
        lt = requests[group[0]].text_ids.shape[-1]
        ids = np.full((self.slots, lt), 1, np.int32)
        ids[:, 0] = 0
        attn = np.zeros((self.slots, lt), np.int32)
        attn[:, 0] = 1
        sizes = np.ones((self.slots, 2), np.int32)
        qov = np.full((self.slots,), -1, np.int32)
        for j, ridx in enumerate(group):
            r = requests[ridx]
            t, h, w = r.frames.shape[:3]
            samples[j, :t, :h, :w] = r.frames
            mask[j, :t, :h, :w] = False
            ids[j] = r.text_ids
            attn[j] = r.text_mask
            sizes[j] = (h, w)
            qov[j] = getattr(r, "query_override", -1)
        fn = self._fn(bucket)
        with self.mesh:
            out = fn(
                self.params,
                jax.device_put(jnp.asarray(samples), self._batch_shard(samples)),
                jax.device_put(jnp.asarray(mask), self._batch_shard(mask)),
                jax.device_put(jnp.asarray(ids), self._batch_shard(ids)),
                jax.device_put(jnp.asarray(attn), self._batch_shard(attn)),
                jax.device_put(jnp.asarray(sizes), self._batch_shard(sizes)),
                jax.device_put(jnp.asarray(qov), self._batch_shard(qov)),
            )
        self.n_batches += 1
        return out

    def run(self, requests: Sequence[InferRequest],
            progress: Optional[callable] = None) -> List[np.ndarray]:
        """Returns, per request, the (t, h, w) best-query mask logits (f32)
        cropped to the request's true frame count and resolution.

        Up to `pipeline_depth` groups are kept in flight: the np.asarray
        readback of group i-1 happens only after group i has been uploaded
        and dispatched, so host assembly + transfer overlap device compute.
        """
        if not requests:
            return []
        # All requests in one run() must share a frames dtype: a mixed
        # f32/uint8 pool would silently truncate f32 frames into the uint8
        # group buffer (advisor round-3).  Real raises, not asserts — this
        # guard must survive python -O.
        wire_dtype = requests[0].frames.dtype
        for i, r in enumerate(requests):
            if r.frames.dtype != wire_dtype:
                raise ValueError(
                    f"request {i} frames dtype {r.frames.dtype} != {wire_dtype}; "
                    "mix of compact-uint8 and normalized-f32 requests in one run()")

        # exact-mode compile guard: would this run push the distinct-canvas
        # count past max_exact_shapes?  If so, new shapes use the serving trio.
        exact_over_cap = False
        if not self.buckets:
            shapes = {pick_bucket(r.frames.shape[1], r.frames.shape[2], ())
                      for r in requests}
            if len(shapes | set(self._fns)) > self.max_exact_shapes:
                exact_over_cap = True
                if not self._exact_fallback_warned:
                    self._exact_fallback_warned = True
                    import sys

                    print(
                        f"ClipInferenceEngine: >{self.max_exact_shapes} distinct "
                        "exact canvases observed — new shapes fall back to the "
                        "serving bucket trio to bound XLA compiles "
                        "(pass an explicit buckets list to override)",
                        file=sys.stderr)

        order: Dict[Tuple[int, int], List[int]] = {}
        for i, r in enumerate(requests):
            t = r.frames.shape[0]
            if t > self.clip_len:
                raise ValueError(
                    f"request {i} has {t} frames > clip_len={self.clip_len}")
            h, w = r.frames.shape[1:3]
            bucket = pick_bucket(h, w, self.buckets)
            if exact_over_cap and bucket not in self._fns:
                bucket = pick_bucket(h, w, DEFAULT_BUCKETS)
            order.setdefault(bucket, []).append(i)
        groups: List[Tuple[Tuple[int, int], List[int]]] = []
        for bucket, idxs in order.items():
            for base in range(0, len(idxs), self.slots):
                groups.append((bucket, idxs[base:base + self.slots]))

        results: List[Optional[np.ndarray]] = [None] * len(requests)
        self.last_ref_points = [None] * len(requests)
        self.last_query_scores = [None] * len(requests)
        # per-request canvas, so consumers can map canvas-normalized model
        # coordinates (e.g. reference points) onto the unpadded crop
        self.last_canvas: List[Optional[Tuple[int, int]]] = [None] * len(requests)

        def drain(group, out):
            refs = np.asarray(out["refs"]) if self.want_ref_points else None
            scores = np.asarray(out["scores"]) if self.want_query_scores else None
            masks = np.asarray(out["masks"])      # blocks on this group only
            for j, ridx in enumerate(group):
                t, h, w = requests[ridx].frames.shape[:3]
                results[ridx] = masks[j, :t, 0, :h, :w].astype(np.float32)
                if refs is not None:
                    self.last_ref_points[ridx] = refs[j, :t, 0]   # (t, 2) xy
                if scores is not None:
                    self.last_query_scores[ridx] = scores[j]      # (Q, K)
            if progress is not None:
                progress(len(group))

        inflight = collections.deque()
        for bucket, group in groups:
            for ridx in group:
                self.last_canvas[ridx] = bucket
            inflight.append((group, self._dispatch(requests, bucket, group)))
            if len(inflight) >= self.pipeline_depth:
                drain(*inflight.popleft())
        while inflight:
            drain(*inflight.popleft())
        return results  # type: ignore[return-value]

    @property
    def compile_count(self) -> int:
        return len(self._fns)
