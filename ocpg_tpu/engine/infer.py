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

Usage:
    engine = ClipInferenceEngine(model, params, clip_len=36)
    results = engine.run(requests)     # list[InferRequest] -> list[np (t,h,w)]
"""

from __future__ import annotations

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
                 per_device_batch: int = 1):
        self.model = model
        self.clip_len = clip_len
        self.buckets = tuple(buckets)
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), ("data",))
        self.mesh = mesh
        # requests per SPMD dispatch = n_dev * per_device_batch; batching >1
        # clip per chip raises MXU utilization for small models (throughput
        # numbers in PROFILE.md) at the cost of per-request latency
        self.slots = mesh.devices.size * max(1, per_device_batch)
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

            def fwd(params, samples, samples_mask, ids, attn, sizes):
                if samples.dtype == jnp.uint8:
                    # compact wire: normalize on device, re-zero the canvas
                    # padding in normalized space (NestedTensor semantics)
                    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

                    x = samples.astype(jnp.float32) / 255.0
                    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
                    samples = jnp.where(samples_mask[..., None], 0.0, x)
                out = self.model.apply(params, samples, samples_mask, ids,
                                       attn, sizes, train=False)
                return out["pred_masks"]          # (B, T, 1|Q, H, W) logits

            self._fns[bucket] = jax.jit(
                fwd,
                in_shardings=(repl, data, data, data, data, data),
                out_shardings=data,
            )
        return self._fns[bucket]

    # -- request batching ---------------------------------------------------
    def run(self, requests: Sequence[InferRequest],
            progress: Optional[callable] = None) -> List[np.ndarray]:
        """Returns, per request, the (t, h, w) best-query mask logits cropped
        to the request's true frame count and resolution."""
        order: Dict[Tuple[int, int], List[int]] = {}
        for i, r in enumerate(requests):
            t, h, w = r.frames.shape[:3]
            assert t <= self.clip_len, (t, self.clip_len)
            order.setdefault(pick_bucket(h, w, self.buckets), []).append(i)

        results: List[Optional[np.ndarray]] = [None] * len(requests)
        for bucket, idxs in order.items():
            bh, bw = bucket
            fn = self._fn(bucket)
            for base in range(0, len(idxs), self.slots):
                group = idxs[base:base + self.slots]
                pad_b = self.slots - len(group)
                samples = np.zeros((self.slots, self.clip_len, bh, bw, 3),
                                   requests[group[0]].frames.dtype)
                mask = np.ones((self.slots, self.clip_len, bh, bw), bool)
                lt = requests[group[0]].text_ids.shape[-1]
                ids = np.full((self.slots, lt), 1, np.int32)
                ids[:, 0] = 0
                attn = np.zeros((self.slots, lt), np.int32)
                attn[:, 0] = 1
                sizes = np.ones((self.slots, 2), np.int32)
                for j, ridx in enumerate(group):
                    r = requests[ridx]
                    t, h, w = r.frames.shape[:3]
                    samples[j, :t, :h, :w] = r.frames
                    mask[j, :t, :h, :w] = False
                    ids[j] = r.text_ids
                    attn[j] = r.text_mask
                    sizes[j] = (h, w)
                with self.mesh:
                    out = fn(
                        self.params,
                        jax.device_put(jnp.asarray(samples), self._batch_shard(samples)),
                        jax.device_put(jnp.asarray(mask), self._batch_shard(mask)),
                        jax.device_put(jnp.asarray(ids), self._batch_shard(ids)),
                        jax.device_put(jnp.asarray(attn), self._batch_shard(attn)),
                        jax.device_put(jnp.asarray(sizes), self._batch_shard(sizes)),
                    )
                out = np.asarray(out)
                self.n_batches += 1
                for j, ridx in enumerate(group):
                    t, h, w = requests[ridx].frames.shape[:3]
                    results[ridx] = out[j, :t, 0, :h, :w]
                if progress is not None:
                    progress(len(group))
        return results  # type: ignore[return-value]

    @property
    def compile_count(self) -> int:
        return len(self._fns)
