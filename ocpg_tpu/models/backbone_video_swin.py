"""Video Swin Transformer backbone (flax.linen, channels-last).

Reference: /root/reference/models/video_swin_transformer.py — 3D
shifted-window transformer with `patch_size=(1,4,4)` (time never downsampled,
`:648-649,741`), window `(8,7,7)` (`:745`), per-stage outputs *before*
downsampling so spatial strides are [4, 8, 16, 32] (`:690-701`); tiny/small/
base configs (`:739-785`).

TPU-first notes:
  * Window partitioning is pure reshape/transpose; the shifted windows use
    `jnp.roll` (cheap on TPU) with a statically precomputed attention mask —
    the reference lru-caches the same mask on device (`:316-329`).
  * Attention over windows is a batched (B*nW, heads, N, N) einsum — dense
    MXU work; relative position bias is a table lookup with a static index.
  * Gradient rematerialisation (`use_checkpoint`, reference `:263-272`) maps
    to `nn.remat` around each block.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


def _get_window_size(dims, window_size, shift_size):
    """Clamp window to input dims; zero shift where clamped (reference :306-313)."""
    ws = list(window_size)
    ss = list(shift_size)
    for i in range(3):
        if dims[i] <= window_size[i]:
            ws[i] = dims[i]
            ss[i] = 0
    return tuple(ws), tuple(ss)


@functools.lru_cache(maxsize=None)
def _sw_attn_mask(tp: int, hp: int, wp: int, ws: Tuple[int, int, int],
                  ss: Tuple[int, int, int]) -> Optional[np.ndarray]:
    """SW-MSA attention mask (reference compute_mask, :316-329). Static numpy."""
    if not any(ss):
        return None
    img = np.zeros((tp, hp, wp), dtype=np.int32)
    cnt = 0
    for t in (slice(-ws[0]), slice(-ws[0], -ss[0]), slice(-ss[0], None)) if ss[0] else (slice(None),):
        for h in (slice(-ws[1]), slice(-ws[1], -ss[1]), slice(-ss[1], None)) if ss[1] else (slice(None),):
            for w in (slice(-ws[2]), slice(-ws[2], -ss[2]), slice(-ss[2], None)) if ss[2] else (slice(None),):
                img[t, h, w] = cnt
                cnt += 1
    # partition into windows
    img = img.reshape(tp // ws[0], ws[0], hp // ws[1], ws[1], wp // ws[2], ws[2])
    img = img.transpose(0, 2, 4, 1, 3, 5).reshape(-1, ws[0] * ws[1] * ws[2])  # (nW, N)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)  # (nW, N, N)


@functools.lru_cache(maxsize=None)
def _relative_position_index(ws: Tuple[int, int, int]) -> np.ndarray:
    """Static (N, N) index into the relative-position-bias table (reference :110-124)."""
    wt, wh, ww = ws
    coords = np.stack(np.meshgrid(np.arange(wt), np.arange(wh), np.arange(ww),
                                  indexing="ij")).reshape(3, -1)        # (3, N)
    rel = coords[:, :, None] - coords[:, None, :]                       # (3, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wt - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)                                                  # (N, N)


class WindowAttention3D(nn.Module):
    """W-MSA / SW-MSA with relative position bias (reference :87-169).

    The bias table is sized by `full_window` (the block's configured window,
    e.g. (8, 7, 7)) regardless of the EFFECTIVE window of this call: short
    clips shrink the temporal window, and the reference keeps the full-size
    parameter and slices `relative_position_index[:N, :N]`
    (video_swin_transformer.py:111-113,152-154) — so converted checkpoints
    load for any clip length.
    """
    dim: int
    window_size: Tuple[int, int, int]       # effective window of this call
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    full_window: Optional[Tuple[int, int, int]] = None
    attn_impl: str = "xla"                  # 'pallas' = fused VMEM-resident kernel

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array]) -> Array:
        # x: (B_windows, N, C); mask: (nW, N, N) or None
        from ..ops.window_attention_pallas import (heads_per_group,
                                                   window_attention,
                                                   window_attention_xla)

        bw, n, c = x.shape
        h = self.num_heads
        dh = c // h
        full = self.full_window or self.window_size
        wt, wh, ww = full
        table_size = (2 * wt - 1) * (2 * wh - 1) * (2 * ww - 1)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            (table_size, h),
        )
        rel_idx = jnp.asarray(_relative_position_index(full)[:n, :n])
        bias = bias_table[rel_idx.reshape(-1)].reshape(n, n, h)
        bias = bias.transpose(2, 0, 1)                                   # (H, N, N)

        # qkv stays in its Dense output layout and is sliced (not transposed):
        # the explicit (3, B, H, N, Dh) transpose materialized a full relayout
        # of the backbone's biggest activation per block; einsum dot-dims
        # absorb the head split for free (measured -10%/block on v5e,
        # scripts/bench_swin_micro.py).
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, h, dh)
        q, k, v = qkv[:, :, 0] * (dh ** -0.5), qkv[:, :, 1], qkv[:, :, 2]
        if self.attn_impl == "pallas" and heads_per_group(h, dh) is not None:
            # fused Pallas kernel: the (bw, H, N, N) logits never touch HBM
            # (ops/window_attention_pallas.py; backward = XLA recompute)
            out = window_attention(q, k, v, bias, mask, self.dtype)
        else:
            # XLA path: logits stored in compute dtype (f32 matmul
            # accumulation) — the (bw, H, N, N) buffer is the backbone's
            # largest HBM tenant, bf16 halves its traffic; softmax in f32,
            # matching the reference's AMP semantics (fp16 logits,
            # autocast-fp32 softmax).
            out = window_attention_xla(q, k, v, bias, mask, self.dtype)
        out = out.reshape(bw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock3D(nn.Module):
    """reference SwinTransformerBlock3D (:172-274)."""
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (8, 7, 7)
    shift: bool = False
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        # x: (B, T, H, W, C)
        b, t, hh, ww_, c = x.shape
        shift_size = tuple(w // 2 for w in self.window_size) if self.shift else (0, 0, 0)
        ws, ss = _get_window_size((t, hh, ww_), self.window_size, shift_size)

        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)

        pad = [(0, (ws[i] - ((t, hh, ww_)[i] % ws[i])) % ws[i]) for i in range(3)]
        x = jnp.pad(x, ((0, 0), pad[0], pad[1], pad[2], (0, 0)))
        tp, hp, wp = x.shape[1:4]

        if any(ss):
            x = jnp.roll(x, shift=(-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
            mask_np = _sw_attn_mask(tp, hp, wp, ws, ss)
            mask = jnp.asarray(mask_np) if mask_np is not None else None
        else:
            mask = None

        # window partition: (B, T/wt, wt, H/wh, wh, W/ww, ww, C)
        xw = x.reshape(b, tp // ws[0], ws[0], hp // ws[1], ws[1], wp // ws[2], ws[2], c)
        xw = xw.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, ws[0] * ws[1] * ws[2], c)

        attn = WindowAttention3D(self.dim, ws, self.num_heads, dtype=self.dtype,
                                 full_window=self.window_size,
                                 attn_impl=self.attn_impl, name="attn")(xw, mask)

        # reverse partition
        attn = attn.reshape(b, tp // ws[0], hp // ws[1], wp // ws[2], ws[0], ws[1], ws[2], c)
        attn = attn.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, tp, hp, wp, c)

        if any(ss):
            attn = jnp.roll(attn, shift=ss, axis=(1, 2, 3))
        attn = attn[:, :t, :hh, :ww_]

        def drop_path(y):
            if self.drop_path == 0.0 or deterministic:
                return y
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask_ = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1, 1))
            return y * mask_.astype(y.dtype) / keep

        x = shortcut + drop_path(attn)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        # GELU: tanh-approx under bf16 compute, exact erf otherwise.  The
        # approximation's max abs error (4.7e-4) is ~37x below bf16's own
        # rounding error of exact gelu (1.8e-2), so under bf16 the two are
        # numerically indistinguishable — and the erf is the single biggest
        # VPU cost in the Swin block (0.303 -> 0.113 ms/stage-2 MLP on v5e,
        # scripts/bench_swin_micro.py).  f32 keeps the reference-exact erf
        # (torch nn.GELU default) for golden parity.
        y = jax.nn.gelu(y, approximate=(self.dtype == jnp.bfloat16))
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + drop_path(y)


class PatchMerging(nn.Module):
    """Spatial 2x downsample, C -> 2C (reference :277-304)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: (B, T, H, W, C)
        b, t, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class VideoSwin(nn.Module):
    """Backbone wrapper: (B*T, H, W, 3) -> 4 levels of (B*T, H/s, W/s, C_s)."""
    embed_dim: int
    depths: Tuple[int, ...]
    num_heads: Tuple[int, ...]
    num_frames: int
    window_size: Tuple[int, int, int] = (8, 7, 7)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @property
    def num_channels(self):
        return tuple(self.embed_dim * (2**i) for i in range(len(self.depths)))

    @nn.compact
    def __call__(self, frames: Array, *, deterministic: bool = True):
        bt, H, W, _ = frames.shape
        t = self.num_frames
        b = bt // t

        # PatchEmbed3D with patch (1,4,4): per-frame 4x4 conv (reference :416-449)
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patch_embed")(frames)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        h4, w4 = x.shape[1], x.shape[2]
        x = x.reshape(b, t, h4, w4, self.embed_dim)

        # stochastic depth schedule (reference :711-713)
        total_depth = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_depth)

        outs = []
        block_idx = 0
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.embed_dim * (2**stage)
            # gradient rematerialisation per block (reference use_checkpoint, :263-272)
            block_cls = nn.remat(SwinBlock3D, static_argnums=(2,)) if self.use_checkpoint else SwinBlock3D
            for i in range(depth):
                x = block_cls(
                    dim, heads, self.window_size, shift=(i % 2 == 1),
                    mlp_ratio=self.mlp_ratio, drop_path=float(dpr[block_idx]),
                    dtype=self.dtype, attn_impl=self.attn_impl,
                    name=f"stage{stage}_block{i}",
                )(x, deterministic)
                block_idx += 1
            # per-stage output BEFORE downsample (reference :690-701)
            outs.append(x.reshape(b * t, x.shape[2], x.shape[3], dim))
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"downsample{stage}")(x)
        return tuple(outs)


_CONFIGS = {
    "video_swin_t_p4w7": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "video_swin_s_p4w7": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "video_swin_b_p4w7": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    # reduced arch for the full-model golden-parity tests (CPU-feasible)
    "video_swin_test": dict(embed_dim=32, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8)),
}


def build_video_swin(arch: str, dtype=jnp.float32, name: Optional[str] = None,
                     use_checkpoint: bool = False, num_frames: int = 1,
                     attn_impl: str = "xla") -> VideoSwin:
    cfg = _CONFIGS[arch]
    return VideoSwin(dtype=dtype, name=name, use_checkpoint=use_checkpoint,
                     num_frames=num_frames, attn_impl=attn_impl, **cfg)
