"""Deformable transformer encoder/decoder (flax.linen).

Reference: /root/reference/models/deformable_transformer.py.  4 encoder / 4
decoder layers by default (`opts.py:50-53`); encoder layers are MSDeformAttn
self-attention + FFN; decoder layers are MHSA self-attention + MSDeformAttn
cross-attention + FFN with iterative box refinement
(`deformable_transformer.py:377-388`).

Differences by design (TPU-first):
  * `spatial_shapes` is a static tuple — XLA unrolls the per-level loop and
    compiles one program per resolution bucket (the reference carries shapes
    as a device tensor).
  * The box-refinement MLPs live inside the decoder and the decoder returns
    both the detached per-layer references (as the reference stores them,
    `:388`) and the gradient-carrying per-layer coordinate predictions, which
    the reference recomputes at the top level (`ocpg.py:312-327`) with the
    *shared* bbox_embed modules (`ocpg.py:163`).  Functionally identical
    gradient flow, one fewer recomputation.
  * two_stage is intentionally unsupported (asserted false in the reference,
    `ocpg.py:65`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.ms_deform_attn import ms_deform_attn_fast_cm
from .layers import MLP, MultiheadAttention, inverse_sigmoid, xavier_uniform

Array = jax.Array
Shapes = Tuple[Tuple[int, int], ...]


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional grid init of sampling offsets (ops/modules/ms_deform_attn.py:64-72)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(n_heads, 1, 1, 2), (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    bias = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        assert shape == bias.shape, (shape, bias.shape)
        return jnp.asarray(bias, dtype)

    return init


class MSDeformAttnModule(nn.Module):
    """Linear heads + core sampling op (ops/modules/ms_deform_attn.py:31-118)."""
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32
    msda_impl: str = "xla"            # 'pallas' | 'separable' | 'xla'
    return_samples: bool = False      # also build standard-layout locs/attn
                                      # (visualization only — extra transposes)

    @nn.compact
    def __call__(
        self,
        query: Array,                 # (N, Lq, C)
        reference_points: Array,      # (N, Lq, L, 2) or (N, Lq, L, 4), in [0,1]
        input_flatten: Array,         # (N, S, C)
        spatial_shapes: Shapes,
        input_padding_mask: Optional[Array] = None,  # (N, S) bool True=pad
    ) -> Tuple[Array, Optional[Array], Optional[Array]]:
        n, lq, _ = query.shape
        m, l, p = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // m

        value = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=xavier_uniform, name="value_proj")(input_flatten)
        if input_padding_mask is not None:
            value = jnp.where(input_padding_mask[..., None], 0.0, value)
        value = value.reshape(n, -1, m, d)

        # Channel-major layout: ONE 2D transpose of each Dense output
        # ((N, Lq, C_out) -> (N, C_out, Lq), both dims tile-sized) replaces
        # the 5D tiny-minor-dim fold/unfold transposes around the kernel —
        # those cost ~16 ms/step at train shapes (PROFILE.md).  The channel
        # ordering (m, l, p, [xy]) matches the reference Dense weights
        # (ops/modules/ms_deform_attn.py:104-113), so converters are
        # unaffected and the math is bit-identical to the row-major path.
        offsets = nn.Dense(
            m * l * p * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(m, l, p),
            dtype=jnp.float32,
            name="sampling_offsets",
        )(query).transpose(0, 2, 1).reshape(n, m, l, p, 2, lq)
        attn = nn.Dense(
            m * l * p,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="attention_weights",
        )(query).transpose(0, 2, 1).reshape(n, m, l * p, lq)
        attn_cm = jax.nn.softmax(attn, axis=2).reshape(n, m, l, p, lq)

        # reference points to channel-major: (N, Lq, L, c) -> (N, L, c, Lq)
        ref = reference_points.astype(jnp.float32).transpose(0, 2, 3, 1)
        off_x, off_y = offsets[:, :, :, :, 0], offsets[:, :, :, :, 1]
        if reference_points.shape[-1] == 2:
            ws = jnp.asarray([w for h, w in spatial_shapes], jnp.float32)
            hs = jnp.asarray([h for h, w in spatial_shapes], jnp.float32)
            x_cm = ref[:, None, :, 0, None, :] + off_x / ws[None, None, :, None, None]
            y_cm = ref[:, None, :, 1, None, :] + off_y / hs[None, None, :, None, None]
        elif reference_points.shape[-1] == 4:
            x_cm = ref[:, None, :, 0, None, :] + off_x / p * ref[:, None, :, 2, None, :] * 0.5
            y_cm = ref[:, None, :, 1, None, :] + off_y / p * ref[:, None, :, 3, None, :] * 0.5
        else:
            raise ValueError(reference_points.shape)

        # Sampling math (locations/weights) is fp32 — the reference wraps the
        # op in autocast(enabled=False) (deformable_transformer.py:250,329)
        # because fp16 under/overflows; bf16 shares fp32's exponent range, so
        # the value gather itself stays in compute dtype (half the HBM
        # traffic) while the op accumulates in fp32 internally.
        out = ms_deform_attn_fast_cm(value, spatial_shapes, x_cm, y_cm,
                                     attn_cm, self.msda_impl)
        out = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=xavier_uniform, name="output_proj")(out.astype(self.dtype))

        if self.return_samples:
            locations = jnp.stack([x_cm, y_cm], -1).transpose(0, 4, 1, 2, 3, 5)
            return out, locations, attn_cm.transpose(0, 4, 1, 2, 3)
        return out, None, None


class EncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    msda_impl: str = "xla"

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, padding_mask,
                 *, deterministic: bool = True):
        src2, _, _ = MSDeformAttnModule(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, msda_impl=self.msda_impl, name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes, padding_mask)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)

        ffn = nn.Dense(self.d_ffn, dtype=self.dtype, kernel_init=xavier_uniform, name="linear1")(src)
        ffn = nn.Dropout(self.dropout)(jax.nn.relu(ffn), deterministic=deterministic)
        ffn = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=xavier_uniform, name="linear2")(ffn)
        src = src + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)


class DecoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    msda_impl: str = "xla"
    return_samples: bool = False

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes,
                 src_padding_mask, *, deterministic: bool = True):
        q = tgt + query_pos
        tgt2 = MultiheadAttention(self.n_heads, self.dropout, dtype=self.dtype,
                                  name="self_attn")(q, q, tgt, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)

        tgt2, locations, attn = MSDeformAttnModule(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, msda_impl=self.msda_impl,
            return_samples=self.return_samples, name="cross_attn",
        )(tgt + query_pos, reference_points, src, spatial_shapes, src_padding_mask)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)

        ffn = nn.Dense(self.d_ffn, dtype=self.dtype, kernel_init=xavier_uniform, name="linear1")(tgt)
        ffn = nn.Dropout(self.dropout)(jax.nn.relu(ffn), deterministic=deterministic)
        ffn = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=xavier_uniform, name="linear2")(ffn)
        tgt = tgt + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
        return tgt, locations, attn


def encoder_reference_points(spatial_shapes: Shapes, valid_ratios: Array) -> Array:
    """Per-pixel reference points (deformable_transformer.py:269-281).

    valid_ratios: (N, L, 2) as (w_ratio, h_ratio).  Returns (N, S, L, 2).
    """
    points = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ref_y = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
        ref_x = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
        ref_y = jnp.broadcast_to(ref_y, (h, w)).reshape(-1)[None]  # (1, HW)
        ref_x = jnp.broadcast_to(ref_x, (h, w)).reshape(-1)[None]
        ref_y = ref_y / (valid_ratios[:, None, lvl, 1] * h)
        ref_x = ref_x / (valid_ratios[:, None, lvl, 0] * w)
        points.append(jnp.stack((ref_x, ref_y), -1))  # (N, HW, 2)
    ref = jnp.concatenate(points, axis=1)             # (N, S, 2)
    return ref[:, :, None] * valid_ratios[:, None]    # (N, S, L, 2)


def get_valid_ratio(mask: Array) -> Array:
    """Non-padding ratio per (h, w) (deformable_transformer.py:125-132). mask True=pad."""
    not_mask = ~mask
    valid_h = jnp.sum(not_mask[:, :, 0], axis=1).astype(jnp.float32)
    valid_w = jnp.sum(not_mask[:, 0, :], axis=1).astype(jnp.float32)
    return jnp.stack([valid_w / mask.shape[2], valid_h / mask.shape[1]], axis=-1)


class DeformableTransformer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 4
    num_decoder_layers: int = 4
    dim_feedforward: int = 2048
    dropout: float = 0.1
    num_feature_levels: int = 4
    dec_n_points: int = 4
    enc_n_points: int = 4
    with_box_refine: bool = True
    num_samples_kept: int = 30       # top-30 sampling-point tracking (:373)
    track_samples: bool = False      # visualization-only output; off by default
    dtype: jnp.dtype = jnp.float32
    msda_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        srcs: Sequence[Array],        # L x (N, Hl, Wl, C)   N = batch*time
        tgt: Array,                   # (N, Q, C) query content (text embed)
        masks: Sequence[Array],       # L x (N, Hl, Wl) bool True=pad
        pos_embeds: Sequence[Array],  # L x (N, Hl, Wl, C)
        query_embed: Array,           # (Q, C) learned positional queries
        *,
        deterministic: bool = True,
    ):
        assert len(srcs) == self.num_feature_levels
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.d_model),
        )

        spatial_shapes: Shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        src_flat = jnp.concatenate([s.reshape(s.shape[0], -1, s.shape[-1]) for s in srcs], axis=1)
        mask_flat = jnp.concatenate([m.reshape(m.shape[0], -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [
                p.reshape(p.shape[0], -1, p.shape[-1]) + level_embed[i][None, None].astype(p.dtype)
                for i, p in enumerate(pos_embeds)
            ],
            axis=1,
        )
        valid_ratios = jnp.stack([get_valid_ratio(m) for m in masks], axis=1)  # (N, L, 2)

        # ---- encoder ----
        output = src_flat
        enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)
        for i in range(self.num_encoder_layers):
            output = EncoderLayer(
                self.d_model, self.dim_feedforward, self.num_feature_levels,
                self.nhead, self.enc_n_points, self.dropout, dtype=self.dtype,
                msda_impl=self.msda_impl, name=f"encoder_layer_{i}",
            )(output, pos_flat, enc_ref, spatial_shapes, mask_flat,
              deterministic=deterministic)
        memory = output

        # ---- decoder ----
        n = memory.shape[0]
        q = query_embed.shape[0]
        query_pos = jnp.broadcast_to(query_embed[None], (n, q, query_embed.shape[1])).astype(self.dtype)
        reference_points = jax.nn.sigmoid(
            nn.Dense(2, dtype=jnp.float32, kernel_init=xavier_uniform, name="reference_points")(query_pos)
        )
        init_reference = reference_points

        hs_layers = []
        refs_layers = []          # detached per-layer references (as stored by :388,392)
        coords_layers = []        # gradient-carrying per-layer coord predictions
        samples_layers = []       # top-30 sampling points per layer
        out_q = tgt

        for i in range(self.num_decoder_layers):
            if reference_points.shape[-1] == 4:
                ref_input = reference_points[:, :, None] * jnp.concatenate(
                    [valid_ratios, valid_ratios], -1)[:, None]
            else:
                ref_input = reference_points[:, :, None] * valid_ratios[:, None]

            out_q, locations, attn = DecoderLayer(
                self.d_model, self.dim_feedforward, self.num_feature_levels,
                self.nhead, self.dec_n_points, self.dropout, dtype=self.dtype,
                msda_impl=self.msda_impl, return_samples=self.track_samples,
                name=f"decoder_layer_{i}",
            )(out_q, query_pos, ref_input, memory, spatial_shapes, mask_flat,
              deterministic=deterministic)

            # top-30 sampling-point tracking (deformable_transformer.py:368-375);
            # visualization-only, gated off by default
            if self.track_samples:
                lq = locations.shape[1]
                norm_locs = locations / valid_ratios[:, None, None, :, None, :]
                w_flat = attn.reshape(n, lq, -1)
                s_flat = norm_locs.reshape(n, lq, -1, 2)
                top_w, top_idx = jax.lax.top_k(w_flat, self.num_samples_kept)
                samples_keep = jnp.take_along_axis(
                    s_flat, top_idx[..., None].repeat(2, axis=-1), axis=2
                )
                samples_layers.append(samples_keep)

            if self.with_box_refine:
                bias0 = np.zeros(4, np.float32)
                if i == 0:
                    bias0[2:] = -2.0  # ocpg.py:161
                tmp = MLP(
                    self.d_model, 4, 3, dtype=jnp.float32,
                    final_kernel_init=nn.initializers.zeros,
                    final_bias_init=lambda key, shape, dtype=jnp.float32, _b=bias0: jnp.asarray(_b, dtype),
                    name=f"bbox_embed_{i}",
                )(out_q.astype(jnp.float32))
                if reference_points.shape[-1] == 4:
                    new_ref = jax.nn.sigmoid(tmp + inverse_sigmoid(reference_points))
                else:
                    new_ref = jax.nn.sigmoid(
                        tmp.at[..., :2].add(inverse_sigmoid(reference_points))
                    )
                coords_layers.append(new_ref)
                reference_points = jax.lax.stop_gradient(new_ref)
            else:
                coords_layers.append(None)

            hs_layers.append(out_q)
            refs_layers.append(reference_points)

        hs = jnp.stack(hs_layers)                       # (Ldec, N, Q, C)
        inter_references = jnp.stack(refs_layers)        # (Ldec, N, Q, 2|4)
        inter_samples = (
            jnp.stack(samples_layers) if self.track_samples else None
        )                                                # (Ldec, N, Q, 30, 2)
        inter_coords = (
            jnp.stack(coords_layers) if self.with_box_refine else None
        )

        # per-level memory for the FPN-style mask path (:204-212); levels 0..L-2
        memory_features = []
        start = 0
        for lvl in range(self.num_feature_levels - 1):
            h, w = spatial_shapes[lvl]
            memory_features.append(
                jax.lax.dynamic_slice_in_dim(memory, start, h * w, axis=1).reshape(n, h, w, -1)
            )
            start += h * w

        return {
            "hs": hs,
            "memory_features": memory_features,
            "init_reference": init_reference,
            "inter_references": inter_references,
            "inter_coords": inter_coords,
            "inter_samples": inter_samples,
        }
