"""Sine positional encodings (1D text, 2D image).

Reference: /root/reference/models/position_encoding.py:12-84.  Operates on
bool padding masks (True = padding) and returns channels-last features.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def _dim_t(num_pos_feats: int, temperature: float) -> Array:
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    return temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)


def _interleave_sin_cos(pos: Array) -> Array:
    # pos: (..., C); stack(sin(pos[0::2]), cos(pos[1::2])) then flatten
    return jnp.stack((jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])), axis=-1).reshape(
        *pos.shape[:-1], -1
    )


def position_embedding_sine_1d(
    mask: Array,                    # (B, L) bool, True = padding
    num_pos_feats: int = 256,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
) -> Array:                         # (B, L, C)
    """position_encoding.py:12-45 (note: no -0.5 shift in the 1D variant)."""
    not_mask = (~mask).astype(jnp.float32)
    x_embed = jnp.cumsum(not_mask, axis=1)
    if normalize:
        eps = 1e-6
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    pos_x = x_embed[:, :, None] / _dim_t(num_pos_feats, temperature)
    return _interleave_sin_cos(pos_x)


def position_embedding_sine_2d(
    mask: Array,                    # (B, H, W) bool, True = padding
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
) -> Array:                         # (B, H, W, 2 * num_pos_feats), channels = (y, x)
    """position_encoding.py:48-84 (with the -0.5 half-pixel shift)."""
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = _dim_t(num_pos_feats, temperature)
    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_t)
    return jnp.concatenate((pos_y, pos_x), axis=-1)
