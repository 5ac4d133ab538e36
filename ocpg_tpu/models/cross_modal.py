"""Spectrum-guided cross-modal fusion: LFM spectral filter + VL fusion.

Reference:
  * LFMResizeAdaptive — /root/reference/models/modules.py:9-61.  FFT2 of each
    (fused) feature map, learned scalar coefficient from a Laplacian conv +
    GAP + MLP, suppression of a Gaussian band `y * (1 - coef * filter)`, 1x1
    convs on concatenated (real, imag), iFFT, residual add.  The Gaussian is
    built once at the highest level and bilinearly resized for lower levels
    (`ocpg.py:248-295`).
  * VisionLanguageFusionModule — /root/reference/models/segmentation.py:95-113:
    cross-attention with visual tokens as queries, text as keys/values,
    multiplicative gating `visual * attn_out`.

TPU notes: `jnp.fft.fft2` lowers to native XLA FFT on TPU; the filter runs in
fp32 (the reference wraps it in `.float()` islands under AMP, `modules.py:35`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.image import bilinear_resize
from .layers import MultiheadAttention

Array = jax.Array


def make_gaussian(height: int, width: int, sigma: float) -> Array:
    """modules.py:25-31 — Gaussian centered at (h//2, w//2) in *unshifted* FFT coords."""
    y_idx, x_idx = height // 2, width // 2
    yv = jnp.arange(height, dtype=jnp.float32)[:, None]
    xv = jnp.arange(width, dtype=jnp.float32)[None, :]
    g = jnp.exp(-((yv - y_idx) ** 2 + (xv - x_idx) ** 2) / (2.0 * sigma**2))
    return g[None, :, :, None]  # (1, H, W, 1)


class LFM(nn.Module):
    """Learned frequency-domain modulation (LFMResizeAdaptive), NHWC."""
    num_channels: int
    sigma: float = 7.0

    @nn.compact
    def __call__(self, x: Array, gauss_map: Optional[Array] = None) -> Tuple[Array, Array]:
        b, h, w, c = x.shape
        in_dtype = x.dtype
        x = x.astype(jnp.float32)

        # scalar coefficient: 3x3 VALID conv -> GAP -> MLP -> sigmoid
        # (reference uses padding=0, modules.py:16; for feature maps smaller
        #  than the kernel — which the reference never feeds — fall back to
        #  SAME so the GAP is over a non-empty map)
        pad = "VALID" if (h >= 3 and w >= 3) else "SAME"
        coef = nn.Conv(c, (3, 3), padding=pad, name="laplace")(x)
        coef = coef.mean(axis=(1, 2))  # (b, c)
        coef = nn.Dense(c, use_bias=False, name="fc1")(coef)
        coef = jax.nn.relu(coef)
        coef = nn.Dense(1, use_bias=False, name="fc2")(coef)
        coef = jax.nn.sigmoid(coef)[:, None, None, :]  # (b, 1, 1, 1)

        y = jnp.fft.fft2(x, axes=(1, 2))

        if gauss_map is None:
            high_filter = make_gaussian(h, w, self.sigma)
        else:
            high_filter = bilinear_resize(gauss_map, (h, w), align_corners=False)

        y = y * (1.0 - coef * high_filter).astype(y.dtype)

        y_f = jnp.concatenate([y.real, y.imag], axis=-1)
        y_f = jax.nn.relu(nn.Conv(2 * c, (1, 1), name="conv1")(y_f))
        y_f = nn.Conv(2 * c, (1, 1), name="conv2")(y_f)
        y_real, y_imag = jnp.split(y_f, 2, axis=-1)
        y = jax.lax.complex(y_real, y_imag)
        y = jnp.fft.ifft2(y, axes=(1, 2)).real
        return (x + y).astype(in_dtype), high_filter


class VisionLanguageFusion(nn.Module):
    """Cross-attention vision<-text with multiplicative gating (segmentation.py:95-113)."""
    num_heads: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        visual: Array,          # (B, Lv, C) flattened t*h*w visual tokens
        text: Array,            # (B, Lt, C)
        text_pad_mask: Array,   # (B, Lt) bool, True = pad
        text_pos: Array,        # (B, Lt, C)
        *,
        deterministic: bool = True,
    ) -> Array:
        attn_out = MultiheadAttention(self.num_heads, self.dropout, dtype=self.dtype,
                                      name="multihead_attn")(
            query=visual,
            key=text + text_pos,
            value=text,
            key_padding_mask=text_pad_mask,
            deterministic=deterministic,
        )
        return visual * attn_out
