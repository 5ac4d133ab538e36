"""Dynamic-conv mask head (CPK) and MSO mask refiner.

Reference:
  * controller + dynamic convs — /root/reference/models/ocpg.py:170-195,
    475-569: a 3-layer MLP emits per-query weights for `controller_layers`
    (default 2) 1x1 conv layers over `mask_dim`(+2 rel-coord) channels down to
    `dynamic_mask_channels` (16) patch logits; relative coordinates are the
    reference point minus the pixel grid at stride 8 (`compute_locations`,
    ocpg.py:596-609).
  * The reference realises the per-instance convs as grouped 1x1 convs over a
    (1, n_inst*C, h, w) tensor (ocpg.py:531-549).  On TPU we instead unpack
    the controller parameters into per-instance matrices and run one batched
    einsum per layer — the same computation expressed as an MXU-friendly
    contraction with no groups.
  * MSO — /root/reference/models/decoder.py:14-47: fuse patch logits with
    backbone features at 1/8 then 1/4 via two 3x3 conv blocks, then a 3x3
    output conv to 1 channel.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.image import bilinear_resize
from .layers import MLP

Array = jax.Array


def dynamic_params_layout(in_channels: int, channels: int, num_layers: int,
                          rel_coord: bool) -> Tuple[List[int], List[int]]:
    """weight_nums / bias_nums (ocpg.py:176-191)."""
    weight_nums, bias_nums = [], []
    for l in range(num_layers):
        if l == 0:
            cin = in_channels + 2 if rel_coord else in_channels
            weight_nums.append(cin * channels)
        else:
            weight_nums.append(channels * channels)
        bias_nums.append(channels)
    return weight_nums, bias_nums


def compute_locations(h: int, w: int, stride: int) -> Array:
    """Pixel-center grid in image coordinates (ocpg.py:596-609). Returns (h, w, 2) xy."""
    shift_x = jnp.arange(w, dtype=jnp.float32) * stride + stride // 2
    shift_y = jnp.arange(h, dtype=jnp.float32) * stride + stride // 2
    xs = jnp.broadcast_to(shift_x[None, :], (h, w))
    ys = jnp.broadcast_to(shift_y[:, None], (h, w))
    return jnp.stack((xs, ys), axis=-1)


def apply_dynamic_conv(
    features: Array,       # (I, H, W, Cin)  per-instance features (incl. rel coords)
    params: Array,         # (I, num_params) controller outputs
    channels: int,
    weight_nums: Sequence[int],
    bias_nums: Sequence[int],
) -> Array:                # (I, H, W, channels) patch logits
    """Per-instance 1x1 conv stack as batched einsums (ocpg.py:531-569)."""
    import numpy as np

    num_layers = len(weight_nums)
    boundaries = np.cumsum(list(weight_nums) + list(bias_nums))[:-1].tolist()
    splits = list(jnp.split(params, boundaries, axis=1))
    weights = splits[:num_layers]
    biases = splits[num_layers:]

    x = features
    for l in range(num_layers):
        cin = x.shape[-1]
        # torch conv weight layout: (out=channels, in=cin, 1, 1) flattened row-major
        w = weights[l].reshape(-1, channels, cin)           # (I, out, in)
        b = biases[l].reshape(-1, channels)                 # (I, out)
        x = jnp.einsum("ihwc,ioc->ihwo", x, w) + b[:, None, None, :]
        if l < num_layers - 1:
            x = jax.nn.relu(x)
    return x


class MSO(nn.Module):
    """Multi-scale mask refiner (decoder.py:14-47). NHWC."""
    mask_dim: int = 16
    img_dims: Tuple[int, int] = (256, 512)  # backbone channels at 1/4 and 1/8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pred_masks: Array, feat_4x: Array, feat_8x: Array) -> Array:
        """pred_masks: (N, H/8, W/8, mask_dim); feats: backbone levels at 1/4, 1/8."""
        x = jnp.concatenate([pred_masks, feat_8x.astype(pred_masks.dtype)], axis=-1)
        x = jax.nn.relu(x)
        x = jax.nn.relu(nn.Conv(self.mask_dim, (3, 3), padding=1, dtype=self.dtype, name="conv1_1div8")(x))
        pred_masks = pred_masks + nn.Conv(self.mask_dim, (3, 3), padding=1, dtype=self.dtype, name="conv2_1div8")(x)

        pred_masks = bilinear_resize(
            pred_masks, (feat_4x.shape[1], feat_4x.shape[2]), align_corners=False
        )
        x = jnp.concatenate([pred_masks, feat_4x.astype(pred_masks.dtype)], axis=-1)
        x = jax.nn.relu(x)
        x = jax.nn.relu(nn.Conv(self.mask_dim, (3, 3), padding=1, dtype=self.dtype, name="conv1_1div4")(x))
        pred_masks = pred_masks + nn.Conv(self.mask_dim, (3, 3), padding=1, dtype=self.dtype, name="conv2_1div4")(x)

        return nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="out_conv")(pred_masks)
