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
import numpy as np
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


def apply_dynamic_conv_shared(
    mem: Array,            # (G, H, W, C)   features SHARED by the Q queries of each group
    rel: Array,            # (G, Q, H, W, 2) per-query relative coordinates
    params: Array,         # (G, Q, num_params) controller outputs
    channels: int,
    weight_nums: Sequence[int],
    bias_nums: Sequence[int],
) -> Array:                # (G, Q, H, W, channels)
    """`apply_dynamic_conv` with the first layer's input split into its
    query-shared part (the fused encoder memory) and the per-query rel-coord
    planes:

        x1[g,q] = mem[g] @ W1_mem[g,q] + rel[g,q] @ W1_rel[g,q] + b1[g,q]

    Identical math to concatenating [mem, rel] per query (the reference's
    layout, ocpg.py:506-517) but never materialises the Q-fold broadcast of
    the C-channel memory — the mask path's largest HBM tenant (the einsum
    contracts mem against all Q weight matrices in one MXU pass).  Pinned
    against `apply_dynamic_conv` by tests/test_losses.py.
    """
    g, q = params.shape[:2]
    num_layers = len(weight_nums)
    c = mem.shape[-1]
    boundaries = np.cumsum(list(weight_nums) + list(bias_nums))[:-1].tolist()
    splits = list(jnp.split(params, boundaries, axis=-1))
    weights = splits[:num_layers]
    biases = splits[num_layers:]

    cin0 = weight_nums[0] // channels
    w1 = weights[0].reshape(g, q, channels, cin0)
    b1 = biases[0].reshape(g, q, channels)
    if cin0 == c + 2:
        w1_mem, w1_rel = w1[..., :c], w1[..., c:]
        x = (jnp.einsum("ghwc,gqoc->gqhwo", mem, w1_mem)
             + jnp.einsum("gqhwr,gqor->gqhwo", rel, w1_rel)
             + b1[:, :, None, None, :])
    else:
        assert cin0 == c, (cin0, c)
        x = jnp.einsum("ghwc,gqoc->gqhwo", mem, w1) + b1[:, :, None, None, :]

    for l in range(1, num_layers):
        x = jax.nn.relu(x)
        w = weights[l].reshape(g, q, channels, channels)
        b = biases[l].reshape(g, q, channels)
        x = jnp.einsum("gqhwc,gqoc->gqhwo", x, w) + b[:, :, None, None, :]
    return x


class _ConcatConv(nn.Module):
    """3x3 conv over `concat([a, b], -1)` whose `b` operand may be SHARED by
    Q consecutive batch groups.

    Param tree is identical to ``nn.Conv(features, (3, 3), name=...)`` over
    the concatenated input (kernel (3, 3, ca+cb, features) + bias), so
    checkpoints and the torch converter are unaffected.  With ``queries > 1``
    the conv is split by linearity — ``conv(cat[a, b]) = conv_a(a) +
    conv_b(b) + bias`` — and the b-half runs once per group instead of once
    per query: in the A2D/RefCOCO eval branch (refine EVERY query,
    reference ocpg.py:457-465) this removes the Q-fold replication of the
    256/512-channel backbone features, the branch's dominant FLOPs and HBM
    traffic.
    """
    features: int
    ca: int                      # channels of the per-query operand
    cb: int                      # channels of the (possibly shared) operand
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: Array, b: Array, queries: int = 1) -> Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.ca + self.cb, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,))
        k = kernel.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")

        def conv(x, kk):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kk, window_strides=(1, 1),
                padding=((1, 1), (1, 1)), dimension_numbers=dn)

        if queries == 1:
            y = conv(jnp.concatenate([a, b.astype(a.dtype)], axis=-1), k)
            return y + bias.astype(self.dtype)
        g = b.shape[0]
        assert a.shape[0] == g * queries, (a.shape, b.shape, queries)
        ya = conv(a, k[:, :, :self.ca])                    # (G*Q, h, w, F)
        yb = conv(b, k[:, :, self.ca:])                    # (G,   h, w, F)
        ya = ya.reshape(g, queries, *ya.shape[1:])
        return (ya + yb[:, None] + bias.astype(self.dtype)).reshape(
            g * queries, *ya.shape[2:])


class MSO(nn.Module):
    """Multi-scale mask refiner (decoder.py:14-47). NHWC.

    ``queries > 1`` marks feat_4x/feat_8x as shared by Q consecutive
    pred_masks groups (pred_masks batch = G*Q, feats batch = G, G-major
    ordering) — see _ConcatConv.
    """
    mask_dim: int = 16
    img_dims: Tuple[int, int] = (256, 512)  # backbone channels at 1/4 and 1/8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pred_masks: Array, feat_4x: Array, feat_8x: Array,
                 queries: int = 1) -> Array:
        """pred_masks: (N, H/8, W/8, mask_dim); feats: backbone levels at 1/4, 1/8."""
        x = jax.nn.relu(_ConcatConv(
            self.mask_dim, self.mask_dim, self.img_dims[1], dtype=self.dtype,
            name="conv1_1div8")(jax.nn.relu(pred_masks),
                                jax.nn.relu(feat_8x.astype(pred_masks.dtype)),
                                queries))
        pred_masks = pred_masks + nn.Conv(self.mask_dim, (3, 3), padding=1,
                                          dtype=self.dtype, name="conv2_1div8")(x)

        pred_masks = bilinear_resize(
            pred_masks, (feat_4x.shape[1], feat_4x.shape[2]), align_corners=False
        )
        x = jax.nn.relu(_ConcatConv(
            self.mask_dim, self.mask_dim, self.img_dims[0], dtype=self.dtype,
            name="conv1_1div4")(jax.nn.relu(pred_masks),
                                jax.nn.relu(feat_4x.astype(pred_masks.dtype)),
                                queries))
        pred_masks = pred_masks + nn.Conv(self.mask_dim, (3, 3), padding=1,
                                          dtype=self.dtype, name="conv2_1div4")(x)

        return nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="out_conv")(pred_masks)
