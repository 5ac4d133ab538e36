"""ResNet-50/101 visual backbone with frozen BatchNorm (NHWC).

Reference: /root/reference/models/backbone.py:59-101 — torchvision ResNet with
`FrozenBatchNorm2d`, intermediate outputs from layer1..layer4 (strides
[4, 8, 16, 32], channels [256, 512, 1024, 2048]), optional DC5 dilation on
layer4 (`replace_stride_with_dilation=[False, False, dilation]`).

TPU notes: NHWC conv layouts, bf16 compute with fp32 frozen-BN statistics
(the affine fold `x * scale + shift` is exact in fp32 then cast).  Parameter
naming tracks torchvision (`layer{i}.{j}.conv{k}` etc.) so torch checkpoints
convert mechanically (see ocpg_tpu/utils/torch_weights.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import FrozenBatchNorm

Array = jax.Array


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = jax.nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((self.dilation, self.dilation), (self.dilation, self.dilation)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = jax.nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(identity)
        return jax.nn.relu(out + identity)


class ResNet(nn.Module):
    """Returns features from all four stages: strides (4, 8, 16, 32)."""
    layers: Sequence[int]           # (3, 4, 6, 3) for r50; (3, 4, 23, 3) for r101
    dilation: bool = False          # DC5: dilate layer4, stride stays 16
    dtype: jnp.dtype = jnp.float32

    strides: Tuple[int, ...] = (4, 8, 16, 32)
    num_channels: Tuple[int, ...] = (256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array, Array]:
        # stem
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        # max pool 3x3 stride 2, padding 1
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = (64, 128, 256, 512)
        dilation = 1
        for stage, (blocks, p) in enumerate(zip(self.layers, planes)):
            stride = 1 if stage == 0 else 2
            if stage == 3 and self.dilation:
                dilation *= stride
                stride = 1
            for b in range(blocks):
                x = Bottleneck(
                    p,
                    stride=stride if b == 0 else 1,
                    dilation=dilation,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            outs.append(x)
        return tuple(outs)


def build_resnet(arch: str, dilation: bool, dtype=jnp.float32, name: str | None = None) -> ResNet:
    layers = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}[arch]
    return ResNet(layers=layers, dilation=dilation, dtype=dtype, name=name)
