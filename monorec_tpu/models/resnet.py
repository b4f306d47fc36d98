"""ResNet feature encoder (flax, NHWC).

Mirrors the behavior of the reference ``ResnetEncoder``
(``model/monorec/monorec_model.py:95-129``): a torchvision-style ResNet whose
five feature scales (post-relu stem, layer1..layer4) are returned at strides
2/4/8/16/32 with channel counts [64, 64, 128, 256, 512] (x4 beyond 34
layers). Input in [0, 1] is normalized as (x - 0.45) / 0.225.

The encoder is frozen during MonoRec training by default, so BatchNorm always
uses stored moving statistics here (``use_running_average=True``); a
converter (tools/convert_pth.py) can inject ImageNet weights when available.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5
        )(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False,
        )(x)
        y = _BN()(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False
        )(y)
        y = _BN()(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            residual = _BN(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is features * 4
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_feats = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        y = _BN()(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False,
        )(y)
        y = _BN()(y)
        y = nn.relu(y)
        y = nn.Conv(out_feats, (1, 1), use_bias=False)(y)
        y = _BN()(y)
        if self.stride != 1 or x.shape[-1] != out_feats:
            residual = nn.Conv(
                out_feats, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            residual = _BN(name="downsample_bn")(residual)
        return nn.relu(y + residual)


_DEPTH_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


def encoder_channels(num_layers: int) -> Tuple[int, ...]:
    base = (64, 64, 128, 256, 512)
    if num_layers > 34:
        return (base[0],) + tuple(c * 4 for c in base[1:])
    return base


class ResNetEncoder(nn.Module):
    """Five-scale feature pyramid. Call with images in [0, 1], NHWC."""

    num_layers: int = 18

    @nn.compact
    def __call__(self, x: Array) -> Sequence[Array]:
        if self.num_layers not in _DEPTH_SPECS:
            raise ValueError(f"unsupported resnet depth {self.num_layers}")
        block, counts = _DEPTH_SPECS[self.num_layers]

        x = (x - 0.45) / 0.225
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False
        )(x)
        x = _BN()(x)
        feats = [nn.relu(x)]

        x = jnp.pad(
            feats[0], ((0, 0), (1, 1), (1, 1), (0, 0)),
            constant_values=-jnp.inf,
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        widths = (64, 128, 256, 512)
        for stage, (width, count) in enumerate(zip(widths, counts)):
            for i in range(count):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block(width, stride, name=f"layer{stage + 1}_block{i}")(x)
            feats.append(x)

        return feats
