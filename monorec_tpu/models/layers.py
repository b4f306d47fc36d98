"""Flax layer library with TensorFlow-"same" padding semantics.

The reference network geometry depends on torch layers that imitate TF "same"
padding (reference ``model/layers.py:220-286``): asymmetric pads computed from
kernel/stride, separable y-then-x convolutions, 2x nearest upsampling with a
k=2 conv, and a k=4/s=2 transposed conv cropped back to exactly 2x the input.
These modules reproduce that geometry in NHWC for TPU-friendly convs.

All activations are LeakyReLU(0.1) as in the reference.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array
IntPair = Union[int, Tuple[int, int]]


def _pair(v: IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (v[0], v[1])


def same_pad_amounts(size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """TF-"same" asymmetric pad (floor on the leading side, ceil trailing)."""
    total = stride * (math.ceil(size / stride) - 1) + kernel - size
    half = total / 2
    return (math.floor(half), math.ceil(half))


def pad_same(x: Array, kernel: IntPair, stride: IntPair = 1) -> Array:
    """Pad an NHWC tensor for a subsequent VALID conv to emulate "same"."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    h, w = x.shape[-3], x.shape[-2]
    py = same_pad_amounts(h, kh, sh)
    px = same_pad_amounts(w, kw, sw)
    return jnp.pad(x, ((0, 0), py, px, (0, 0)))


class SamePadConv(nn.Module):
    """Explicit TF-"same" pad followed by a VALID conv (no activation).

    ``dtype`` is the computation dtype (params stay f32): bf16 runs the
    conv on the MXU at twice the f32 throughput — the serving/mixed-
    precision path, threaded down from ``MonoRecConfig.compute_dtype``.
    """

    features: int
    kernel_size: IntPair
    stride: IntPair = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        # Same zero padding as pad_same, but expressed through the conv's
        # padding attribute: XLA folds it into the convolution instead of
        # materializing a padded copy (measured ~1 ms per explicit pad at
        # 8x256x512 scale, and the pad-transpose again in the backward).
        py = same_pad_amounts(x.shape[-3], kh, sh)
        px = same_pad_amounts(x.shape[-2], kw, sw)
        return nn.Conv(
            self.features,
            kernel_size=(kh, kw),
            strides=(sh, sw),
            padding=(py, px),
            dtype=self.dtype,
        )(x)


class ConvLReLU(nn.Module):
    """Same-pad conv + LeakyReLU(0.1) (reference ``ConvReLU``)."""

    features: int
    kernel_size: IntPair
    stride: IntPair = 1
    neg_slope: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = SamePadConv(
            self.features, self.kernel_size, self.stride, dtype=self.dtype
        )(x)
        return nn.leaky_relu(x, self.neg_slope)


class SeparableConvLReLU(nn.Module):
    """y-direction conv + LeakyReLU, then x-direction conv + LeakyReLU.

    Reference ``ConvReLU2`` (``model/layers.py:289-314``): a (k,1) conv with
    stride (s,1) followed by a (1,k) conv with stride (1,s), both same-padded,
    each followed by LeakyReLU(0.1).
    """

    features: int
    kernel_size: int
    stride: int = 1
    neg_slope: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = SamePadConv(
            self.features, (self.kernel_size, 1), (self.stride, 1),
            dtype=self.dtype,
        )(x)
        x = nn.leaky_relu(x, self.neg_slope)
        x = SamePadConv(
            self.features, (1, self.kernel_size), (1, self.stride),
            dtype=self.dtype,
        )(x)
        return nn.leaky_relu(x, self.neg_slope)


def upsample_nearest_2x(x: Array) -> Array:
    """2x nearest-neighbor upsampling of an NHWC tensor."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class Upconv(nn.Module):
    """2x nearest upsample + same-pad k=2 conv (reference ``Upconv``)."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = upsample_nearest_2x(x)
        return SamePadConv(self.features, 2, 1, dtype=self.dtype)(x)


class Refine(nn.Module):
    """Transposed conv k=4/s=2 + LeakyReLU, center-cropped to exactly 2x.

    Reference ``Refine`` + ``PadSameConv2dTransposed`` (``model/layers.py:
    255-286, 380-400``): VALID transposed conv yields (2H+2, 2W+2); the
    result is cropped by 1 pixel on every side AFTER the activation.
    """

    features: int
    neg_slope: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.ConvTranspose(
            self.features, kernel_size=(4, 4), strides=(2, 2), padding="VALID",
            dtype=self.dtype,
        )(x)
        x = nn.leaky_relu(x, self.neg_slope)
        return x[:, 1:-1, 1:-1, :]


def max_pool_2x2(x: Array) -> Array:
    """2x2/2 max pool (torch ``MaxPool2d(2)`` on even extents)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
