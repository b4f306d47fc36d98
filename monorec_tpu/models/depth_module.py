"""Depth decoder: cost volume + keyframe -> 4-scale inverse depth.

Architecture mirrors the reference ``DepthModule``
(``model/monorec/monorec_model.py:476-557``): a separable-conv encoder over
``concat(cost_volume, keyframe)`` (35 input channels), a transposed-conv
decoder with skip connections from both the cost-volume encoder and the
ResNet image features, and four prediction heads producing ``abs(tanh(conv))``
in [0, 1] at full, 1/2, 1/4 and 1/8 resolution (returned finest-first).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monorec_tpu.models.layers import Refine, SamePadConv, SeparableConvLReLU

Array = jax.Array


class _PredictHead(nn.Module):
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = SamePadConv(1, 3, 1, dtype=self.dtype)(x)
        return jnp.abs(jnp.tanh(x))


class DepthModule(nn.Module):
    """Returns a list of inverse-depth activations, finest resolution first."""

    depth_steps: int = 32
    large_model: bool = False
    # Computation dtype (params stay f32). bf16 halves the conv time on the
    # MXU; the default None (= f32) is the exact reference-parity path.
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, cost_volume: Array, keyframe: Array, image_features: Sequence[Array]
    ) -> List[Array]:
        enc_ch = (48, 64, 128, 256, 512) if self.large_model else (48, 64, 128, 192, 256)
        dec_ch = (512, 256, 128, 64, 32, 24) if self.large_model else (256, 128, 64, 48, 32, 24)

        if self.dtype is not None:
            cost_volume = cost_volume.astype(self.dtype)
            keyframe = keyframe.astype(self.dtype)
            image_features = [f.astype(self.dtype) for f in image_features]
        x = jnp.concatenate([cost_volume, keyframe], axis=-1)

        # Encoder: kernel sizes 7/7/5/5/3 with stride-2 downsampling from the
        # second stage, each stage followed by a k=3 refinement conv.
        kernels = (7, 7, 5, 5, 3)
        cv_feats = []
        for i, (ch, k) in enumerate(zip(enc_ch, kernels)):
            stride = 1 if i == 0 else 2
            x = SeparableConvLReLU(ch, k, stride, dtype=self.dtype, name=f"enc{i}a")(x)
            x = SeparableConvLReLU(ch, 3, 1, dtype=self.dtype, name=f"enc{i}b")(x)
            cv_feats.append(x)

        preds: List[Array] = []

        # dec0: H/16 -> H/8, predict coarsest scale.
        x = Refine(dec_ch[0], dtype=self.dtype, name="dec0")(cv_feats[4])
        preds.insert(0, _PredictHead(dtype=self.dtype, name="pred0")(x))

        # dec1: H/8 -> H/4 (skips: cv enc3 + resnet layer2).
        x = jnp.concatenate([cv_feats[3], image_features[2], x], axis=-1)
        x = Refine(dec_ch[1], dtype=self.dtype, name="dec1")(x)
        x = SeparableConvLReLU(dec_ch[1], 3, 1, dtype=self.dtype, name="dec1b")(x)
        preds.insert(0, _PredictHead(dtype=self.dtype, name="pred1")(x))

        # dec2: H/4 -> H/2 (skips: cv enc2 + resnet layer1).
        x = jnp.concatenate([cv_feats[2], image_features[1], x], axis=-1)
        x = Refine(dec_ch[2], dtype=self.dtype, name="dec2")(x)
        x = SeparableConvLReLU(dec_ch[2], 3, 1, dtype=self.dtype, name="dec2b")(x)
        preds.insert(0, _PredictHead(dtype=self.dtype, name="pred2")(x))

        # dec3: H/2 -> H (skips: cv enc1 + resnet stem). No prediction here.
        x = jnp.concatenate([cv_feats[1], image_features[0], x], axis=-1)
        x = Refine(dec_ch[3], dtype=self.dtype, name="dec3")(x)

        # dec4: full resolution head.
        x = jnp.concatenate([cv_feats[0], x], axis=-1)
        x = SeparableConvLReLU(dec_ch[4], 3, 1, dtype=self.dtype, name="dec4a")(x)
        x = SamePadConv(dec_ch[5], 3, 1, dtype=self.dtype, name="dec4b")(x)
        x = nn.leaky_relu(x, 0.1)
        preds.insert(0, _PredictHead(dtype=self.dtype, name="pred3")(x))

        # Downstream (affine depth mapping, losses, metrics) is always f32.
        return [p.astype(jnp.float32) for p in preds]
