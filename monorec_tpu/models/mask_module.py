"""MaskModule: moving-object probability from per-frame cost volumes.

Mirrors the reference ``MaskModule`` (``model/monorec/monorec_model.py:
287-385``): a weight-shared U-Net encoder runs over each single-frame cost
volume, encoder features are fused with an element-wise ``max`` across
frames, dropout (p=0.5, training only) is applied per fused feature, and a
decoder with skip connections from both the fused CV features and the ResNet
image features predicts a 1-channel sigmoid mask.

``SimpleMaskModule`` (reference ``:388-473``) instead averages the stacked
per-frame CVs over their nonzero entries and conditions on the keyframe and
the (stop-gradient) depth prediction.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from monorec_tpu.models.layers import ConvLReLU, Upconv, max_pool_2x2

Array = jax.Array

_ENC_CH_TAIL = (48, 64, 96, 96)
_DEC_CH = (96, 96, 64, 48)


class _CVEncoder(nn.Module):
    """Five-stage encoder over a cost volume; returns all stage features."""

    in_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        chans = (self.in_channels,) + _ENC_CH_TAIL
        feats = []
        for i, ch in enumerate(chans):
            if i > 0:
                x = max_pool_2x2(x)
            x = ConvLReLU(ch, 3, dtype=self.dtype, name=f"enc{i}a")(x)
            x = ConvLReLU(ch, 3, dtype=self.dtype, name=f"enc{i}b")(x)
            feats.append(x)
        return feats


class _MaskDecoder(nn.Module):
    """Decoder with CV-feature and image-feature skip connections."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, cv_feats: Sequence[Array], image_features: Sequence[Array]) -> Array:
        if self.dtype is not None:
            image_features = [f.astype(self.dtype) for f in image_features]
        # dec0: H/16 -> H/8; first Upconv consumes resnet layer3 features too.
        x = jnp.concatenate([cv_feats[4], image_features[3]], axis=-1)
        x = Upconv(_DEC_CH[0], dtype=self.dtype, name="up0")(x)
        x = jnp.concatenate([cv_feats[3], image_features[2], x], axis=-1)
        x = ConvLReLU(_DEC_CH[0], 3, dtype=self.dtype, name="dec0a")(x)
        x = ConvLReLU(_DEC_CH[0], 3, dtype=self.dtype, name="dec0b")(x)

        # dec1: H/8 -> H/4.
        x = Upconv(_DEC_CH[0], dtype=self.dtype, name="up1")(x)
        x = jnp.concatenate([cv_feats[2], image_features[1], x], axis=-1)
        x = ConvLReLU(_DEC_CH[1], 3, dtype=self.dtype, name="dec1a")(x)
        x = ConvLReLU(_DEC_CH[1], 3, dtype=self.dtype, name="dec1b")(x)

        # dec2: H/4 -> H/2.
        x = Upconv(_DEC_CH[1], dtype=self.dtype, name="up2")(x)
        x = jnp.concatenate([cv_feats[1], image_features[0], x], axis=-1)
        x = ConvLReLU(_DEC_CH[2], 3, dtype=self.dtype, name="dec2a")(x)
        x = ConvLReLU(_DEC_CH[2], 3, dtype=self.dtype, name="dec2b")(x)

        # dec3: H/2 -> H (CV skip only).
        x = Upconv(_DEC_CH[2], dtype=self.dtype, name="up3")(x)
        x = jnp.concatenate([cv_feats[0], x], axis=-1)
        x = ConvLReLU(_DEC_CH[3], 3, dtype=self.dtype, name="dec3a")(x)
        x = ConvLReLU(_DEC_CH[3], 3, dtype=self.dtype, name="dec3b")(x)

        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="classifier")(x)
        # The mask gates the cost volume and feeds the losses in f32.
        return nn.sigmoid(x).astype(jnp.float32)


class MaskModule(nn.Module):
    depth_steps: int = 32
    use_cv: bool = True
    use_features: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        single_frame_cvs: Array,  # (B, F, H, W, D)
        image_features: Sequence[Array],
        train: bool = False,
    ) -> Array:
        if not self.use_cv:
            single_frame_cvs = single_frame_cvs * 0.0
        if not self.use_features:
            image_features = [f * 0.0 for f in image_features]

        if self.dtype is not None:
            single_frame_cvs = single_frame_cvs.astype(self.dtype)
        encoder = _CVEncoder(self.depth_steps, dtype=self.dtype, name="cv_encoder")
        b, n_frames = single_frame_cvs.shape[:2]

        # One weight-shared encoder pass over all frames at once (frame axis
        # folded into batch): the encoder is per-sample (convs + LeakyReLU,
        # no cross-batch ops), so this is exactly the reference's per-frame
        # loop (monorec_model.py:360-365) with bigger GEMMs and F x fewer
        # kernel launches; the max fusion happens on the unfolded frame axis.
        # Gradient note for parity debugging: jnp.max splits the gradient
        # evenly across frames on exact feature ties (e.g. zeroed CV
        # regions), whereas the reference's chained pairwise maximum
        # attributes ties geometrically; total gradient into the shared
        # encoder is conserved, forward values are identical.
        feats = encoder(
            single_frame_cvs.reshape(b * n_frames, *single_frame_cvs.shape[2:])
        )
        fused: List[Array] = [
            jnp.max(f.reshape(b, n_frames, *f.shape[1:]), axis=1) for f in feats
        ]

        dropout = nn.Dropout(rate=0.5, deterministic=not train)
        fused = [dropout(f) for f in fused]

        return _MaskDecoder(dtype=self.dtype, name="decoder")(fused, image_features)


class SimpleMaskModule(nn.Module):
    depth_steps: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        single_frame_cvs: Array,  # (B, F, H, W, D)
        keyframe: Array,
        predicted_inverse_depth: Array,  # finest-scale prediction (B, H, W, 1)
        image_features: Sequence[Array],
        train: bool = False,
    ) -> Array:
        counts = jnp.clip(
            jnp.sum((single_frame_cvs != 0).astype(keyframe.dtype), axis=1), 1, None
        )
        cv_avg = jnp.sum(single_frame_cvs, axis=1) / counts

        x = jnp.concatenate(
            [cv_avg, keyframe, jax.lax.stop_gradient(predicted_inverse_depth)],
            axis=-1,
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = _CVEncoder(
            self.depth_steps + 3 + 1, dtype=self.dtype, name="cv_encoder"
        )(x)
        return _MaskDecoder(dtype=self.dtype, name="decoder")(feats, image_features)
