"""Perceptual (VGG16-feature) error — reference ``PerceptualError``
(``model/loss_functions/common_losses.py:166-201``).

Defined by the reference but unused by any shipped config; provided for
completeness. The feature extractor is the VGG16 prefix (first 2 convs for
``small_features``, first 4 convs + one max-pool otherwise), inputs are
ImageNet-normalized, and the error is the channel-mean squared feature
difference. Pretrained VGG16 weights can be injected from a torchvision
``state_dict`` ``.pth`` via ``convert_torchvision_vgg16`` /
``load_vgg16_params`` (this environment cannot download them; random
weights still define a valid — if meaningless — metric, so callers should
inject real weights for production use).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


class PerceptualError(nn.Module):
    small_features: bool = False

    @nn.compact
    def __call__(
        self, img0: Array, img1: Array, mask: Optional[Array] = None
    ):
        """img0/img1: (N, H, W, 3) in [0, 1]; mask: optional (N, H, W) bool.

        Returns (N, H', W') errors (H'=H/2 unless small_features), plus the
        downsampled boolean mask when one was given (reference :197-201).
        """
        n, h, w, _ = img0.shape
        mean = jnp.asarray(_MEAN, img0.dtype)
        std = jnp.asarray(_STD, img0.dtype)
        img0 = (img0 - mean) / std
        img1 = (img1 - mean) / std
        if mask is not None:
            keep = (~mask)[..., None].astype(img0.dtype)
            img0 = img0 * keep
            img1 = img1 * keep

        x = jnp.concatenate([img0, img1], axis=0)
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", name="conv0")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", name="conv1")(x))
        if not self.small_features:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(nn.Conv(128, (3, 3), padding="SAME", name="conv2")(x))
            x = nn.relu(nn.Conv(128, (3, 3), padding="SAME", name="conv3")(x))

        f0, f1 = x[:n], x[n:]
        errors = jnp.mean((f1 - f0) ** 2, axis=-1)

        if mask is not None:
            if not self.small_features:
                mh, mw = errors.shape[1:3]
                mask = jax.image.resize(
                    mask.astype(jnp.float32), (n, mh, mw), method="bilinear"
                )
            return errors, mask > 0
        return errors


def convert_torchvision_vgg16(state_dict: Dict) -> Dict:
    """torchvision ``vgg16().features`` state_dict -> flax params.

    torchvision indices: features.0/2 (64-ch convs), features.5/7 (128-ch).
    """
    mapping = {"conv0": "0", "conv1": "2", "conv2": "5", "conv3": "7"}
    params: Dict = {}
    for ours, idx in mapping.items():
        for prefix in (f"features.{idx}", idx):
            wk, bk = f"{prefix}.weight", f"{prefix}.bias"
            if wk in state_dict:
                w = state_dict[wk]
                b = state_dict[bk]
                w = w.numpy() if hasattr(w, "numpy") else np.asarray(w)
                b = b.numpy() if hasattr(b, "numpy") else np.asarray(b)
                params[ours] = {
                    "kernel": np.transpose(w, (2, 3, 1, 0)),
                    "bias": b,
                }
                break
    return params


def load_vgg16_params(path: str, small_features: bool = False) -> Dict:
    """Load a torchvision VGG16 ``.pth`` into PerceptualError params."""
    import torch

    sd = torch.load(Path(path), map_location="cpu", weights_only=True)
    params = convert_torchvision_vgg16(sd)
    if small_features:
        params = {k: v for k, v in params.items() if k in ("conv0", "conv1")}
    return params
