"""PerceptualError (VGG16-prefix feature MSE) vs a torch oracle
(reference ``common_losses.py:166-201``; torchvision is unavailable here, so
the oracle replicates the VGG16 prefix with random shared weights)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from monorec_tpu.losses.perceptual import (
    PerceptualError,
    convert_torchvision_vgg16,
)

N, H, W = 2, 16, 32


def _torch_extractor(small):
    torch.manual_seed(0)
    layers = [
        nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(),
        nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(),
    ]
    if not small:
        layers += [
            nn.MaxPool2d(2),
            nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
            nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(),
        ]
    return nn.Sequential(*layers).eval()


def _oracle(extractor, img0, img1, mask=None, small=False):
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    i0 = (img0 - mean) / std
    i1 = (img1 - mean) / std
    if mask is not None:
        m = mask.unsqueeze(1).expand(-1, 3, -1, -1)
        i0 = i0.masked_fill(m, 0)
        i1 = i1.masked_fill(m, 0)
    feats = extractor(torch.cat([i0, i1], 0))
    f0, f1 = feats[:N], feats[N:]
    return torch.mean((f1 - f0) ** 2, dim=1)


@pytest.mark.parametrize("small", [True, False])
def test_perceptual_error_matches_torch_oracle(small):
    extractor = _torch_extractor(small)
    # Convert through the torchvision-key mapping (features.0/2/5/7).
    tv_idx = ["0", "2"] if small else ["0", "2", "5", "7"]
    seq_idx = ["0", "2"] if small else ["0", "2", "5", "7"]
    sd = {}
    state = extractor.state_dict()
    for tvi, si in zip(tv_idx, seq_idx):
        sd[f"features.{tvi}.weight"] = state[f"{si}.weight"]
        sd[f"features.{tvi}.bias"] = state[f"{si}.bias"]
    params = convert_torchvision_vgg16(sd)

    rng = np.random.default_rng(0)
    img0 = rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32)
    img1 = rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32)
    mask = rng.uniform(0, 1, (N, H, W)) > 0.7

    model = PerceptualError(small_features=small)
    out = model.apply(
        {"params": params}, jnp.asarray(img0), jnp.asarray(img1)
    )
    with torch.no_grad():
        ref = _oracle(
            extractor,
            torch.from_numpy(img0).permute(0, 3, 1, 2),
            torch.from_numpy(img1).permute(0, 3, 1, 2),
            small=small,
        )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)

    out_m, mask_m = model.apply(
        {"params": params},
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(mask),
    )
    with torch.no_grad():
        ref_m = _oracle(
            extractor,
            torch.from_numpy(img0).permute(0, 3, 1, 2),
            torch.from_numpy(img1).permute(0, 3, 1, 2),
            mask=torch.from_numpy(mask),
            small=small,
        )
    np.testing.assert_allclose(
        np.asarray(out_m), ref_m.numpy(), rtol=1e-4, atol=1e-5
    )
    assert mask_m.shape == out_m.shape
    if small:
        np.testing.assert_array_equal(np.asarray(mask_m), mask)
