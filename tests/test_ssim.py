"""SSIM parity vs an independent torch oracle built from torch primitives."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from monorec_tpu.ops.ssim import ssim

_GAUSS = torch.tensor(
    [[0.0947, 0.1183, 0.0947], [0.1183, 0.1478, 0.1183], [0.0947, 0.1183, 0.0947]]
)


def _torch_ssim(x, y, pad_reflection, gaussian_average, comp_mode):
    """Oracle mirroring reference model/layers.py:91-139 semantics."""
    x = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = torch.from_numpy(y).permute(0, 3, 1, 2)
    pad = (
        torch.nn.ReflectionPad2d(1) if pad_reflection else torch.nn.ZeroPad2d(1)
    )
    x, y = pad(x), pad(y)

    if gaussian_average:
        c = x.shape[1]
        k = _GAUSS.to(x.dtype).repeat(c, 1, 1, 1)
        avg = lambda t: F.conv2d(t, k, padding=0, groups=c)
    else:
        avg = lambda t: F.avg_pool2d(t, 3, 1)

    mu_x, mu_y = avg(x), avg(y)
    sx = avg(x * x) - mu_x**2
    sy = avg(y * y) - mu_y**2
    sxy = avg(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01**2) * (2 * sxy + 0.03**2)
    d = (mu_x**2 + mu_y**2 + 0.01**2) * (sx + sy + 0.03**2)
    if not comp_mode:
        out = torch.clamp((1 - n / d) / 2, 0, 1)
    else:
        out = torch.clamp(1 - n / d, 0, 1) / 2
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("pad_reflection", [True, False])
@pytest.mark.parametrize("gaussian_average", [True, False])
@pytest.mark.parametrize("comp_mode", [True, False])
def test_ssim_matches_torch_oracle(pad_reflection, gaussian_average, comp_mode):
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(2, 12, 20, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)

    ours = np.asarray(
        ssim(jnp.asarray(x), jnp.asarray(y), pad_reflection, gaussian_average, comp_mode)
    )
    ref = _torch_ssim(x, y, pad_reflection, gaussian_average, comp_mode)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_identical_images_zero_error():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(1, 8, 8, 3)).astype(np.float32)
    out = np.asarray(ssim(jnp.asarray(x), jnp.asarray(x)))
    assert np.all(out < 1e-5)
