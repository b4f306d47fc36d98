"""Parity tests for the bilinear sampler vs torch.nn.functional.grid_sample.

The warp path is the #1 numerical-parity risk (SURVEY.md §7 "hard parts");
torch CPU is the oracle for align_corners=False / zeros-padding semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from monorec_tpu.ops.sampling import grid_sample_nhwc


def _torch_grid_sample(img_nhwc: np.ndarray, grid: np.ndarray) -> np.ndarray:
    t_img = torch.from_numpy(img_nhwc).permute(0, 3, 1, 2)
    t_grid = torch.from_numpy(grid)
    out = F.grid_sample(
        t_img, t_grid, mode="bilinear", padding_mode="zeros", align_corners=False
    )
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_grids_match_torch(seed):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((2, 13, 21, 3), dtype=np.float32)
    grid = rng.uniform(-1.5, 1.5, size=(2, 9, 17, 2)).astype(np.float32)

    ours = np.asarray(grid_sample_nhwc(jnp.asarray(img), jnp.asarray(grid)))
    ref = _torch_grid_sample(img, grid)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_identity_grid_reproduces_image():
    rng = np.random.default_rng(0)
    h, w = 16, 24
    img = rng.standard_normal((1, h, w, 2), dtype=np.float32)
    # align_corners=False identity: g = (2*u + 1)/S - 1 for pixel centers u.
    xs = (2 * np.arange(w) + 1) / w - 1
    ys = (2 * np.arange(h) + 1) / h - 1
    gx, gy = np.meshgrid(xs, ys)
    grid = np.stack([gx, gy], axis=-1).astype(np.float32)[None]

    out = np.asarray(grid_sample_nhwc(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


def test_out_of_bounds_is_zero():
    img = np.ones((1, 8, 8, 1), dtype=np.float32)
    grid = np.full((1, 4, 4, 2), -1.9, dtype=np.float32)
    out = np.asarray(grid_sample_nhwc(jnp.asarray(img), jnp.asarray(grid)))
    ref = _torch_grid_sample(img, grid)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert np.all(out == 0)


def test_boundary_partial_weights_match_torch():
    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 10, 10, 1), dtype=np.float32)
    # Coordinates straddling the image border exercise the per-tap zero mask.
    grid = rng.uniform(-1.05, -0.95, size=(1, 6, 6, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_nhwc(jnp.asarray(img), jnp.asarray(grid)))
    ref = _torch_grid_sample(img, grid)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
