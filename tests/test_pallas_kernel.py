"""Pallas warp kernel tests (interpret mode on CPU; compiled parity runs on
TPU via tools/tpu_checks.py since tests are pinned to the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monorec_tpu.ops.pallas.warp_kernel import warp_plane_sweep


def _expected_shift(img, sx_, sy_):
    h, w = img.shape
    ys = np.arange(h)[:, None] + sy_
    xs = np.arange(w)[None, :] + sx_
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    fy, fx = ys - y0, xs - x0

    def at(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        return np.where(valid, img[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)], 0.0)

    return (
        (1 - fy) * (1 - fx) * at(y0, x0)
        + (1 - fy) * fx * at(y0, x0 + 1)
        + fy * (1 - fx) * at(y0 + 1, x0)
        + fy * fx * at(y0 + 1, x0 + 1)
    )


@pytest.mark.parametrize("shift", [(0.0, 0.0), (3.25, 0.0), (-2.5, 1.0), (17.0, -2.75)])
def test_known_shift_matches_bilinear(shift):
    h, w = 16, 128
    rng = np.random.default_rng(0)
    img = rng.uniform(-0.5, 0.5, (h, w)).astype(np.float32)
    m = np.eye(3, dtype=np.float32)
    m[0, 2], m[1, 2] = shift

    warped, wmask, cov = warp_plane_sweep(
        jnp.asarray(img[None, None]),
        jnp.asarray(m[None, None]),
        interpret=True,
    )
    expected = _expected_shift(img, *shift)
    np.testing.assert_allclose(
        np.asarray(warped[0, 0, 0]), expected, rtol=1e-4, atol=5e-5
    )
    assert float(cov[0, 0]) == 0.0


def test_border_mask_matches_indicator_warp():
    """The analytically-accumulated mask equals bilinear sampling of the
    border-interior indicator (reference create_mask + grid_sample)."""
    h, w, r = 16, 128, 2
    sx_, sy_ = 5.5, -1.25
    m = np.eye(3, dtype=np.float32)
    m[0, 2], m[1, 2] = sx_, sy_

    indicator = np.zeros((h, w), np.float32)
    indicator[r : h - r, r : w - r] = 1.0

    _, wmask, _ = warp_plane_sweep(
        jnp.asarray(np.ones((1, 1, h, w), np.float32)),
        jnp.asarray(m[None, None]),
        border_radius=r,
        interpret=True,
    )
    expected = _expected_shift(indicator, sx_, sy_)
    np.testing.assert_allclose(np.asarray(wmask[0, 0]), expected, atol=5e-5)
