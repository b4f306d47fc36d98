"""SSIM photometric error (NHWC, pure JAX).

Behavior matches the reference ``SSIM`` layer (``model/layers.py:91-139``):
1-pixel pad (reflect or zeros), 3x3 window statistics (uniform average or the
fixed 3x3 Gaussian from ``GaussianAverage``), C1=0.01^2, C2=0.03^2, and two
clamp modes:
  * default:    clamp((1 - n/d) / 2, 0, 1)
  * comp_mode:  clamp( 1 - n/d,      0, 1) / 2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array

# Kept as a numpy constant so importing the module never touches a backend.
_GAUSS_3X3 = np.array(
    [
        [0.0947, 0.1183, 0.0947],
        [0.1183, 0.1478, 0.1183],
        [0.0947, 0.1183, 0.0947],
    ],
    dtype=np.float32,
)

_C1 = 0.01**2
_C2 = 0.03**2


def _pad(x: Array, reflect: bool) -> Array:
    mode = "reflect" if reflect else "constant"
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)


def _window_avg(x: Array, gaussian: bool) -> Array:
    """3x3 valid window average of a padded NHWC tensor."""
    if not gaussian:
        s = lax.reduce_window(
            x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
        )
        return s / 9.0
    c = x.shape[-1]
    kernel = jnp.tile(
        jnp.asarray(_GAUSS_3X3, dtype=x.dtype)[:, :, None, None], (1, 1, 1, c)
    )
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _ssim_from_stats(mu_x, mu_y, e_xx, e_yy, e_xy, comp_mode: bool) -> Array:
    mu_x_sq = mu_x * mu_x
    mu_y_sq = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = e_xx - mu_x_sq
    sigma_y = e_yy - mu_y_sq
    sigma_xy = e_xy - mu_xy
    n = (2.0 * mu_xy + _C1) * (2.0 * sigma_xy + _C2)
    d = (mu_x_sq + mu_y_sq + _C1) * (sigma_x + sigma_y + _C2)
    if not comp_mode:
        return jnp.clip((1.0 - n / d) / 2.0, 0.0, 1.0)
    return jnp.clip(1.0 - n / d, 0.0, 1.0) / 2.0


def ssim(
    x: Array,
    y: Array,
    pad_reflection: bool = True,
    gaussian_average: bool = False,
    comp_mode: bool = False,
) -> Array:
    """SSIM distance between NHWC image batches; output same NHWC shape."""
    xp = _pad(x, pad_reflection)
    yp = _pad(y, pad_reflection)
    return _ssim_from_stats(
        _window_avg(xp, gaussian_average),
        _window_avg(yp, gaussian_average),
        _window_avg(xp * xp, gaussian_average),
        _window_avg(yp * yp, gaussian_average),
        _window_avg(xp * yp, gaussian_average),
        comp_mode,
    )


def _window_avg_planar(xp: Array, gaussian: bool) -> Array:
    """3x3 valid window average over the last two dims of a padded array.

    Expressed as 9 shifted multiply-adds instead of a depthwise conv: with
    W in the minor (lane) dimension this fuses into one VPU stencil pass.
    The NHWC depthwise-conv formulation puts C in lanes — C=3 for images,
    so 3/128 lane occupancy; measured ~12 ms/step of the stage-1 loss.
    Same weights as ``_window_avg``; only the 9-term summation order
    differs (f32 reordering noise ~1e-7, far inside parity tolerances).
    """
    h = xp.shape[-2] - 2
    w = xp.shape[-1] - 2
    win = _GAUSS_3X3 if gaussian else np.full((3, 3), 1.0 / 9.0, np.float32)
    out = None
    for i in range(3):
        for j in range(3):
            t = float(win[i, j]) * xp[..., i : i + h, j : j + w]
            out = t if out is None else out + t
    return out


def ssim_planar(
    x: Array,
    y: Array,
    pad_reflection: bool = True,
    gaussian_average: bool = False,
    comp_mode: bool = False,
) -> Array:
    """SSIM distance over the last two (H, W) dims of planar (channels-
    first) tensors — numerically ``ssim`` with the window average evaluated
    as a 9-tap stencil. Any leading dims; output shape == input shape."""
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    mode = "reflect" if pad_reflection else "constant"
    xp = jnp.pad(x, pad, mode=mode)
    yp = jnp.pad(y, pad, mode=mode)
    return _ssim_from_stats(
        _window_avg_planar(xp, gaussian_average),
        _window_avg_planar(yp, gaussian_average),
        _window_avg_planar(xp * xp, gaussian_average),
        _window_avg_planar(yp * yp, gaussian_average),
        _window_avg_planar(xp * yp, gaussian_average),
        comp_mode,
    )
