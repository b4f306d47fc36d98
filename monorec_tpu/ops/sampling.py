"""Bilinear image sampling with torch ``grid_sample`` semantics.

Replicates ``F.grid_sample(..., mode='bilinear', padding_mode='zeros',
align_corners=False)`` — the exact flavor used throughout the reference
(``monorec_model.py:215-218``, ``common_losses.py:52-54``) — as a pure-JAX
gather so the plane-sweep warp can be jitted/vmapped and later swapped for a
fused Pallas kernel.

Coordinate convention (align_corners=False): a normalized coordinate g in
[-1, 1] maps to the continuous pixel coordinate ``((g + 1) * S - 1) / 2``
where S is the extent along that axis. Out-of-bounds taps contribute zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _unnormalize(coord: Array, size: int) -> Array:
    return ((coord + 1.0) * size - 1.0) / 2.0


def bilinear_sample(image: Array, grid: Array) -> Array:
    """Sample a single image at normalized grid locations.

    Args:
      image: (H, W, C) source image.
      grid: (..., 2) normalized coordinates, last axis = (x, y) in [-1, 1].

    Returns:
      (..., C) bilinearly interpolated samples; zero for out-of-bounds taps.
    """
    h, w, c = image.shape
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = image.reshape(h * w, c)

    def tap(xi: Array, yi: Array, wgt: Array) -> Array:
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jnp.take(flat, yi_c * w + xi_c, axis=0)
        return vals * (wgt * inside.astype(image.dtype))[..., None]

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    return out


def grid_sample_nhwc(images: Array, grids: Array) -> Array:
    """Batched sampler: images (N, H, W, C), grids (N, Ho, Wo, 2) -> (N, Ho, Wo, C)."""
    return jax.vmap(bilinear_sample)(images, grids)
