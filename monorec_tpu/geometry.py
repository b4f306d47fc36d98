"""Camera geometry primitives (pure JAX, static shapes).

Implements pinhole backprojection / projection with the exact coordinate
conventions of the reference implementation (see reference
``model/layers.py:43-71``): the projected pixel coordinates are normalized by
``(W - 1, H - 1)`` and mapped to ``[-1, 1]`` via ``(u - 0.5) * 2``, which is
then consumed by a bilinear sampler with ``align_corners=False`` semantics.

All functions are shape-polymorphic over leading batch dims via ``vmap`` but
keep image extents static so everything jits once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.lru_cache(maxsize=32)
def _cached_grid(height: int, width: int):
    # Cached as NUMPY on purpose: caching a jnp array created inside a jit
    # trace would leak a tracer into later traces.
    import numpy as np

    yy, xx = np.meshgrid(
        np.arange(height, dtype=np.float32),
        np.arange(width, dtype=np.float32),
        indexing="ij",
    )
    ones = np.ones_like(xx)
    return np.stack([xx, yy, ones], axis=0).reshape(3, height * width)


def pixel_grid(height: int, width: int) -> Array:
    """Homogeneous pixel grid, shape (3, H*W): rows are x, y, 1.

    Matches reference ``Backprojection.coord`` (``model/layers.py:49-54``).
    """
    return jnp.asarray(_cached_grid(height, width))


def invert_pose(pose: Array) -> Array:
    """Invert a 4x4 SE(3) cam-to-world pose (closed form, no linalg solve).

    The reference uses ``torch.inverse``; SE(3) closed form is numerically
    tighter and avoids a general LU solve on TPU.
    """
    r = pose[..., :3, :3]
    t = pose[..., :3, 3:]
    r_t = jnp.swapaxes(r, -1, -2)
    top = jnp.concatenate(
        [r_t, -jnp.matmul(r_t, t, precision=jax.lax.Precision.HIGHEST)], axis=-1
    )
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), pose.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_intrinsics(k: Array) -> Array:
    """Invert a 4x4 intrinsics matrix of the reference layout.

    K = [[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0], [0, 0, 0, 1]].
    """
    fx = k[..., 0, 0]
    fy = k[..., 1, 1]
    cx = k[..., 0, 2]
    cy = k[..., 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    inv = jnp.stack(
        [
            jnp.stack([1.0 / fx, zeros, -cx / fx, zeros], axis=-1),
            jnp.stack([zeros, 1.0 / fy, -cy / fy, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones, zeros], axis=-1),
            jnp.stack([zeros, zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return inv


def backproject(depths: Array, inv_k: Array, height: int, width: int) -> Array:
    """Backproject the pixel grid by a stack of depths.

    Args:
      depths: (D, H*W) or (D, H, W) depth per hypothesis per pixel (metric).
      inv_k: (4, 4) inverse intrinsics.
      height, width: image extents.

    Returns:
      (D, 4, H*W) homogeneous camera-frame points. Matches reference
      ``monorec_model.py:198-201``.
    """
    d = depths.reshape(depths.shape[0], 1, height * width)
    rays = jnp.matmul(
        inv_k[:3, :3], pixel_grid(height, width),
        precision=jax.lax.Precision.HIGHEST,
    )  # (3, H*W)
    pts = d * rays[None]  # (D, 3, H*W)
    ones = jnp.ones((depths.shape[0], 1, height * width), dtype=pts.dtype)
    return jnp.concatenate([pts, ones], axis=1)


def project(points: Array, k: Array, t: Array, height: int, width: int) -> Array:
    """Project homogeneous 3D points into normalized grid coordinates.

    Args:
      points: (..., 4, H*W) homogeneous points in the keyframe camera frame.
      k: (4, 4) target-camera intrinsics.
      t: (4, 4) keyframe-cam -> target-cam transform.
      height, width: target image extents.

    Returns:
      (..., H, W, 2) coordinates in [-1, 1] with the reference normalization
      ``u / (W-1); (u - .5) * 2`` (``model/layers.py:63-71``).
    """
    proj = jnp.matmul(k, t, precision=jax.lax.Precision.HIGHEST)[:3, :]  # (3, 4)
    cam = jnp.einsum(
        "ij,...jn->...in", proj, points, precision=jax.lax.Precision.HIGHEST
    )
    xy = cam[..., :2, :] / (cam[..., 2:3, :] + 1e-7)
    denom = jnp.array([width - 1, height - 1], dtype=xy.dtype).reshape(
        (1,) * (xy.ndim - 2) + (2, 1)
    )
    xy = (xy / denom - 0.5) * 2.0
    out = xy.reshape(xy.shape[:-2] + (2, height, width))
    return jnp.moveaxis(out, -3, -1)


def depth_hypotheses(
    inv_depth_max: Array, inv_depth_min: Array, steps: int, dtype=jnp.float32
) -> Array:
    """Plane-sweep depth hypotheses: 1 / linspace(inv_max, inv_min, D).

    Linear in inverse depth, ordered far -> near (reference
    ``monorec_model.py:184-185``).
    """
    inv = jnp.linspace(
        jnp.asarray(inv_depth_max, dtype=dtype), jnp.asarray(inv_depth_min, dtype=dtype), steps
    )
    return 1.0 / inv
