"""Residual image: min-over-frames SSIM error of depth-warped reprojections.

Counterpart of the reference ``ResidualImageModule`` (``model/layers.py:
161-217``): warp every source frame onto the keyframe using the predicted
depth, score with SSIM, mark out-of-view pixels infinite, take the channel
mean and the minimum over frames, and zero pixels invisible in every frame.
Useful as a dynamic-object cue and for qualitative inspection.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from monorec_tpu.losses.common import _gather_frames, _warp_by_depth
from monorec_tpu.ops.ssim import ssim

Array = jax.Array


def residual_image(
    data: Dict,
    inv_depth: Array,  # (B, H, W, 1) predicted inverse depth
    use_mono: bool = True,
    use_stereo: bool = False,
) -> Array:
    """Returns (B, H, W, 1) residual image."""
    keyframe = data["keyframe"]
    b, h, w, c = keyframe.shape
    frames, poses, intrinsics = _gather_frames(data, use_mono, use_stereo)
    f = frames.shape[1]

    depth = 1.0 / inv_depth[..., 0]
    # Reference warps frame+1 and tests zero hits for the visibility mask.
    warped, _cov = _warp_by_depth(
        depth, frames, poses, intrinsics,
        data["keyframe_pose"], data["keyframe_intrinsics"], add=1.0,
    )  # (B, F, H, W, C)
    invalid = jnp.any(warped == 0, axis=-1)  # (B, F, H, W)
    warped = warped - 0.5

    key = jnp.broadcast_to((keyframe + 0.5)[:, None], warped.shape)
    flat = lambda x: x.reshape(b * f, h, w, c)
    res = ssim(flat(warped), flat(key)).reshape(b, f, h, w, c)
    res = jnp.where(invalid[..., None], jnp.inf, res)

    res = jnp.min(jnp.mean(res, axis=-1), axis=1)  # (B, H, W)
    all_invalid = jnp.all(invalid, axis=1)
    res = jnp.where(all_invalid, 0.0, res)
    return res[..., None]
