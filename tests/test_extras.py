"""Tests for auxiliary utilities and the residual image op."""

import jax
import jax.numpy as jnp
import numpy as np

from monorec_tpu.ops.residual_image import residual_image
from monorec_tpu.utils import dilate_mask, pose_distance_thresh


def test_pose_distance_thresh():
    kp = jnp.tile(jnp.eye(4), (2, 1, 1))
    fp = jnp.tile(jnp.eye(4), (2, 2, 1, 1))
    fp = fp.at[0, 0, 0, 3].set(1.0)  # sample 0 moves 1 m; sample 1 static
    flags = np.asarray(pose_distance_thresh(kp, fp, spatial_thresh=0.6))
    assert flags.tolist() == [True, False]


def test_dilate_mask():
    m = np.zeros((1, 9, 9, 1), np.float32)
    m[0, 4, 4, 0] = 1.0
    out = np.asarray(dilate_mask(jnp.asarray(m), size=3))[0, :, :, 0]
    assert out.sum() == 9  # 3x3 box around the center
    assert out[4, 4] and out[3, 3] and not out[1, 1]


def test_residual_image_zero_for_static_identical_frames():
    """If the source frame equals the keyframe with identity motion, the
    residual must be small wherever the reprojection is valid. (Not exactly
    zero: the reference's coordinate convention — normalize by W-1, sample
    align_corners=False — skews identity warps by up to half a pixel, so a
    smooth texture is required.)"""
    h, w = 16, 32
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack(
        [0.3 * np.sin(xs / 7 + c) * np.cos(ys / 5 + c) for c in range(3)],
        axis=-1,
    ).astype(np.float32)[None]
    k = np.zeros((4, 4), np.float32)
    k[0, 0] = k[1, 1] = 20.0
    k[0, 2], k[1, 2] = w / 2 - 0.5, h / 2 - 0.5
    k[2, 2] = k[3, 3] = 1

    data = {
        "keyframe": jnp.asarray(img),
        "keyframe_pose": jnp.tile(jnp.eye(4), (1, 1, 1)),
        "keyframe_intrinsics": jnp.asarray(k[None]),
        "frames": jnp.asarray(img[:, None]),
        "poses": jnp.tile(jnp.eye(4), (1, 1, 1, 1)),
        "intrinsics": jnp.asarray(k[None, None]),
    }
    inv_depth = jnp.full((1, h, w, 1), 0.1)
    res = np.asarray(residual_image(data, inv_depth))
    interior = res[0, 2:-2, 2:-2, 0]
    assert interior.max() < 0.02
