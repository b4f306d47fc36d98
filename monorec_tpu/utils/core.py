"""Small shared utilities (masked reductions, ROI/depth helpers, faders).

JAX analogs of the reference ``utils/util.py`` helpers, written for
functional code: no in-place mutation; masks select rather than assign.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

Array = jax.Array


def mask_mean(t: Array, invalid: Array, axis=None) -> Array:
    """Mean of ``t`` over entries where ``invalid`` is False.

    Matches reference ``mask_mean`` (``utils/util.py:110-118``): the
    denominator is (element count - #invalid), so an all-invalid reduction
    yields division by zero -> nan, which callers guard exactly like the
    reference does.
    """
    invalid = jnp.broadcast_to(invalid, t.shape)
    t = jnp.where(invalid, 0.0, t)
    if axis is None:
        total = t.size
        return jnp.sum(t) / (total - jnp.sum(invalid.astype(jnp.float32)))
    total = 1
    for a in axis if isinstance(axis, (tuple, list)) else (axis,):
        total *= t.shape[a]
    return jnp.sum(t, axis=axis) / (
        total - jnp.sum(invalid.astype(jnp.float32), axis=axis)
    )


def masked_where(invalid: Array, t: Array, fill: float = 0.0) -> Array:
    return jnp.where(jnp.broadcast_to(invalid, t.shape), fill, t)


def nan_to_zero(t: Array) -> Array:
    return jnp.where(jnp.isnan(t) | jnp.isinf(t), 0.0, t)


def preprocess_roi(pred, gt: Array, roi: Optional[Sequence[int]]):
    """Crop (NHWC) prediction(s) and GT to a region of interest [t, b, l, r]."""
    if roi is None:
        return pred, gt
    t, b, l, r = roi

    def crop(x):
        return x[:, t:b, l:r, :]

    if isinstance(pred, list):
        return [crop(p) for p in pred], crop(gt)
    return crop(pred), crop(gt)


def get_positive_depth(pred, gt: Array):
    if isinstance(pred, list):
        pred = [jax.nn.relu(p) for p in pred]
    else:
        pred = jax.nn.relu(pred)
    return pred, jax.nn.relu(gt)


def get_absolute_depth(pred, gt: Array, max_distance: Optional[float] = None):
    """Inverse depth -> metric depth with optional far clamp."""
    if max_distance is not None:
        clamp = 1.0 / max_distance
        if isinstance(pred, list):
            pred = [jnp.maximum(p, clamp) for p in pred]
        else:
            pred = jnp.maximum(pred, clamp)
        gt = jnp.maximum(gt, clamp)
    if isinstance(pred, list):
        return [1.0 / p for p in pred], 1.0 / gt
    return 1.0 / pred, 1.0 / gt


def get_mask(
    pred: Array, gt: Array, max_distance: Optional[float] = None, pred_all_valid: bool = True
) -> Array:
    """Invalid-pixel mask for sparse metrics (gt==0, too-far gt, opt. pred==0)."""
    mask = gt == 0
    if max_distance:
        mask = mask | (gt < 1.0 / max_distance)
    if not pred_all_valid:
        mask = mask | (pred == 0)
    return mask


def median_scaling(result: Array, target: Array) -> Array:
    """Scale predictions by median(gt)/median(pred) over valid gt pixels.

    Per-sample, matching reference ``median_scaling`` (``utils/util.py:
    135-142``). Uses masked medians computed via sorting with invalid pixels
    pushed to +inf and an index into the valid prefix.
    """

    def one(res, tgt):
        valid = tgt > 0
        n_valid = jnp.sum(valid)

        def masked_median(x):
            flat = jnp.where(valid.reshape(-1), x.reshape(-1), jnp.inf)
            s = jnp.sort(flat)
            lo = jnp.maximum((n_valid - 1) // 2, 0)
            hi = n_valid // 2
            return (s[lo] + s[hi]) / 2.0

        ratio = masked_median(tgt) / masked_median(res)
        return res * ratio

    return jax.vmap(one)(result, target)


class ValueFader:
    """Piecewise-linear schedule over epochs (reference ``ValueFader``)."""

    def __init__(self, steps: List[float], values: List[float]):
        self.steps = steps
        self.values = values

    def get_value(self, epoch: float) -> float:
        if epoch >= self.steps[-1]:
            return self.values[-1]
        i = 0
        while i < len(self.steps) - 1 and epoch >= self.steps[i + 1]:
            i += 1
        p = (epoch - self.steps[i]) / float(self.steps[i + 1] - self.steps[i])
        return (1 - p) * self.values[i] + p * self.values[i + 1]


class Timer:
    def __init__(self):
        self._t = time.monotonic()

    def check(self) -> float:
        now = time.monotonic()
        dt = now - self._t
        self._t = now
        return dt

    def reset(self):
        self._t = time.monotonic()


def operator_on_dict(d0: Dict, d1: Dict, op, default=0):
    keys = set(d0) | set(d1)
    return {k: op(d0.get(k, default), d1.get(k, default)) for k in keys}


def pose_distance_thresh(
    keyframe_pose: Array,
    frame_poses: Array,
    spatial_thresh: float = 0.6,
    rotational_thresh: float = 0.05,
) -> Array:
    """Per-sample flag: does the temporal window span enough motion?

    Reference ``pose_distance_thresh`` (``utils/util.py:217-222``): spatial
    expanse of the camera centers plus expanse of the forward directions.

    Args:
      keyframe_pose: (B, 4, 4); frame_poses: (B, F, 4, 4).
    Returns:
      (B,) bool.
    """
    poses = jnp.concatenate([keyframe_pose[:, None], frame_poses], axis=1)
    centers = poses[..., :3, 3]
    spatial = jnp.linalg.norm(
        jnp.max(centers, axis=1) - jnp.min(centers, axis=1), axis=-1
    )
    fwd = poses[..., :3, 2]  # R @ [0,0,1]
    rotational = jnp.linalg.norm(
        jnp.max(fwd, axis=1) - jnp.min(fwd, axis=1), axis=-1
    )
    return (spatial > spatial_thresh) | (rotational > rotational_thresh)


def dilate_mask(mask: Array, size: int = 15) -> Array:
    """Binary dilation of an NHWC mask with a size x size box (reference
    ``dilate_mask``, ``utils/util.py:225-228``)."""
    binary = (mask >= 0.5).astype(jnp.float32)
    pad = size // 2
    counts = jax.lax.reduce_window(
        jnp.pad(binary, ((0, 0), (pad, size - 1 - pad), (pad, size - 1 - pad), (0, 0))),
        0.0,
        jax.lax.add,
        (1, size, size, 1),
        (1, 1, 1, 1),
        "VALID",
    )
    return counts > 0


def save_frame_for_tsdf(
    dir_path, index, keyframe, inv_depth, pose,
    crop=None, min_distance=None, max_distance=None,
):
    """Export one frame in the color/depth/pose layout TSDF-fusion tools
    expect (reference ``save_frame_for_tsdf``, ``utils/util.py:78-91``).

    keyframe: (H, W, 3) in [-0.5, 0.5]; inv_depth: (H, W); pose cam-to-world.
    """
    import numpy as np
    from pathlib import Path
    from PIL import Image

    dir_path = Path(dir_path)
    keyframe = np.asarray(keyframe)
    inv_depth = np.asarray(inv_depth)
    pose = np.asarray(pose)
    if crop is not None:
        t, b, l, r = crop
        keyframe = keyframe[t:b, l:r]
        inv_depth = inv_depth[t:b, l:r]
    rgb = ((keyframe + 0.5) * 255).clip(0, 255).astype(np.uint8)
    with np.errstate(divide="ignore"):
        depth_cm = np.where(inv_depth > 0, 100.0 / inv_depth, 0.0)
    depth_cm = np.where(depth_cm < 0, 0, depth_cm)
    if min_distance is not None:
        depth_cm = np.where(depth_cm < min_distance * 100, 0, depth_cm)
    if max_distance is not None:
        depth_cm = np.where(depth_cm > max_distance * 100, 0, depth_cm)
    Image.fromarray(rgb).save(dir_path / f"frame-{index:06d}.color.jpg")
    Image.fromarray(depth_cm.astype(np.int32), mode="I").save(
        dir_path / f"frame-{index:06d}.depth.png"
    )
    np.savetxt(dir_path / f"frame-{index:06d}.pose.txt", np.linalg.inv(pose))


def save_intrinsics_for_tsdf(dir_path, intrinsics, crop=None):
    """Reference ``save_intrinsics_for_tsdf`` (``utils/util.py:94-98``)."""
    import numpy as np
    from pathlib import Path

    k = np.asarray(intrinsics).copy()
    if crop is not None:
        k[0, 2] -= crop[2]
        k[1, 2] -= crop[0]
    np.savetxt(Path(dir_path) / "camera-intrinsics.txt", k[:3, :3])
