"""Plane-sweep photometric cost volume (XLA path).

Re-implements the reference ``CostVolumeModule``
(``model/monorec/monorec_model.py:132-284``) as a pure, jittable function:

  for every depth hypothesis d (linear in inverse depth, far -> near) and
  every source frame f, warp frame f onto the keyframe via the pinhole
  homography induced by d, score the match with SSIM (3x3 window) reduced by
  a channel-weighted 3x3 patch SAD, and fuse frames with an
  exp(-alpha * (sad - min_d sad)^2)-based sharpness weight.

Unlike the reference (python loops over batch and frames holding a
(D, C, H, W) intermediate), everything here is expressed with ``vmap`` over
(batch, frame) and static shapes so XLA can fuse the warp gather with the
window reductions. A fused Pallas kernel with the same contract lives in
``monorec_tpu.ops.pallas.cost_volume_kernel``.

Layout: images are NHWC; cost volumes are (..., H, W, D) with the depth
hypothesis in the channel (lane) dimension.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from monorec_tpu import geometry
from monorec_tpu.ops.sampling import bilinear_sample
from monorec_tpu.ops.ssim import ssim

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CostVolumeConfig:
    depth_steps: int = 32
    patch_size: int = 3
    channel_weights: Tuple[float, ...] = (5 / 32, 16 / 32, 11 / 32)
    alpha: float = 10.0
    # use_ssim: 1 -> SSIM, 2 -> 0.85*SSIM + 0.15*L1, 0 -> raw L1,
    # -1 -> 3x3-avg-pooled L1 (the reference's "else" branch).
    use_ssim: int = 1
    sfcv_mult_mask: bool = True
    not_center_cv: bool = False

    @property
    def border_radius(self) -> int:
        return self.patch_size // 2 + 1


def border_mask(height: int, width: int, border_radius: int, dtype=jnp.float32) -> Array:
    """(H, W) mask: 1 in the interior, 0 within border_radius of the edge."""
    y = jnp.arange(height)
    x = jnp.arange(width)
    my = (y >= border_radius) & (y < height - border_radius)
    mx = (x >= border_radius) & (x < width - border_radius)
    return (my[:, None] & mx[None, :]).astype(dtype)


def _box_sum_3x3(x: Array) -> Array:
    """Zero-padded 3x3 box sum over the trailing two spatial axes of (D, H, W)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    return jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, (1, 3, 3), (1, 1, 1), "VALID"
    )


def _photometric_difference(
    warped: Array, keyframe: Array, use_ssim: int
) -> Array:
    """Per-channel photometric error between warped stack (D,H,W,C) and keyframe (H,W,C)."""
    key = jnp.broadcast_to(keyframe[None], warped.shape)
    if use_ssim == 1:
        return ssim(warped + 0.5, key + 0.5)
    if use_ssim == 2:
        return 0.85 * ssim(warped + 0.5, key + 0.5) + 0.15 * jnp.abs(warped - key)
    if use_ssim == 0:
        return jnp.abs(warped - key)
    # avg-pooled L1 ("else" branch of the reference): 3x3 avg pool, zero pad.
    l1 = jnp.abs(warped - key)
    d, h, w, c = l1.shape
    pooled = jax.lax.reduce_window(
        jnp.pad(l1, ((0, 0), (1, 1), (1, 1), (0, 0))),
        0.0,
        jax.lax.add,
        (1, 3, 3, 1),
        (1, 1, 1, 1),
        "VALID",
    )
    return pooled / 9.0


def _cost_volume_single(
    keyframe: Array,
    keyframe_intrinsics: Array,
    keyframe_pose: Array,
    frames: Array,
    frame_intrinsics: Array,
    frame_poses: Array,
    depths: Array,
    cfg: CostVolumeConfig,
) -> Tuple[Array, Array]:
    """Cost volume for a single sample.

    Args:
      keyframe: (H, W, C) in [-0.5, 0.5].
      frames: (F, H, W, C).
      depths: (D, H, W) metric depth per hypothesis.

    Returns:
      fused (H, W, D) and per-frame (F, H, W, D) cost volumes.
    """
    height, width, channels = keyframe.shape
    d_steps = depths.shape[0]

    inv_k = geometry.invert_intrinsics(keyframe_intrinsics)
    cam_points = geometry.backproject(depths, inv_k, height, width)  # (D, 4, H*W)

    bmask = border_mask(height, width, cfg.border_radius, keyframe.dtype)
    cw = jnp.asarray(cfg.channel_weights, dtype=keyframe.dtype) / (cfg.patch_size**2)

    def per_frame(frame, k, pose):
        rel = geometry.invert_pose(pose) @ keyframe_pose
        coords = geometry.project(cam_points, k, rel, height, width)
        coords = jnp.clip(coords, -2.0, 2.0)

        warped = jax.vmap(lambda g: bilinear_sample(frame, g))(coords)  # (D,H,W,C)
        warped_b = jax.vmap(lambda g: bilinear_sample(bmask[..., None], g))(
            coords
        )[..., 0]  # (D,H,W)
        # A pixel is valid only if its reprojection hits the interior at ALL
        # depth hypotheses (reference ``monorec_model.py:219``).
        valid = bmask * jnp.min((warped_b != 0).astype(keyframe.dtype), axis=0)

        diff = _photometric_difference(warped, keyframe, cfg.use_ssim)
        weighted = jnp.einsum("dhwc,c->dhw", diff, cw)
        sad = _box_sum_3x3(weighted)  # (D, H, W)

        if cfg.sfcv_mult_mask:
            sfcv = (1.0 - 2.0 * sad) * valid[None]
        else:
            any_nonzero = jnp.any(warped != 0, axis=-1)
            all_equal = jnp.all(warped == keyframe[None], axis=-1)
            sfcv = (1.0 - 2.0 * sad) * (any_nonzero | all_equal).astype(sad.dtype)

        sharp = jnp.exp(
            -cfg.alpha * (sad - jnp.min(sad, axis=0, keepdims=True)) ** 2
        )
        weight = 1.0 - (jnp.sum(sharp, axis=0) - 1.0) / (d_steps - 1)
        weight = weight * valid  # (H, W)
        return sfcv, sad, weight

    sfcv, sad, weight = jax.vmap(per_frame)(frames, frame_intrinsics, frame_poses)
    # sfcv/sad: (F, D, H, W); weight: (F, H, W)

    weight_sum = jnp.sum(weight, axis=0)  # (H, W)
    fused = jnp.sum(sad * weight[:, None], axis=0)  # (D, H, W)
    nonzero = weight_sum > 0
    fused = jnp.where(nonzero[None], fused / jnp.where(nonzero, weight_sum, 1.0)[None], fused)
    if not cfg.not_center_cv:
        fused = 1.0 - 2.0 * fused
    fused = jnp.where(nonzero[None], fused, 0.0)

    return jnp.moveaxis(fused, 0, -1), jnp.moveaxis(sfcv, 1, -1)


def compute_cost_volume(
    keyframe: Array,
    keyframe_intrinsics: Array,
    keyframe_pose: Array,
    frames: Array,
    frame_intrinsics: Array,
    frame_poses: Array,
    inv_depth_max: Array,
    inv_depth_min: Array,
    cfg: CostVolumeConfig = CostVolumeConfig(),
    cv_depths: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Batched plane-sweep cost volume.

    Args:
      keyframe: (B, H, W, C) in [-0.5, 0.5].
      keyframe_intrinsics / keyframe_pose: (B, 4, 4).
      frames: (B, F, H, W, C); frame_intrinsics / frame_poses: (B, F, 4, 4).
      inv_depth_max / inv_depth_min: scalars (shared over batch, as in the
        reference which reads element [0]).
      cv_depths: optional (B, D, H, W) per-pixel depth override.

    Returns:
      fused cost volume (B, H, W, D) and per-frame CVs (B, F, H, W, D).
      The whole computation is wrapped in ``stop_gradient`` — the reference
      computes the CV under ``no_grad`` (``monorec_model.py:679``).
    """
    b, height, width, _ = keyframe.shape

    if cv_depths is None:
        d = geometry.depth_hypotheses(
            inv_depth_max, inv_depth_min, cfg.depth_steps, keyframe.dtype
        )
        depths = jnp.broadcast_to(
            d[None, :, None, None], (b, cfg.depth_steps, height, width)
        )
    else:
        depths = cv_depths

    fused, sfcv = jax.vmap(
        lambda kf, ki, kp, fr, fi, fp, dp: _cost_volume_single(
            kf, ki, kp, fr, fi, fp, dp, cfg
        )
    )(keyframe, keyframe_intrinsics, keyframe_pose, frames, frame_intrinsics, frame_poses, depths)
    return jax.lax.stop_gradient(fused), jax.lax.stop_gradient(sfcv)
