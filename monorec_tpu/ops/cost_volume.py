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
    # "float32" (exact reference parity) or "bfloat16" (faster Pallas path:
    # images quantized to bf16 before warping; ~1e-3 relative CV error).
    warp_dtype: str = "float32"

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
        rel = jnp.matmul(
            geometry.invert_pose(pose), keyframe_pose,
            precision=jax.lax.Precision.HIGHEST,
        )
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


def plane_sweep_homographies(
    keyframe_intrinsics: Array,  # (B, 4, 4)
    keyframe_pose: Array,  # (B, 4, 4)
    frame_intrinsics: Array,  # (B, F, 4, 4)
    frame_poses: Array,  # (B, F, 4, 4)
    inv_depths: Array,  # (D,)
    height: int,
    width: int,
) -> Array:
    """Fold the full warp pipeline into per-(b, f, d) 3x3 homographies.

    Output pixel p=(x, y, 1) maps to homogeneous source coords s = M p with
    xs_pix = s0/s2, ys_pix = s1/s2 directly in align_corners=False pixel
    units — i.e. the reference's project -> normalize-by-(W-1,H-1) ->
    (u-.5)*2 -> grid_sample unnormalization composed into M. Entry (2,2) is
    normalized to 1 (the kernel's contract).
    """
    hi = jax.lax.Precision.HIGHEST  # 4x4 chains must not run in bf16 on TPU
    inv_k = geometry.invert_intrinsics(keyframe_intrinsics)[:, :3, :3]  # (B,3,3)
    rel = jax.vmap(
        lambda poses_f, kp: jax.vmap(
            lambda p: jnp.matmul(geometry.invert_pose(p), kp, precision=hi)
        )(poses_f)
    )(frame_poses, keyframe_pose)  # (B, F, 4, 4)
    kt = jnp.matmul(frame_intrinsics, rel, precision=hi)  # (B, F, 4, 4)
    a = jnp.einsum(
        "bfij,bjk->bfik", kt[:, :, :3, :3], inv_k, precision=hi
    )  # (B, F, 3, 3)
    t = kt[:, :, :3, 3]  # (B, F, 3)

    e3 = jnp.array([0.0, 0.0, 1.0], a.dtype)
    m = a[:, :, None] + inv_depths[None, None, :, None, None] * (
        t[:, :, None, :, None] * e3[None, None, None, None, :]
    )  # (B, F, D, 3, 3)

    # Fold normalization + align_corners=False unnormalization:
    # xs_pix = (s0/s2) * W/(W-1) - 0.5 (and likewise for y).
    sx = width / (width - 1)
    sy = height / (height - 1)
    row0 = sx * m[..., 0, :] - 0.5 * m[..., 2, :]
    row1 = sy * m[..., 1, :] - 0.5 * m[..., 2, :]
    row2 = m[..., 2, :]
    m = jnp.stack([row0, row1, row2], axis=-2)
    return m / m[..., 2:3, 2:3]


def _score_and_fuse(
    sad: Array,  # (B, F, D, H, W)
    valid: Array,  # (B, F, H, W)
    cfg: CostVolumeConfig,
) -> Tuple[Array, Array]:
    """Shared fusion math (reference :250-269) on D-major layouts.

    Returns fused (B, H, W, D) and per-frame CVs (B, F, H, W, D).
    """
    d_steps = sad.shape[2]
    sfcv = (1.0 - 2.0 * sad) * valid[:, :, None]

    sharp = jnp.exp(-cfg.alpha * (sad - jnp.min(sad, axis=2, keepdims=True)) ** 2)
    weight = 1.0 - (jnp.sum(sharp, axis=2) - 1.0) / (d_steps - 1)
    weight = weight * valid  # (B, F, H, W)

    weight_sum = jnp.sum(weight, axis=1)  # (B, H, W)
    fused = jnp.sum(sad * weight[:, :, None], axis=1)  # (B, D, H, W)
    nonzero = weight_sum > 0
    fused = jnp.where(
        nonzero[:, None], fused / jnp.where(nonzero, weight_sum, 1.0)[:, None], fused
    )
    if not cfg.not_center_cv:
        fused = 1.0 - 2.0 * fused
    fused = jnp.where(nonzero[:, None], fused, 0.0)

    return jnp.moveaxis(fused, 1, -1), jnp.moveaxis(sfcv, 2, -1)


def _plane_sweep_sad_grouped(
    keyframe: Array,
    keyframe_intrinsics: Array,
    keyframe_pose: Array,
    frames: Array,  # (B, F_total, H, W, C)
    frame_intrinsics: Array,
    frame_poses: Array,
    inv_depths: Array,  # (D,)
    cfg: CostVolumeConfig,
    groups: Tuple[int, ...],
    interpret: bool = False,
):
    """ONE fused-kernel sweep over all frames, fused per frame GROUP.

    The kernel scores each (frame, depth) independently, so frames destined
    for DIFFERENT cost volumes (e.g. the stage 2-4 protocol's temporal mono
    frames and the stereo frame — reference ``trainer/monorec_trainer.py:
    38-78`` runs them as two CostVolumeModule passes) can share one launch:
    ``groups`` partitions the frame axis, and the exp-sharpness fusion
    (reference ``monorec_model.py:250-269``) runs per group on slices of the
    kernel's SAD output. Numerically identical to one launch per group —
    per-frame SAD/validity never mix across groups.

    Returns ``[(fused, sfcv) per group]`` and combined coverage counts (B,).
    """
    from monorec_tpu.ops.pallas import plane_sweep_sad

    b, h, w, c = keyframe.shape
    f = frames.shape[1]
    assert sum(groups) == f, (groups, f)
    d_steps = inv_depths.shape[0]

    homs = plane_sweep_homographies(
        keyframe_intrinsics, keyframe_pose, frame_intrinsics, frame_poses,
        inv_depths, h, w,
    ).reshape(b * f, d_steps, 3, 3)

    images = jnp.moveaxis(frames.reshape(b * f, h, w, c), -1, 1)  # (N, C, H, W)
    keyframes = jnp.moveaxis(keyframe, -1, 1)  # (B, C, H, W)
    if cfg.warp_dtype == "bfloat16":
        images = images.astype(jnp.bfloat16)

    cw = tuple(float(x) / (cfg.patch_size**2) for x in cfg.channel_weights)
    sad, wmask, cov = plane_sweep_sad(
        images,
        keyframes,
        homs,
        border_radius=cfg.border_radius,
        frames_per_image=f,
        use_ssim=cfg.use_ssim,
        channel_weights=cw,
        interpret=interpret,
    )
    # sad/wmask: (N, D, H, W); cov: (N, D)

    bmask = border_mask(h, w, cfg.border_radius, keyframe.dtype)
    valid = bmask[None] * jnp.min(
        (wmask != 0).astype(keyframe.dtype), axis=1
    )  # (N, H, W)

    sad = sad.reshape(b, f, d_steps, h, w)
    valid = valid.reshape(b, f, h, w)
    outs = []
    f0 = 0
    for fg in groups:
        outs.append(
            _score_and_fuse(sad[:, f0 : f0 + fg], valid[:, f0 : f0 + fg], cfg)
        )
        f0 += fg
    return outs, jnp.sum(cov.reshape(b, f * d_steps), axis=-1)


def _compute_cost_volume_pallas(
    keyframe: Array,
    keyframe_intrinsics: Array,
    keyframe_pose: Array,
    frames: Array,
    frame_intrinsics: Array,
    frame_poses: Array,
    inv_depths: Array,  # (D,)
    cfg: CostVolumeConfig,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Cost volume via the fully fused Pallas kernel (TPU fast path).

    The kernel computes warp + SSIM + channel-weighted patch-SAD in one pass
    (the warped stack never reaches HBM); only ``_score_and_fuse`` runs in
    XLA. Returns fused CV, per-frame CVs and the per-sample uncovered-pixel
    counts from the kernel's coverage counter.
    """
    f = frames.shape[1]
    outs, cov = _plane_sweep_sad_grouped(
        keyframe, keyframe_intrinsics, keyframe_pose, frames,
        frame_intrinsics, frame_poses, inv_depths, cfg, (f,), interpret,
    )
    fused, sfcv = outs[0]
    return fused, sfcv, cov


def _compute_cost_volume_pallas_warp(
    keyframe: Array,
    keyframe_intrinsics: Array,
    keyframe_pose: Array,
    frames: Array,
    frame_intrinsics: Array,
    frame_poses: Array,
    inv_depths: Array,  # (D,)
    cfg: CostVolumeConfig,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Cost volume via the warp-only Pallas kernel + XLA scoring epilogue.

    Slower than the fused path (materializes the warped stack) but supports
    ``sfcv_mult_mask=False``, which needs the raw warped values.
    """
    from monorec_tpu.ops.pallas import warp_plane_sweep

    b, h, w, c = keyframe.shape
    f = frames.shape[1]
    d_steps = inv_depths.shape[0]

    homs = plane_sweep_homographies(
        keyframe_intrinsics, keyframe_pose, frame_intrinsics, frame_poses,
        inv_depths, h, w,
    ).reshape(b * f, d_steps, 3, 3)

    images = jnp.moveaxis(frames.reshape(b * f, h, w, c), -1, 1)  # (N, C, H, W)
    if cfg.warp_dtype == "bfloat16":
        images = images.astype(jnp.bfloat16)
    warped, wmask, cov = warp_plane_sweep(
        images, homs, border_radius=cfg.border_radius, interpret=interpret
    )
    warped = warped.astype(keyframe.dtype)
    # warped: (N, D, C, H, W); wmask: (N, D, H, W)

    bmask = border_mask(h, w, cfg.border_radius, keyframe.dtype)
    valid = bmask[None] * jnp.min(
        (wmask != 0).astype(keyframe.dtype), axis=1
    )  # (N, H, W)

    key = jnp.moveaxis(keyframe, -1, 1)  # (B, C, H, W)
    key_b = jnp.broadcast_to(
        key[:, None, None], (b, f, d_steps, c, h, w)
    ).reshape(b * f * d_steps * c, h, w, 1)
    warped_flat = warped.reshape(b * f * d_steps * c, h, w, 1)

    if cfg.use_ssim == 1:
        diff = ssim(warped_flat + 0.5, key_b + 0.5)
    elif cfg.use_ssim == 2:
        diff = 0.85 * ssim(warped_flat + 0.5, key_b + 0.5) + 0.15 * jnp.abs(
            warped_flat - key_b
        )
    elif cfg.use_ssim == 0:
        diff = jnp.abs(warped_flat - key_b)
    else:
        l1 = jnp.abs(warped_flat - key_b)
        diff = (
            jax.lax.reduce_window(
                jnp.pad(l1, ((0, 0), (1, 1), (1, 1), (0, 0))),
                0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID",
            )
            / 9.0
        )

    diff = diff.reshape(b * f * d_steps, c, h, w)
    cw = jnp.asarray(cfg.channel_weights, dtype=keyframe.dtype) / (cfg.patch_size**2)
    weighted = jnp.einsum("nchw,c->nhw", diff, cw)
    sad = _box_sum_3x3(weighted).reshape(b, f, d_steps, h, w)

    cov_b = jnp.sum(cov.reshape(b, f * d_steps), axis=-1)
    if not cfg.sfcv_mult_mask:
        warped_b = warped.reshape(b, f, d_steps, c, h, w)
        any_nonzero = jnp.any(warped_b != 0, axis=3)
        all_equal = jnp.all(warped_b == key[:, None, None], axis=3)
        alt_valid = (any_nonzero | all_equal).astype(sad.dtype)
        sfcv = (1.0 - 2.0 * sad) * alt_valid
        fused_nhwd, _ = _score_and_fuse(sad, valid.reshape(b, f, h, w), cfg)
        return fused_nhwd, jnp.moveaxis(sfcv, 2, -1), cov_b

    fused_nhwd, sfcv_nhwd = _score_and_fuse(sad, valid.reshape(b, f, h, w), cfg)
    return fused_nhwd, sfcv_nhwd, cov_b


def _kernel_shapes_ok(keyframe: Array, cfg: CostVolumeConfig, cv_depths) -> bool:
    """Shape/feature gate shared by the "auto" backend choice (both Pallas
    paths) — ONE definition so the joint-pair path can never disagree with
    ``compute_cost_volume`` about kernel eligibility."""
    b, height, width, channels = keyframe.shape
    return cv_depths is None and height % 16 == 0 and width % 128 == 0


def _fused_path_ok(keyframe: Array, cfg: CostVolumeConfig) -> bool:
    """Gate for the fully fused SAD kernel (vs the warp-only kernel)."""
    channels = keyframe.shape[-1]
    return (
        cfg.sfcv_mult_mask
        and cfg.patch_size == 3
        and channels == len(cfg.channel_weights)
    )


def _fused_kernel_eligible(
    keyframe: Array, cfg: CostVolumeConfig, cv_depths, interpret: bool
) -> bool:
    """True when the fully fused Pallas SAD kernel can serve this sweep."""
    on_tpu = interpret or jax.default_backend() not in ("cpu", "gpu")
    return (
        on_tpu
        and _kernel_shapes_ok(keyframe, cfg, cv_depths)
        and _fused_path_ok(keyframe, cfg)
    )


def compute_cost_volume_pair(
    keyframe: Array,
    keyframe_intrinsics: Array,
    keyframe_pose: Array,
    mono_frames: Array,  # (B, F, H, W, C)
    mono_intrinsics: Array,
    mono_poses: Array,
    stereo_frame: Array,  # (B, H, W, C)
    stereo_intrinsics: Array,
    stereo_pose: Array,
    inv_depth_max: Array,
    inv_depth_min: Array,
    cfg: CostVolumeConfig = CostVolumeConfig(),
    cv_depths: Optional[Array] = None,
    backend: str = "auto",
    interpret: bool = False,
):
    """Mono AND stereo cost volumes for one keyframe in ONE kernel launch.

    The stage 2-4 training protocol needs both a temporal-frame CV and a
    stereo-frame CV of the same keyframe (reference
    ``trainer/monorec_trainer.py:38-78`` — two sequential CostVolumeModule
    passes). The stereo frame is just one more source frame of the same
    keyframe, so on the fused-kernel path both sweeps share one F+1-frame
    launch (one grid, one set of keyframe window stats per block) and the
    frame-fusion runs per group. Numerically identical to two separate
    ``compute_cost_volume`` calls (per-frame SAD/validity never mix across
    groups); on non-kernel backends this simply makes the two calls.

    Returns ``(mono_fused, mono_sfcv, stereo_fused, stereo_sfcv, coverage)``
    with coverage summed over ALL frames (mono + stereo), all under
    ``stop_gradient`` (reference computes CVs under ``no_grad``,
    ``monorec_model.py:679``).
    """
    f = mono_frames.shape[1]
    use_joint = backend in ("pallas", "auto") and _fused_kernel_eligible(
        keyframe, cfg, cv_depths, interpret
    )
    if not use_joint:
        mono_fused, mono_sfcv, cov_m = compute_cost_volume(
            keyframe, keyframe_intrinsics, keyframe_pose,
            mono_frames, mono_intrinsics, mono_poses,
            inv_depth_max, inv_depth_min, cfg, cv_depths=cv_depths,
            backend=backend, interpret=interpret, return_coverage=True,
        )
        st_fused, st_sfcv, cov_s = compute_cost_volume(
            keyframe, keyframe_intrinsics, keyframe_pose,
            stereo_frame[:, None], stereo_intrinsics[:, None],
            stereo_pose[:, None],
            inv_depth_max, inv_depth_min, cfg, cv_depths=cv_depths,
            backend=backend, interpret=interpret, return_coverage=True,
        )
        return mono_fused, mono_sfcv, st_fused, st_sfcv, cov_m + cov_s

    frames = jnp.concatenate([mono_frames, stereo_frame[:, None]], axis=1)
    intr = jnp.concatenate([mono_intrinsics, stereo_intrinsics[:, None]], axis=1)
    poses = jnp.concatenate([mono_poses, stereo_pose[:, None]], axis=1)
    inv_depths = jnp.linspace(
        jnp.asarray(inv_depth_max, keyframe.dtype),
        jnp.asarray(inv_depth_min, keyframe.dtype),
        cfg.depth_steps,
    )
    outs, cov = _plane_sweep_sad_grouped(
        keyframe, keyframe_intrinsics, keyframe_pose, frames, intr, poses,
        inv_depths, cfg, (f, 1), interpret,
    )
    (mono_fused, mono_sfcv), (st_fused, st_sfcv) = outs
    sg = jax.lax.stop_gradient
    return sg(mono_fused), sg(mono_sfcv), sg(st_fused), sg(st_sfcv), sg(cov)


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
    backend: str = "auto",
    interpret: bool = False,
    return_coverage: bool = False,
):
    """Batched plane-sweep cost volume.

    Args:
      keyframe: (B, H, W, C) in [-0.5, 0.5].
      keyframe_intrinsics / keyframe_pose: (B, 4, 4).
      frames: (B, F, H, W, C); frame_intrinsics / frame_poses: (B, F, 4, 4).
      inv_depth_max / inv_depth_min: scalars (shared over batch, as in the
        reference which reads element [0]).
      cv_depths: optional (B, D, H, W) per-pixel depth override.
      return_coverage: also return the Pallas kernel's per-sample
        uncovered-pixel counts (B,) — pixels whose warp source fell outside
        the kernel's tap window, silently degrading to "invalid
        reprojection". Always 0 for the XLA gather path (unlimited reach)
        and for rigid driving-scene motion on the kernel path; a nonzero
        value means the CV is degraded and should be surfaced.

    Returns:
      fused cost volume (B, H, W, D) and per-frame CVs (B, F, H, W, D),
      plus coverage counts if requested. The whole computation is wrapped
      in ``stop_gradient`` — the reference computes the CV under
      ``no_grad`` (``monorec_model.py:679``).
    """
    b, height, width, channels = keyframe.shape

    if backend == "auto":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        backend = (
            "pallas"
            if (on_tpu and _kernel_shapes_ok(keyframe, cfg, cv_depths))
            else "xla"
        )

    if backend == "pallas":
        inv_depths = jnp.linspace(
            jnp.asarray(inv_depth_max, keyframe.dtype),
            jnp.asarray(inv_depth_min, keyframe.dtype),
            cfg.depth_steps,
        )
        fused_path = _fused_path_ok(keyframe, cfg)
        impl = (
            _compute_cost_volume_pallas
            if fused_path
            else _compute_cost_volume_pallas_warp
        )
        fused, sfcv, cov = impl(
            keyframe, keyframe_intrinsics, keyframe_pose, frames,
            frame_intrinsics, frame_poses, inv_depths, cfg, interpret,
        )
        fused = jax.lax.stop_gradient(fused)
        sfcv = jax.lax.stop_gradient(sfcv)
        if return_coverage:
            return fused, sfcv, jax.lax.stop_gradient(cov)
        return fused, sfcv

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
    fused = jax.lax.stop_gradient(fused)
    sfcv = jax.lax.stop_gradient(sfcv)
    if return_coverage:
        return fused, sfcv, jnp.zeros((b,), jnp.float32)
    return fused, sfcv
