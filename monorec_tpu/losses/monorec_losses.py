"""Stage losses for the MonoRec training curriculum.

JAX counterparts of ``model/loss_functions/monorec_loss.py``; every loss is a
pure function ``loss(data, alpha=None, roi=None, options=()) -> dict`` with a
``"loss"`` entry, where ``data`` merges the batch, the model outputs and
``"target"`` (inverse-depth GT, 0 = invalid). Numerical conventions the
curriculum depends on are kept exactly:

* GT clamped to [0, 100] in inverse-depth space; predictions floored at 0.
* Total = 2*alpha*4 * sum(sparse) + 2*(1-alpha) * sum(selfsup) (+ mask term).
* ``mask_loss``: class-balanced BCE with the fixed moving-pixel ratio
  0.008109558 (reference :57), plus acc/prec/rec/iou stats.
* refinement losses: mono/stereo supervision split by the predicted mask
  (:99-219, :283-378), with stereo predictions acting as detached pseudo-GT
  for dynamic pixels.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from monorec_tpu.losses.common import (
    compute_errors,
    edge_aware_smoothness_loss,
    identity_reprojection_errors,
    reprojection_loss,
    selfsup_loss,
    sparse_depth_loss,
    tile_batch_for_scales,
    upsample_nearest_to,
)
from monorec_tpu.utils import mask_mean

Array = jax.Array


def _clamped_gt(data: Dict) -> Array:
    gt = data["target"]
    return jnp.clip(gt, 0.0, 100.0)


def depth_loss(data: Dict, alpha=None, roi=None, options=()) -> Dict[str, Array]:
    """Stage-1 depth bootstrap loss (reference :9-47).

    All 4 scales are evaluated through ONE batched reprojection pass: the
    upsampled predictions are stacked along the batch axis (scale-major) so
    the warp kernel and the SSIM conv stack each run once per step instead
    of once per scale, and the scale-invariant automasking errors are
    computed once. Per-scale masked means are recovered by reshaping —
    numerically identical to the per-scale formulation.
    """
    use_stereo = "stereo" in options
    alpha = 0.5 if alpha is None else alpha
    gt = _clamped_gt(data)
    b, h, w = gt.shape[0:3]
    preds = [
        upsample_nearest_to(jnp.maximum(p, 0.0), h, w)
        for p in data["predicted_inverse_depths"]
    ]
    s = len(preds)

    loss_dict = {}
    sdl_sum = 0.0
    md2l_sum = 0.0
    for i, pred in enumerate(preds):
        sdl = sparse_depth_loss(pred, gt, l2=False)
        sdl_sum += sdl
        loss_dict[f"sdl_{i}"] = sdl

    stacked_pred = jnp.concatenate(preds, axis=0)  # (S*B, H, W, 1)
    tiled = tile_batch_for_scales(data, s)
    am = identity_reprojection_errors(data, use_mono=True, use_stereo=use_stereo)
    r_map, cov_sum = reprojection_loss(
        stacked_pred, tiled, automasking=True, use_mono=True,
        use_stereo=use_stereo, reduce=False, combine_frames="min",
        automask_errors=jnp.tile(am, (s, 1, 1, 1)), with_coverage=True,
    )
    invalid = jnp.isinf(r_map).reshape(s, b, h, w)
    r_map = jnp.where(jnp.isinf(r_map), 0.0, r_map).reshape(s, b, h, w)

    for i, pred in enumerate(preds):
        r = mask_mean(r_map[i], invalid[i])
        r = jnp.where(jnp.isnan(r), 0.0, r)
        sm = edge_aware_smoothness_loss(pred, data["keyframe"])
        sm = jnp.where(jnp.isnan(sm), 0.0, sm)
        md2l = r + sm * 1e-3 / (2**i)
        md2l_sum += md2l
        loss_dict[f"md2l_{i}"] = md2l

    loss_dict["loss"] = 2 * alpha * 4 * sdl_sum + 2 * (1 - alpha) * md2l_sum
    # Warp-kernel observability: in-image pixels the loss warps could not
    # reach (zeroed -> treated as invalid reprojections). 0 on the XLA path
    # and for typical motion; spikes indicate degraded supervision at
    # extreme depth edges.
    loss_dict["warp_uncovered"] = cov_sum
    return loss_dict


_MVG_RATIO = 0.008109558


def _mask_stats(cv_mask: Array, gt_mask: Array) -> Dict[str, Array]:
    gt_pred = gt_mask > 0.5
    cv_pred = cv_mask > 0.5
    axes = (1, 2, 3)
    inter = jnp.sum(cv_pred & gt_pred, axis=axes).astype(jnp.float32)
    union = jnp.sum(cv_pred | gt_pred, axis=axes).astype(jnp.float32)
    gt_sum = jnp.sum(gt_pred, axis=axes).astype(jnp.float32)
    cv_sum = jnp.sum(cv_pred, axis=axes).astype(jnp.float32)

    acc = jnp.mean((cv_pred == gt_pred).astype(jnp.float32))
    prec = jnp.where(cv_sum == 0, 1.0 - jnp.clip(inter, 0, 1), inter / jnp.maximum(cv_sum, 1))
    rec = jnp.where(gt_sum == 0, 1.0 - jnp.clip(inter, 0, 1), inter / jnp.maximum(gt_sum, 1))
    iou = jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1))
    return {
        "acc": acc,
        "prec": jnp.mean(prec),
        "rec": jnp.mean(rec),
        "iou": jnp.mean(iou),
    }


def mask_loss(data: Dict, alpha=None, roi=None, options=()) -> Dict[str, Array]:
    """Stage-2 mask bootstrap: class-balanced BCE + stats (reference :50-96)."""
    gt_mask = data["mvobj_mask"]
    cv_mask = data["cv_mask"]

    weight = jnp.where(gt_mask > 0, 1.0 / _MVG_RATIO, 1.0 / (1.0 - _MVG_RATIO))
    if "multiplicative_weight_mask" in data:
        weight = weight * data["multiplicative_weight_mask"]

    p = jnp.clip(cv_mask, 1e-12, 1.0 - 1e-12)
    g = gt_mask.astype(jnp.float32)
    # torch BCE clamps each log term at -100.
    bce = -(
        g * jnp.maximum(jnp.log(p), -100.0)
        + (1 - g) * jnp.maximum(jnp.log(1 - p), -100.0)
    )
    loss = jnp.mean(weight * bce)

    out = {"loss": loss}
    out.update(_mask_stats(cv_mask, gt_mask))
    return out


def mask_refinement_loss(data: Dict, alpha=None, roi=None, options=()) -> Dict[str, Array]:
    """Stage-3 mask refinement (reference :99-219).

    Like ``depth_loss``, all 4 scales of each reprojection branch run
    through ONE batched pass (scale-major stacking) — one warp-kernel
    program + one SSIM stack for the mono branch and one for the stereo
    branch per step, instead of one of each per scale. Per-scale values
    are recovered by reshaping; numerically identical.
    """
    alpha = 0.5 if alpha is None else alpha
    gt = _clamped_gt(data)
    b, h, w = gt.shape[0:3]
    cv_mask = data["cv_mask"]
    gt_mask = data["mvobj_mask"] > 0.5
    inv_depth_min = data["inv_depth_min"]
    inv_depth_max = data["inv_depth_max"]
    inv_depth_range = inv_depth_min - inv_depth_max

    loss_dict: Dict[str, Array] = {}
    loss_dict.update(_mask_stats(cv_mask, data["mvobj_mask"]))

    sdl_sum = 0.0
    md2l_sum = 0.0
    mask_loss_value = 0.0

    mono_preds = [upsample_nearest_to(p, h, w) for p in data["mono_pred"]]
    stereo_preds = [upsample_nearest_to(p, h, w) for p in data["stereo_pred"]]
    s = len(mono_preds)
    tiled = tile_batch_for_scales(data, s)
    mono_repr_all, cov_m = reprojection_loss(
        jnp.concatenate(mono_preds, axis=0), tiled,
        use_mono=True, use_stereo=False,
        automasking=False, reduce=False, combine_frames="min",
        with_coverage=True,
    )
    mono_repr_all = mono_repr_all.reshape(s, b, h, w, 1)
    stereo_repr_all, cov_s = reprojection_loss(
        jnp.concatenate(stereo_preds, axis=0), tiled,
        use_mono=False, use_stereo=True,
        automasking=False, reduce=False, combine_frames="min", border=3,
        with_coverage=True,
    )
    stereo_repr_all = stereo_repr_all.reshape(s, b, h, w, 1)
    cov_sum = cov_m + cov_s

    for scale, (mono_pred, stereo_pred) in enumerate(
        zip(mono_preds, stereo_preds)
    ):
        mono_sdl, mono_inv = sparse_depth_loss(mono_pred, gt, reduce=False)
        stereo_sdl, stereo_inv = sparse_depth_loss(stereo_pred, gt, reduce=False)

        sdl = mask_mean(mono_sdl * (1 - cv_mask), mono_inv) + mask_mean(
            stereo_sdl * cv_mask, stereo_inv
        )
        sdl_sum += sdl
        loss_dict[f"sdl_{scale}"] = sdl

        if "dist_diff_loss" in options:
            b_box = 16 // (2**scale)
            mono_thresh = jax.lax.stop_gradient(mono_pred) < (
                inv_depth_range / 32 * 2 + inv_depth_max
            )
            dd = (mono_thresh & gt_mask).astype(jnp.float32)
            # (b+1)x(b+1) box count >= (b+1)^2/4 -> dilated majority vote.
            box = jax.lax.reduce_window(
                jnp.pad(dd, ((0, 0), (b_box // 2, b_box - b_box // 2),
                             (b_box // 2, b_box - b_box // 2), (0, 0))),
                0.0, jax.lax.add, (1, b_box + 1, b_box + 1, 1), (1, 1, 1, 1),
                "VALID",
            )
            dd_mask = box >= ((b_box + 1) ** 2) / 4
            crop = lambda t: t[:, b_box * 4 : -b_box, b_box : -b_box, :]
            dd_c = crop(dd_mask)
            logp = -jnp.log(jnp.clip(crop(cv_mask), 1e-12, 1.0))
            dist_diff = jnp.sum(jnp.where(dd_c, logp, 0.0)) / jnp.maximum(
                jnp.sum(dd_c.astype(jnp.float32)), 1.0
            ) * (2.0**-3)
            loss_dict[f"dist_diff_{scale}"] = dist_diff
            mask_loss_value += dist_diff
            data = dict(data)
            data["multiplicative_weight_mask"] = jnp.where(
                mono_thresh & ~gt_mask, 1e-3, 1.0
            )

        mono_sm = edge_aware_smoothness_loss(mono_pred, data["keyframe"], reduce=False)
        stereo_sm = edge_aware_smoothness_loss(stereo_pred, data["keyframe"], reduce=False)
        smoothness = jnp.mean(mono_sm * (1 - cv_mask) + stereo_sm * cv_mask)

        mono_repr = mono_repr_all[scale]
        stereo_repr = stereo_repr_all[scale]

        mono_inf = jnp.isinf(mono_repr)
        stereo_inf = jnp.isinf(stereo_repr)
        mono_repr = jnp.where(mono_inf, 0.0, mono_repr)
        stereo_repr = jnp.where(stereo_inf, 0.0, stereo_repr)

        loss_dict[f"static_md2l_{scale}"] = mask_mean(mono_repr, mono_inf)
        loss_dict[f"dynamic_md2l_{scale}"] = mask_mean(stereo_repr, stereo_inf)

        mono_repr = mono_repr * jnp.maximum(1 - cv_mask, stereo_inf.astype(jnp.float32))
        stereo_repr = stereo_repr * jnp.maximum(cv_mask, mono_inf.astype(jnp.float32))

        repr_l = mask_mean(mono_repr + stereo_repr, mono_inf & stereo_inf)
        md2l = repr_l + smoothness * 1e-3 / (2**scale)
        loss_dict[f"md2l_{scale}"] = md2l
        md2l_sum += md2l

    if "mask_loss" in options:
        ml = mask_loss(data)
        mask_loss_value = ml.pop("loss")
        loss_dict.update(ml)
        loss_dict["mask_loss"] = mask_loss_value * 4

    loss_dict["loss"] = (
        2 * alpha * 4 * sdl_sum + 2 * (1 - alpha) * md2l_sum + mask_loss_value
    )
    loss_dict["warp_uncovered"] = cov_sum
    return loss_dict


def depth_refinement_loss(data: Dict, alpha=None, roi=None, options=()) -> Dict[str, Array]:
    """Stage-4 depth refinement (reference :283-378).

    Static pixels are supervised by sparse GT + mono reprojection; dynamic
    pixels (mask > .5) by the detached stereo prediction (and optionally
    stereo reprojection with ``stereo_repr``), ratio-weighted.
    """
    alpha = 0.5 if alpha is None else alpha
    use_stereo = "stereo" in options
    use_stereo_reprl = "stereo_repr" in options
    use_mono_stereodl = "no_mono_stereodl" not in options

    gt = _clamped_gt(data)
    b, h, w = gt.shape[0:3]
    cv_mask = data["cv_mask"]
    cv_disc = (cv_mask > 0.5).astype(jnp.float32)
    ratio = jnp.sum(cv_disc) / cv_disc.size

    loss_dict: Dict[str, Array] = {}
    sdl_sum = 0.0
    md2l_sum = 0.0

    stereo_preds = (
        data["stereo_pred"] if use_mono_stereodl else [None] * len(data["mono_pred"])
    )

    # All 4 scales of each reprojection branch in ONE batched pass (the
    # depth_loss pattern): one warp-kernel program + one SSIM stack for the
    # mono(+temporal-stereo) branch and one for the stereo branch, with the
    # scale-invariant automasking errors computed once — instead of 4
    # separate passes each recomputing them. Per-scale masked means come
    # from reshaping; numerically identical.
    mono_preds = [upsample_nearest_to(p, h, w) for p in data["mono_pred"]]
    s = len(mono_preds)
    stacked = jnp.concatenate(mono_preds, axis=0)
    tiled = tile_batch_for_scales(data, s)
    am = identity_reprojection_errors(data, use_mono=True, use_stereo=use_stereo)
    mono_repr_all, cov_sum = reprojection_loss(
        stacked, tiled, use_mono=True, use_stereo=use_stereo,
        automasking=True, reduce=False, combine_frames="min",
        automask_errors=jnp.tile(am, (s, 1, 1, 1)), with_coverage=True,
    )
    mono_repr_all = mono_repr_all.reshape(s, b, h, w, 1)
    if use_stereo_reprl:
        st_repr_all, cov_s = reprojection_loss(
            stacked, tiled, use_mono=False, use_stereo=True,
            automasking=False, reduce=False, combine_frames="min", border=3,
            with_coverage=True,
        )
        st_repr_all = st_repr_all.reshape(s, b, h, w, 1)
        cov_sum = cov_sum + cov_s

    for scale, (mono_pred, stereo_pred) in enumerate(
        zip(mono_preds, stereo_preds)
    ):
        mono_sdl_map, mono_inv = sparse_depth_loss(
            mono_pred, gt * (1 - cv_disc), reduce=False
        )
        mono_sdl = mask_mean(jax.lax.stop_gradient(mono_sdl_map), mono_inv)

        if use_mono_stereodl:
            stereo_pred = jax.lax.stop_gradient(
                upsample_nearest_to(stereo_pred, h, w)
            )
            st_map, st_inv = sparse_depth_loss(
                mono_pred, stereo_pred * cv_disc, reduce=False
            )
            stereo_sdl = jax.lax.stop_gradient(mask_mean(st_map, st_inv))
        else:
            stereo_sdl = 0.0

        sdl = mono_sdl * (1 - ratio) + stereo_sdl * ratio * 4
        sdl_sum += sdl
        loss_dict[f"sdl_{scale}"] = sdl

        smooth_map = edge_aware_smoothness_loss(
            mono_pred, data["keyframe"], reduce=False
        )
        # The reference adds the un-reduced map and the trainer means the
        # result; meaning here keeps the loss scalar with identical value.
        smoothness = jnp.mean(smooth_map)

        mono_repr = mono_repr_all[scale]
        mono_inf = jnp.isinf(mono_repr) | (cv_disc > 0.5)
        mono_repr = mask_mean(jnp.where(mono_inf, 0.0, mono_repr), mono_inf)

        if use_stereo_reprl:
            st_repr = st_repr_all[scale]
            st_inf = jnp.isinf(st_repr) | (cv_disc <= 0.5)
            st_repr = mask_mean(jnp.where(st_inf, 0.0, st_repr), st_inf)
        else:
            st_repr = jnp.zeros_like(mono_repr)

        loss_dict[f"static_md2l_{scale}"] = jax.lax.stop_gradient(mono_repr)
        loss_dict[f"dynamic_md2l_{scale}"] = st_repr

        repr_l = mono_repr * (1 - ratio) + st_repr * ratio
        md2l = repr_l + smoothness * 1e-3 / (2**scale)
        loss_dict[f"md2l_{scale}"] = md2l
        md2l_sum += md2l

    loss_dict["loss"] = 2 * alpha * 4 * sdl_sum + 2 * (1 - alpha) * md2l_sum
    loss_dict["warp_uncovered"] = cov_sum
    return loss_dict


def depth_aux_mask_loss(data: Dict, alpha=None, roi=None, options=()) -> Dict[str, Array]:
    """Auxiliary mask-gated depth loss (reference :222-280; unused in paper)."""
    alpha = 0.5 if alpha is None else alpha
    gt = _clamped_gt(data)
    h, w = gt.shape[1:3]
    cv_mask = jax.lax.stop_gradient(data["cv_mask"]) > 0.5

    loss_dict: Dict[str, Array] = {}
    sdl_sum = 0.0
    cov_sum = 0.0
    md2l_sum = 0.0

    for scale, mono_pred in enumerate(data["mono_pred"]):
        mono_pred = upsample_nearest_to(mono_pred, h, w)

        sdl_map, sdl_inv = sparse_depth_loss(mono_pred, gt, reduce=False)
        sdl = mask_mean(sdl_map, sdl_inv | cv_mask)
        sdl_sum += sdl
        loss_dict[f"sdl_{scale}"] = sdl

        smooth_map = edge_aware_smoothness_loss(
            mono_pred, data["keyframe"], reduce=False
        )
        smoothness = mask_mean(smooth_map, cv_mask)

        mono_repr, cov_m = reprojection_loss(
            mono_pred, data, use_mono=True, use_stereo=False,
            automasking=False, reduce=False, combine_frames="min",
            with_coverage=True,
        )
        mono_repr = mono_repr[..., None]
        cov_sum += cov_m
        mono_inf = jnp.isinf(mono_repr)
        mono_repr = jnp.where(mono_inf, 0.0, mono_repr)

        loss_dict[f"static_md2l_{scale}"] = mask_mean(mono_repr, mono_inf)

        repr_l = mask_mean(mono_repr, mono_inf | cv_mask)
        md2l = repr_l + smoothness * 1e-3 / (2**scale)
        loss_dict[f"md2l_{scale}"] = md2l
        md2l_sum += md2l

    loss_dict["loss"] = 2 * alpha * 4 * sdl_sum + 2 * (1 - alpha) * md2l_sum
    loss_dict["warp_uncovered"] = cov_sum
    return loss_dict


LOSSES = {
    "depth_loss": depth_loss,
    "mask_loss": mask_loss,
    "mask_refinement_loss": mask_refinement_loss,
    "depth_refinement_loss": depth_refinement_loss,
    "depth_aux_mask_loss": depth_aux_mask_loss,
}
