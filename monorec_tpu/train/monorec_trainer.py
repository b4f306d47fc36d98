"""Stage 2-4 trainer: the multi-pass MonoRec protocol as one jitted step.

The reference ``MonoRecTrainer._feed`` (``trainer/monorec_trainer.py:21-122``)
mutates module flags (``model.use_stereo = True``) and threads a mutable dict
through two cost-volume passes. Here the whole protocol is a pure function
compiled once:

  A) stereo pass: cost volume from the stereo frame (stop-gradient), depth
     decoded from it (stop-gradient unless ``concat_mono_stereo``);
  B) mono pass: cost volume from temporal frames (stop-gradient), MaskModule
     on its per-frame CVs, optional CV attenuation by the mask
     (``mult_mask_on_cv``), mono depth;
  C) augmentation apply/revert: horizontal flip (depth) applied to inputs
     and CVs, predictions flipped back before the loss; or mask augmentation
     (flip + random resized crop) applied to all tensors with the augmented
     moving-object mask as the target;
  D) the configured stage loss on the merged data dict.

Flags (compute_mono_pred / compute_stereo_pred / compute_mask /
mult_mask_on_cv / concat_mono_stereo) are static, so each stage compiles its
own minimal program.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from monorec_tpu.models.augmentation import (
    apply_mask_aug,
    apply_mask_aug_frames,
    conditional_hflip,
    sample_flip_conditions,
    sample_mask_aug_params,
)
from monorec_tpu.models.monorec import MonoRec
from monorec_tpu.train.state import TrainState
from monorec_tpu.train.trainer import Trainer, apply_gradients_guarded


class MonoRecTrainer(Trainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        tcfg = self.config.get("trainer", {})
        self.compute_mono_pred = tcfg.get("compute_mono_pred", True)
        self.compute_stereo_pred = tcfg.get("compute_stereo_pred", True)
        self.compute_mask = tcfg.get("compute_mask", True)
        self.mult_mask_on_cv = tcfg.get("mult_mask_on_cv", False)
        self.concat_mono_stereo = tcfg.get("concat_mono_stereo", False)
        # One 2B-batch DepthModule pass for the mono+stereo decodes (same
        # weights; per-sample outputs unchanged — tested). Default OFF:
        # measured 31.27 vs 32.58 kf/s on the chip (r05 probe) — the
        # backward conv runs on the full 2B batch even though the stereo
        # half's cotangents are structurally zero, which costs more than
        # the forward batching saves.
        self.joint_depth_decode = tcfg.get("joint_depth_decode", False)
        # One fused plane-sweep launch for the mono+stereo cost volumes
        # (numerically identical; see compute_cost_volume_pair). Default
        # OFF: measured 31.45 vs 32.58 kf/s (r05 probe) — the kernel's
        # per-frame work is linear in F and the 3B-frame concat + sliced
        # fusion epilogue cost more than the saved launch.
        self.joint_cv = tcfg.get("joint_cv", False)

    # ------------------------------------------------------------------

    def _feed(self, params, batch_stats, batch: Dict, rng, train: bool, alpha):
        model: MonoRec = self.model
        cfg = model.config
        if train and self.color_aug_on_device:
            from monorec_tpu.models.augmentation import jitter_image_keys

            batch = jitter_image_keys(batch, jax.random.fold_in(rng, 2))
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"dropout": jax.random.fold_in(rng, 0)}

        def apply(method, *a, **kw):
            return model.apply(variables, *a, method=method, rngs=rngs, **kw)

        b = batch["keyframe"].shape[0]
        lo, hi = cfg.inv_depth_min_max[1], cfg.inv_depth_min_max[0]

        # --- augmentation parameters + augmented input view -------------
        aug = cfg.augmentation if train else None
        aug_rng = jax.random.fold_in(rng, 1)
        data = dict(batch)
        flip_cond = None
        mask_params = None
        if aug == "depth":
            flip_cond = sample_flip_conditions(aug_rng, b)
            aug_one = lambda x: conditional_hflip(x, flip_cond)
            data["keyframe"] = aug_one(batch["keyframe"])
            if "mvobj_mask" in batch:
                data["mvobj_mask"] = aug_one(batch["mvobj_mask"])
        elif aug == "mask":
            h, w = batch["keyframe"].shape[1:3]
            mask_params = sample_mask_aug_params(aug_rng, b, h, w)

            def aug_one(x):
                if x.ndim == 5:  # (B, F, H, W, C): per-frame stacks / sfcvs
                    return apply_mask_aug_frames(x, mask_params)
                return apply_mask_aug(x, mask_params)

            data["keyframe"] = aug_one(batch["keyframe"])
            data["frames"] = aug_one(batch["frames"])
            if "stereoframe" in batch:
                data["stereoframe"] = aug_one(batch["stereoframe"])
            m = (aug_one(batch["mvobj_mask"]) > 0.5).astype(jnp.float32)
            data["mvobj_mask"] = m
            data["target"] = m
        else:
            aug_one = lambda x: x

        data["inv_depth_min"] = jnp.float32(hi)
        data["inv_depth_max"] = jnp.float32(lo)

        feats = apply(MonoRec.features, data["keyframe"])

        # --- A+B) cost volumes ------------------------------------------
        # When the protocol needs BOTH the stereo-frame and the temporal
        # (mono) cost volume of the same keyframe, compute them in ONE
        # fused plane-sweep launch (the reference runs two sequential
        # CostVolumeModule passes, ``trainer/monorec_trainer.py:45-46,
        # 71-72``; numerics are identical — see compute_cost_volume_pair).
        # ``cv_uncovered`` then counts over mono AND stereo frames.
        if self.compute_stereo_pred and self.joint_cv:
            cv_m, sfcv_m, cv_s, sfcv_s, cv_uncov = apply(
                MonoRec.cost_volume_pair, batch
            )
            cv_s, sfcv_s = aug_one(cv_s), aug_one(sfcv_s)
        elif self.compute_stereo_pred:
            cv_s, sfcv_s = apply(
                MonoRec.cost_volume, batch, use_mono=False, use_stereo=True
            )
            cv_s, sfcv_s = aug_one(cv_s), aug_one(sfcv_s)
            cv_m, sfcv_m, cv_uncov = apply(
                MonoRec.cost_volume, batch,
                use_mono=True, use_stereo=False, return_coverage=True,
            )
        else:
            cv_s = None
            cv_m, sfcv_m, cv_uncov = apply(
                MonoRec.cost_volume, batch,
                use_mono=True, use_stereo=False, return_coverage=True,
            )
        data["cv_uncovered"] = cv_uncov
        cv_m, sfcv_m = aug_one(cv_m), aug_one(sfcv_m)

        if self.compute_mask:
            cv_mask = apply(MonoRec.mask, sfcv_m, feats, train=train)
            if self.mult_mask_on_cv:
                cv_m = cv_m * (1.0 - cv_mask)
        else:
            cv_mask = jnp.zeros_like(cv_m[..., :1])

        # --- depth decodes ------------------------------------------------
        # Mono and stereo decodes share the SAME DepthModule weights
        # (reference ``trainer/monorec_trainer.py:56-60,87-90``), so when
        # both are needed they run as one 2B-batch U-Net pass (the decoder
        # has no cross-batch ops; per-sample outputs are unchanged). The
        # stereo half is detached afterwards exactly like the separate-pass
        # formulation.
        if (
            self.compute_stereo_pred
            and self.compute_mono_pred
            and self.joint_depth_decode
        ):
            preds = apply(
                MonoRec.depth,
                jnp.concatenate([cv_m, cv_s], axis=0),
                jnp.concatenate([data["keyframe"]] * 2, axis=0),
                [jnp.concatenate([f, f], axis=0) for f in feats],
            )
            mono_pred = [p[:b] for p in preds]
            stereo_pred = [p[b:] for p in preds]
            if not self.concat_mono_stereo:
                stereo_pred = [jax.lax.stop_gradient(p) for p in stereo_pred]
        else:
            if self.compute_stereo_pred:
                stereo_pred = apply(
                    MonoRec.depth, cv_s, data["keyframe"], feats
                )
                if not self.concat_mono_stereo:
                    stereo_pred = [
                        jax.lax.stop_gradient(p) for p in stereo_pred
                    ]
            else:
                stereo_pred = None
            if self.compute_mono_pred:
                mono_pred = apply(MonoRec.depth, cv_m, data["keyframe"], feats)
            else:
                mono_pred = [jnp.zeros_like(cv_m[..., :1])]

        data["cost_volume"] = cv_m
        data["single_frame_cvs"] = sfcv_m
        data["cv_mask"] = cv_mask
        data["mono_pred"] = mono_pred
        data["stereo_pred"] = stereo_pred
        data["predicted_inverse_depths"] = mono_pred
        data["result"] = mono_pred[0]
        data["mask"] = cv_mask

        # --- C) revert (flip aug only; mask aug has no revert) ------------
        if flip_cond is not None:
            rev = lambda x: conditional_hflip(x, flip_cond)
            data["keyframe"] = batch["keyframe"]
            if "mvobj_mask" in batch:
                data["mvobj_mask"] = batch["mvobj_mask"]
            data["cv_mask"] = rev(data["cv_mask"])
            data["mask"] = data["cv_mask"]
            data["mono_pred"] = [rev(p) for p in data["mono_pred"]]
            if data["stereo_pred"] is not None:
                data["stereo_pred"] = [rev(p) for p in data["stereo_pred"]]
            data["predicted_inverse_depths"] = data["mono_pred"]
            data["result"] = data["mono_pred"][0]

        # --- optional batch-doubling (concat_mono_stereo) ------------------
        if self.concat_mono_stereo:
            dup = lambda x: jnp.concatenate([x, x], axis=0)
            for key in (
                "keyframe", "keyframe_pose", "keyframe_intrinsics", "stereoframe",
                "stereoframe_pose", "stereoframe_intrinsics", "frames", "poses",
                "intrinsics", "mask", "cv_mask", "target",
            ):
                if key in data and data[key] is not None:
                    data[key] = dup(data[key])
            data["predicted_inverse_depths"] = [
                jnp.concatenate([m, s], axis=0)
                for m, s in zip(mono_pred, stereo_pred)
            ]
            data["result"] = data["predicted_inverse_depths"][0]

        loss_dict = self.loss_fn(data, alpha, self.roi, self.options)
        return loss_dict, data

    # ------------------------------------------------------------------

    def _build_steps(self):
        metric_fns, roi, max_distance = self.metric_fns, self.roi, self.max_distance

        def compute_metrics(data):
            if not metric_fns:
                return jnp.zeros((0,))
            return jnp.stack([m(data, roi, max_distance) for m in metric_fns])

        def train_step(state: TrainState, batch: Dict, rng, alpha):
            def losses(params):
                loss_dict, data = self._feed(
                    params, state.batch_stats, batch, rng, True, alpha
                )
                return loss_dict["loss"], (loss_dict, data)

            grads, (loss_dict, data) = jax.grad(losses, has_aux=True)(state.params)
            new_state, skipped = apply_gradients_guarded(
                state, grads, self.skip_nonfinite_updates
            )
            metrics = compute_metrics(data)
            if "cv_uncovered" in data:
                loss_dict = dict(loss_dict, cv_uncovered=jnp.sum(data["cv_uncovered"]))
            if skipped is not None:
                loss_dict = dict(loss_dict, skipped_nonfinite=skipped)
            viz = {"result": data["result"], "mask": data.get("mask")}
            return new_state, loss_dict, metrics, viz

        def valid_step(state: TrainState, batch: Dict, alpha):
            loss_dict, data = self._feed(
                state.params, state.batch_stats, batch,
                jax.random.PRNGKey(0), False, alpha,
            )
            metrics = compute_metrics(data)
            viz = {"result": data["result"], "mask": data.get("mask")}
            return loss_dict, metrics, viz

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._valid_step = jax.jit(valid_step)
