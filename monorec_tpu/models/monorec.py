"""MonoRec model composition as a flax module with a pure forward.

Replaces the reference ``MonoRecModel`` (``model/monorec/monorec_model.py:
560-729``) — a stateful dict-mutating nn.Module with in-place flag flips —
with a functional design:

* the plane-sweep cost volume is a parameter-free op
  (``monorec_tpu.ops.compute_cost_volume``) under ``stop_gradient``;
* the ResNet encoder, MaskModule and DepthModule are flax submodules exposed
  both through the full ``__call__`` (pretrain modes 0-3) and as individual
  methods (``features`` / ``mask`` / ``depth``) so the multi-pass stage-2-4
  training protocol can compose them without flag mutation;
* augmentation is parameterized by explicit PRNG keys
  (``monorec_tpu.models.augmentation``).

Batch contract (NHWC; the TPU-native analog of the reference data_dict,
SURVEY.md §3.0):
  keyframe             (B, H, W, 3)   in [-0.5, 0.5]
  keyframe_pose        (B, 4, 4)      cam-to-world
  keyframe_intrinsics  (B, 4, 4)
  frames               (B, F, H, W, 3)
  poses / intrinsics   (B, F, 4, 4)
  stereoframe(+pose/intrinsics)  optional
  mvobj_mask           optional (B, H, W, 1)

Output dict keys mirror the reference contract: ``cost_volume``
(B, H, W, D), ``single_frame_cvs`` (B, F, H, W, D), ``image_features``,
``cv_mask``, ``predicted_inverse_depths`` (list, finest first), ``result``,
``mask``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monorec_tpu.models.augmentation import (
    conditional_hflip,
    sample_flip_conditions,
)
from monorec_tpu.models.depth_module import DepthModule
from monorec_tpu.models.mask_module import MaskModule, SimpleMaskModule
from monorec_tpu.models.resnet import ResNetEncoder
from monorec_tpu.ops.cost_volume import (
    CostVolumeConfig,
    compute_cost_volume,
    compute_cost_volume_pair,
)

Array = jax.Array
Batch = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MonoRecConfig:
    """Static model configuration (mirrors MonoRecModel kwargs)."""

    inv_depth_min_max: Tuple[float, float] = (0.33, 0.0025)
    cv_depth_steps: int = 32
    # 0: full network; 1: depth only (random cv_mask dropout);
    # 2: mask only; 3: depth with mvobj_mask as cv_mask.
    pretrain_mode: int = 0
    pretrain_dropout: float = 0.0
    pretrain_dropout_mode: int = 0
    augmentation: Optional[str] = None  # None | "depth" | "mask"
    use_mono: bool = True
    use_stereo: bool = False
    use_ssim: int = 1
    sfcv_mult_mask: bool = True
    simple_mask: bool = False
    mask_use_cv: bool = True
    mask_use_feats: bool = True
    cv_patch_size: int = 3
    depth_large_model: bool = False
    no_cv: bool = False
    freeze_resnet: bool = True
    freeze_module: Tuple[str, ...] = ()
    resnet_layers: int = 18
    # "float32" (exact reference parity) or "bfloat16": quantize source
    # images to bf16 inside the fused Pallas cost-volume kernel — ~1.6x
    # faster sweep, max CV error ~1.6e-3 (golden-sample abs_rel drift
    # verified ≪ the 1% parity budget). TPU-only knob; the XLA fallback
    # path ignores it.
    cv_warp_dtype: str = "float32"
    # Computation dtype of the Mask/Depth U-Net convs (params stay f32).
    # "bfloat16" runs them on the MXU at ~2x f32 throughput — the
    # recommended TPU serving configuration; "float32" (default) is the
    # exact reference-parity path. The ResNet encoder (1.5 ms) and all
    # losses/metrics stay f32 either way.
    compute_dtype: str = "float32"

    def cv_config(self) -> CostVolumeConfig:
        return CostVolumeConfig(
            depth_steps=self.cv_depth_steps,
            patch_size=self.cv_patch_size,
            use_ssim=self.use_ssim,
            sfcv_mult_mask=self.sfcv_mult_mask,
            warp_dtype=self.cv_warp_dtype,
        )

    @property
    def has_mask_module(self) -> bool:
        return self.pretrain_mode not in (1, 3)

    @property
    def has_depth_module(self) -> bool:
        return self.pretrain_mode != 2


def gather_cv_frames(
    batch: Batch, use_mono: bool, use_stereo: bool
) -> Tuple[Array, Array, Array]:
    """Stack the source frames/intrinsics/poses the cost volume should use."""
    frames, intr, poses = [], [], []
    if use_mono:
        frames.append(batch["frames"])
        intr.append(batch["intrinsics"])
        poses.append(batch["poses"])
    if use_stereo:
        frames.append(batch["stereoframe"][:, None])
        intr.append(batch["stereoframe_intrinsics"][:, None])
        poses.append(batch["stereoframe_pose"][:, None])
    return (
        jnp.concatenate(frames, axis=1),
        jnp.concatenate(intr, axis=1),
        jnp.concatenate(poses, axis=1),
    )


class MonoRec(nn.Module):
    config: MonoRecConfig = MonoRecConfig()

    def setup(self):
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        self.encoder = ResNetEncoder(cfg.resnet_layers)
        if cfg.has_mask_module:
            if cfg.simple_mask:
                self.att = SimpleMaskModule(cfg.cv_depth_steps, dtype=dtype)
            else:
                self.att = MaskModule(
                    cfg.cv_depth_steps, cfg.mask_use_cv, cfg.mask_use_feats,
                    dtype=dtype,
                )
        if cfg.has_depth_module:
            self.depth_net = DepthModule(
                cfg.cv_depth_steps, cfg.depth_large_model, dtype=dtype
            )

    # ----- submodule entry points (used by the stage 2-4 protocol) -----

    def features(self, keyframe: Array) -> Sequence[Array]:
        """ResNet pyramid of keyframe + 0.5 (reference feeds images in [0,1])."""
        feats = self.encoder(keyframe + 0.5)
        if self.config.freeze_resnet:
            feats = [jax.lax.stop_gradient(f) for f in feats]
        return feats

    def mask(
        self,
        single_frame_cvs: Array,
        image_features: Sequence[Array],
        keyframe: Optional[Array] = None,
        predicted_inverse_depth: Optional[Array] = None,
        train: bool = False,
    ) -> Array:
        cfg = self.config
        if cfg.simple_mask:
            out = self.att(
                single_frame_cvs, keyframe, predicted_inverse_depth,
                image_features, train,
            )
        else:
            out = self.att(single_frame_cvs, image_features, train)
        if "att" in cfg.freeze_module:
            out = jax.lax.stop_gradient(out)
        return out

    def depth(
        self,
        cost_volume: Array,
        keyframe: Array,
        image_features: Sequence[Array],
    ) -> List[Array]:
        """4-scale inverse depth, affine-mapped to [inv_depth_max, inv_depth_min]."""
        cfg = self.config
        preds = self.depth_net(cost_volume, keyframe, image_features)
        lo, hi = cfg.inv_depth_min_max[1], cfg.inv_depth_min_max[0]
        preds = [(1.0 - p) * lo + p * hi for p in preds]
        if "depth" in cfg.freeze_module:
            preds = [jax.lax.stop_gradient(p) for p in preds]
        return preds

    def cost_volume(
        self, batch: Batch, use_mono=None, use_stereo=None, return_coverage=False
    ):
        cfg = self.config
        use_mono = cfg.use_mono if use_mono is None else use_mono
        use_stereo = cfg.use_stereo if use_stereo is None else use_stereo
        frames, intr, poses = gather_cv_frames(batch, use_mono, use_stereo)
        return compute_cost_volume(
            batch["keyframe"],
            batch["keyframe_intrinsics"],
            batch["keyframe_pose"],
            frames,
            intr,
            poses,
            jnp.float32(cfg.inv_depth_min_max[1]),
            jnp.float32(cfg.inv_depth_min_max[0]),
            cfg.cv_config(),
            cv_depths=batch.get("cv_depths"),
            return_coverage=return_coverage,
        )

    def cost_volume_pair(self, batch: Batch):
        """Mono AND stereo cost volumes in one fused sweep (stage 2-4
        protocol; reference runs two CostVolumeModule passes,
        ``trainer/monorec_trainer.py:45-46,71-72``). Returns
        ``(cv_mono, sfcv_mono, cv_stereo, sfcv_stereo, coverage)``."""
        cfg = self.config
        return compute_cost_volume_pair(
            batch["keyframe"],
            batch["keyframe_intrinsics"],
            batch["keyframe_pose"],
            batch["frames"],
            batch["intrinsics"],
            batch["poses"],
            batch["stereoframe"],
            batch["stereoframe_intrinsics"],
            batch["stereoframe_pose"],
            jnp.float32(cfg.inv_depth_min_max[1]),
            jnp.float32(cfg.inv_depth_min_max[0]),
            cfg.cv_config(),
            cv_depths=batch.get("cv_depths"),
        )

    # ----- full forward (pretrain modes, reference forward :672-729) -----

    def __call__(self, batch: Batch, train: bool = False) -> Dict[str, Any]:
        cfg = self.config
        keyframe = batch["keyframe"]
        b, h, w, _ = keyframe.shape
        out: Dict[str, Any] = {}

        if cfg.no_cv:
            cv = jnp.zeros((b, h, w, cfg.cv_depth_steps), keyframe.dtype)
            f = batch["frames"].shape[1] + (1 if cfg.use_stereo else 0)
            sfcv = jnp.zeros((b, f, h, w, cfg.cv_depth_steps), keyframe.dtype)
        else:
            with jax.named_scope("cost_volume"):
                cv, sfcv, cv_uncov = self.cost_volume(batch, return_coverage=True)
            # Kernel coverage diagnostic: nonzero == pixels whose warp source
            # fell outside the Pallas tap window (degraded CV); trainers log
            # it so silent corruption is impossible.
            out["cv_uncovered"] = cv_uncov

        flip_cond = None
        if cfg.augmentation == "depth" and train:
            flip_cond = sample_flip_conditions(
                self.make_rng("augment"), b
            )
            keyframe = conditional_hflip(keyframe, flip_cond)
            cv = conditional_hflip(cv, flip_cond)
            sfcv = conditional_hflip(sfcv, flip_cond)

        out["cost_volume"] = cv
        out["single_frame_cvs"] = sfcv

        with jax.named_scope("resnet_features"):
            feats = self.features(keyframe)
        out["image_features"] = feats

        if cfg.pretrain_mode in (0, 2):
            if cfg.simple_mask:
                # SimpleMask needs a depth estimate first: run depth on the
                # raw CV, then mask, then re-run depth on the masked CV.
                pre_preds = self.depth(cv, keyframe, feats)
                cv_mask = self.mask(sfcv, feats, keyframe, pre_preds[0], train)
            else:
                cv_mask = self.mask(sfcv, feats, train=train)
        elif cfg.pretrain_mode == 1:
            if train:
                rng = self.make_rng("dropout")
                keep_p = cfg.pretrain_dropout
                if cfg.pretrain_dropout_mode == 0:
                    small = jax.random.bernoulli(
                        rng, keep_p, (b, h // 8, w // 8, 1)
                    ).astype(keyframe.dtype)
                    small = small / jnp.maximum(keep_p, 1e-8)
                    cv_mask = jnp.repeat(jnp.repeat(small, 8, axis=1), 8, axis=2)
                else:
                    scalar = jax.random.bernoulli(rng, keep_p, (b, 1, 1, 1)).astype(
                        keyframe.dtype
                    ) / jnp.maximum(keep_p, 1e-8)
                    cv_mask = jnp.broadcast_to(scalar, (b, h, w, 1))
            else:
                cv_mask = jnp.zeros((b, h, w, 1), keyframe.dtype)
        else:  # pretrain_mode == 3
            cv_mask = jax.lax.stop_gradient(batch["mvobj_mask"])

        out["cv_mask"] = cv_mask

        if cfg.pretrain_mode != 2:
            masked_cv = (1.0 - cv_mask) * cv
            out["cost_volume"] = masked_cv
            preds = self.depth(masked_cv, keyframe, feats)
            out["predicted_inverse_depths"] = preds

        if flip_cond is not None:
            # Revert: orient every prediction like the un-augmented inputs.
            out["cost_volume"] = conditional_hflip(out["cost_volume"], flip_cond)
            out["single_frame_cvs"] = conditional_hflip(
                out["single_frame_cvs"], flip_cond
            )
            out["cv_mask"] = conditional_hflip(out["cv_mask"], flip_cond)
            if cfg.pretrain_mode != 2:
                out["predicted_inverse_depths"] = [
                    conditional_hflip(p, flip_cond)
                    for p in out["predicted_inverse_depths"]
                ]

        if cfg.pretrain_mode == 2:
            out["result"] = out["cv_mask"]
        else:
            out["result"] = out["predicted_inverse_depths"][0]
            out["mask"] = out["cv_mask"]
        return out
