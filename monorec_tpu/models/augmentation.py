"""Training-time augmentations as pure functions of PRNG keys.

The reference uses two stateful augmenters (``monorec_model.py:15-92``):

* ``DepthAugmentation`` — per-sample horizontal flip of the keyframe, cost
  volumes and masks, with a ``revert`` that flips predictions back so losses
  see originally-oriented frames. Flip is an involution, so apply == revert.
* ``MaskAugmentation`` — kornia RandomHorizontalFlip + RandomResizedCrop
  (scale .8-1.0, ratio 1.9-2.1) applied consistently to every tensor of the
  sample; the augmented moving-object mask becomes the training target.

Here both are pure: parameters are sampled from an explicit key and threaded
through apply/revert, so the jitted train step stays functional.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from monorec_tpu.ops.sampling import grid_sample_nhwc

Array = jax.Array


# ---------------------------------------------------------------------------
# Horizontal-flip (depth) augmentation
# ---------------------------------------------------------------------------


def sample_flip_conditions(rng: jax.Array, batch_size: int) -> Array:
    """Per-sample flip decision with probability 0.5."""
    return jax.random.uniform(rng, (batch_size,)) < 0.5


def conditional_hflip(x: Array, conditions: Array) -> Array:
    """Flip NHWC (or N...HWC) tensors along W where conditions is True."""
    flipped = jnp.flip(x, axis=-2)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    return jnp.where(conditions.reshape(shape), flipped, x)


# ---------------------------------------------------------------------------
# Mask augmentation (flip + random resized crop)
# ---------------------------------------------------------------------------


class MaskAugParams(NamedTuple):
    flip: Array  # (B,) bool
    # Crop rectangle in source-pixel units: top-left and size.
    y0: Array  # (B,)
    x0: Array  # (B,)
    crop_h: Array  # (B,)
    crop_w: Array  # (B,)


def sample_mask_aug_params(
    rng: jax.Array, batch_size: int, height: int, width: int
) -> MaskAugParams:
    """Random flip + resized-crop parameters (scale .8-1, ratio 1.9-2.1)."""
    k_flip, k_scale, k_ratio, k_pos = jax.random.split(rng, 4)
    flip = jax.random.uniform(k_flip, (batch_size,)) < 0.5
    scale = jax.random.uniform(k_scale, (batch_size,), minval=0.8, maxval=1.0)
    ratio = jax.random.uniform(k_ratio, (batch_size,), minval=1.9, maxval=2.1)

    area = scale * height * width
    crop_w = jnp.clip(jnp.sqrt(area * ratio), 1.0, width)
    crop_h = jnp.clip(jnp.sqrt(area / ratio), 1.0, height)

    u = jax.random.uniform(k_pos, (batch_size, 2))
    y0 = u[:, 0] * (height - crop_h)
    x0 = u[:, 1] * (width - crop_w)
    return MaskAugParams(flip, y0, x0, crop_h, crop_w)


def apply_mask_aug(x: Array, params: MaskAugParams) -> Array:
    """Flip then crop-resize an NHWC tensor back to its own resolution."""
    b, h, w, _ = x.shape
    x = conditional_hflip(x, params.flip)

    # Build a per-sample sampling grid over the crop rectangle, expressed in
    # normalized [-1, 1] coordinates (align_corners=False convention).
    ys = (jnp.arange(h) + 0.5) / h  # relative position inside the crop
    xs = (jnp.arange(w) + 0.5) / w
    gy = params.y0[:, None] + ys[None, :] * params.crop_h[:, None]  # (B, H)
    gx = params.x0[:, None] + xs[None, :] * params.crop_w[:, None]  # (B, W)
    ny = (2.0 * gy) / h - 1.0  # pixel-center -> normalized coordinate

    nx = (2.0 * gx) / w - 1.0
    grid = jnp.stack(
        [
            jnp.broadcast_to(nx[:, None, :], (b, h, w)),
            jnp.broadcast_to(ny[:, :, None], (b, h, w)),
        ],
        axis=-1,
    )
    return grid_sample_nhwc(x, grid)


def apply_mask_aug_tree(tree, params: MaskAugParams):
    """Apply mask augmentation to every array leaf of a pytree of NHWC (or
    N F H W C) tensors, flattening frame axes as needed."""

    def one(x):
        if x.ndim == 4:
            return apply_mask_aug(x, params)
        if x.ndim == 5:
            return jax.vmap(lambda xf: apply_mask_aug(xf, params), in_axes=1, out_axes=1)(x)
        return x

    return jax.tree_util.tree_map(one, tree)
