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
    # backend="auto": the resized-crop inputs are data (images, masks) or
    # stop_gradient'd cost volumes, so the grid-warp kernel's
    # zero-image-gradient VJP is exact here; on TPU this avoids an XLA
    # serial gather per augmented tensor in the stage-2/3 train steps.
    return grid_sample_nhwc(x, grid, backend="auto")


def apply_mask_aug_frames(x: Array, params: MaskAugParams) -> Array:
    """Mask augmentation for (B, F, H, W, C) frame stacks: folds the frame
    axis into batch with per-frame-repeated params instead of vmapping —
    vmapping the Pallas grid-warp kernel batches its 1-D SMEM coverage
    output into a (F, N) block the TPU lowering rejects (surfaced by the
    first full-res stage-2 run on chip, tools/curriculum_fullres.py), and
    the folded form is one bigger launch instead of F."""
    b, f = x.shape[:2]
    rep = MaskAugParams(*(jnp.repeat(p, f, axis=0) for p in params))
    flat = apply_mask_aug(x.reshape((b * f,) + x.shape[2:]), rep)
    return flat.reshape(x.shape)


def apply_mask_aug_tree(tree, params: MaskAugParams):
    """Apply mask augmentation to every array leaf of a pytree of NHWC (or
    N F H W C) tensors, flattening frame axes as needed."""

    def one(x):
        if x.ndim == 4:
            return apply_mask_aug(x, params)
        if x.ndim == 5:
            return apply_mask_aug_frames(x, params)
        return x

    return jax.tree_util.tree_map(one, tree)


# ----- on-device color jitter ------------------------------------------------
# TPU-native replacement for the host-side per-sample color jitter
# (monorec_tpu/data/color_jitter.py ≙ reference ColorJitterMulti,
# kitti_odometry_dataset.py:377-383): the numpy hue rotation costs ~70 ms per
# sample on one host core and capped the cached data pipeline at ~13
# samples/s; as elementwise ops inside the jitted train step it is free.
# Semantics match the numpy implementation (same op formulas, random op
# order, one parameter set per sample shared by all of its frames).


class ColorJitterBatch(NamedTuple):
    brightness: Array  # (B,)
    contrast: Array  # (B,)
    saturation: Array  # (B,)
    hue: Array  # (B,)
    order: Array  # (B, 4) int32 permutation


def sample_color_jitter_batch(
    rng: jax.Array,
    batch_size: int,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.1,
) -> ColorJitterBatch:
    kb, kc, ks, kh, ko = jax.random.split(rng, 5)
    u = lambda k, lo, hi: jax.random.uniform(
        k, (batch_size,), minval=lo, maxval=hi
    )
    return ColorJitterBatch(
        u(kb, max(0.0, 1 - brightness), 1 + brightness),
        u(kc, max(0.0, 1 - contrast), 1 + contrast),
        u(ks, max(0.0, 1 - saturation), 1 + saturation),
        u(kh, -hue, hue),
        jnp.argsort(jax.random.uniform(ko, (batch_size, 4)), axis=-1),
    )


_LUMA = (0.299, 0.587, 0.114)


def _jitter_one(img: Array, b, c, s, h, order) -> Array:
    """Jitter one (H, W, 3) image in [0, 1]; mirrors color_jitter.py."""
    luma = jnp.asarray(_LUMA, img.dtype)

    def brightness(x):
        return jnp.clip(x * b, 0.0, 1.0)

    def contrast(x):
        m = jnp.mean(x @ luma)
        return jnp.clip(m + (x - m) * c, 0.0, 1.0)

    def saturation(x):
        gray = (x @ luma)[..., None]
        return jnp.clip(gray + (x - gray) * s, 0.0, 1.0)

    def hue(x):
        r, g, bl = x[..., 0], x[..., 1], x[..., 2]
        maxc = jnp.max(x, axis=-1)
        minc = jnp.min(x, axis=-1)
        v = maxc
        delta = maxc - minc
        sat = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
        safe = jnp.maximum(delta, 1e-12)
        hh = jnp.where(
            maxc == r, ((g - bl) / safe) % 6.0,
            jnp.where(maxc == g, (bl - r) / safe + 2.0, (r - g) / safe + 4.0),
        )
        hh = jnp.where(delta == 0, 0.0, hh) / 6.0
        hh = (hh + h) % 1.0
        i = jnp.floor(hh * 6.0)
        f = hh * 6.0 - i
        p = v * (1 - sat)
        q = v * (1 - sat * f)
        t = v * (1 - sat * (1 - f))
        i = i.astype(jnp.int32) % 6

        def choose(opts):
            out = opts[5]
            for k in range(4, -1, -1):
                out = jnp.where(i == k, opts[k], out)
            return out

        r2 = choose([v, q, p, p, t, v])
        g2 = choose([t, v, v, q, p, p])
        b2 = choose([p, p, t, v, v, q])
        return jnp.stack([r2, g2, b2], axis=-1)

    ops = [brightness, contrast, saturation, hue]
    for step in range(4):
        img = jax.lax.switch(order[step], ops, img)
    return img


def apply_color_jitter_batch(images: Array, params: ColorJitterBatch) -> Array:
    """Jitter (B, H, W, 3) or (B, F, H, W, 3) images in [-0.5, 0.5]; each
    sample's parameter set is shared across its frames."""

    def per_sample(img, b, c, s, h, order):
        if img.ndim == 4:  # (F, H, W, 3)
            return jax.vmap(lambda f: _jitter_one(f, b, c, s, h, order))(img)
        return _jitter_one(img, b, c, s, h, order)

    out = jax.vmap(per_sample)(
        images + 0.5, params.brightness, params.contrast, params.saturation,
        params.hue, params.order,
    )
    return out - 0.5


def jitter_image_keys(batch: dict, rng: jax.Array) -> dict:
    """Apply one sampled jitter per batch element to every image key."""
    b = batch["keyframe"].shape[0]
    params = sample_color_jitter_batch(rng, b)
    out = dict(batch)
    for k in ("keyframe", "frames", "stereoframe"):
        if k in out and out[k] is not None:
            out[k] = apply_color_jitter_batch(out[k], params)
    return out
