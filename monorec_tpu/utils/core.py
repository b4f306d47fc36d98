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
