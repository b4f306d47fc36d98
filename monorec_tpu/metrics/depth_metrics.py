"""Depth evaluation metrics.

Counterparts of the reference metric families
(``model/metric_functions/{sparse_metrics,dense_metrics,completeness_metrics}.py``):

* dense a1/a2/a3, rmse, rmse_log, abs_rel, sq_rel over every pixel;
* ``*_sparse_metric`` variants masking invalid GT (gt==0 or beyond
  max_distance), with ``_onlyvalid`` (additionally pred==0 masked) and
  ``_onlydynamic`` (restricted to the moving-object mask) families;
* sc_inv / l1_rel / l1_inv dense metrics and completeness / covered_gt.

All metrics consume **inverse** depth for both prediction and GT and convert
via relu -> clamp_min(1/max_distance) -> reciprocal, matching the reference
pipeline (``utils/util.py:46-65``). Signature: ``metric(data, roi,
max_distance) -> scalar`` with ``data["result"]`` / ``data["target"]`` NHWC.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from monorec_tpu.utils import (
    get_absolute_depth,
    get_mask,
    get_positive_depth,
    mask_mean,
    preprocess_roi,
)

Array = jax.Array


def _prep_dense(data, roi, max_distance):
    pred, gt = preprocess_roi(data["result"], data["target"], roi)
    pred, gt = get_positive_depth(pred, gt)
    return get_absolute_depth(pred, gt, max_distance)


def _prep_sparse(data, roi, max_distance, pred_all_valid=True, use_cvmask=False):
    pred, gt = preprocess_roi(data["result"], data["target"], roi)
    mask = get_mask(pred, gt, max_distance=max_distance, pred_all_valid=pred_all_valid)
    if use_cvmask:
        mask = mask | ~(data["mvobj_mask"] > 0.5)
    pred, gt = get_positive_depth(pred, gt)
    pred, gt = get_absolute_depth(pred, gt, max_distance)
    # Fill masked entries with 1 so ratios/logs stay finite; mask_mean
    # excludes them from every reduction anyway.
    pred = jnp.where(mask, 1.0, pred)
    gt = jnp.where(mask, 1.0, gt)
    return pred, gt, mask


def _thresh_ratio(pred, gt):
    return jnp.maximum(gt / pred, pred / gt)


# --- dense family ---------------------------------------------------------


def _dense(fn):
    def metric(data, roi=None, max_distance=None):
        pred, gt = _prep_dense(data, roi, max_distance)
        return fn(pred, gt)

    return metric


a1_metric = _dense(lambda p, g: jnp.mean((_thresh_ratio(p, g) < 1.25).astype(jnp.float32)))
a2_metric = _dense(lambda p, g: jnp.mean((_thresh_ratio(p, g) < 1.25**2).astype(jnp.float32)))
a3_metric = _dense(lambda p, g: jnp.mean((_thresh_ratio(p, g) < 1.25**3).astype(jnp.float32)))
rmse_metric = _dense(
    lambda p, g: jnp.mean(jnp.sqrt(jnp.mean((p - g) ** 2, axis=(1, 2, 3))))
)
rmse_log_metric = _dense(
    lambda p, g: jnp.mean(
        jnp.sqrt(jnp.mean((jnp.log(p) - jnp.log(g)) ** 2, axis=(1, 2, 3)))
    )
)
abs_rel_metric = _dense(lambda p, g: jnp.mean(jnp.abs(p - g) / g))
sq_rel_metric = _dense(lambda p, g: jnp.mean((p - g) ** 2 / g))


# --- sparse family --------------------------------------------------------


def _sparse(base):
    def metric(data, roi=None, max_distance=None, pred_all_valid=True, use_cvmask=False):
        pred, gt, mask = _prep_sparse(data, roi, max_distance, pred_all_valid, use_cvmask)
        return base(pred, gt, mask)

    return metric


def _a_base(t):
    def base(pred, gt, mask):
        ok = (_thresh_ratio(pred, gt) < t).astype(jnp.float32)
        return mask_mean(jnp.where(mask, 0.0, ok), mask)

    return base


def _rmse_base(pred, gt, mask):
    se = (pred - gt) ** 2
    return jnp.mean(jnp.sqrt(mask_mean(se, mask, axis=(1, 2, 3))))


def _rmse_log_base(pred, gt, mask):
    sle = (jnp.log(pred) - jnp.log(gt)) ** 2
    return jnp.mean(jnp.sqrt(mask_mean(sle, mask, axis=(1, 2, 3))))


def _abs_rel_base(pred, gt, mask):
    return mask_mean(jnp.abs(pred - gt) / gt, mask)


def _sq_rel_base(pred, gt, mask):
    return mask_mean((pred - gt) ** 2 / gt, mask)


a1_sparse_metric = _sparse(_a_base(1.25))
a2_sparse_metric = _sparse(_a_base(1.25**2))
a3_sparse_metric = _sparse(_a_base(1.25**3))
rmse_sparse_metric = _sparse(_rmse_base)
rmse_log_sparse_metric = _sparse(_rmse_log_base)
abs_rel_sparse_metric = _sparse(_abs_rel_base)
sq_rel_sparse_metric = _sparse(_sq_rel_base)


def _onlyvalid(sparse_fn):
    def metric(data, roi=None, max_distance=None):
        return sparse_fn(data, roi, max_distance, pred_all_valid=False)

    return metric


def _onlydynamic(sparse_fn):
    def metric(data, roi=None, max_distance=None):
        return sparse_fn(data, roi, max_distance, use_cvmask=True)

    return metric


a1_sparse_onlyvalid_metric = _onlyvalid(a1_sparse_metric)
a2_sparse_onlyvalid_metric = _onlyvalid(a2_sparse_metric)
a3_sparse_onlyvalid_metric = _onlyvalid(a3_sparse_metric)
rmse_sparse_onlyvalid_metric = _onlyvalid(rmse_sparse_metric)
rmse_log_sparse_onlyvalid_metric = _onlyvalid(rmse_log_sparse_metric)
abs_rel_sparse_onlyvalid_metric = _onlyvalid(abs_rel_sparse_metric)
sq_rel_sparse_onlyvalid_metric = _onlyvalid(sq_rel_sparse_metric)

a1_sparse_onlydynamic_metric = _onlydynamic(a1_sparse_metric)
a2_sparse_onlydynamic_metric = _onlydynamic(a2_sparse_metric)
a3_sparse_onlydynamic_metric = _onlydynamic(a3_sparse_metric)
rmse_sparse_onlydynamic_metric = _onlydynamic(rmse_sparse_metric)
rmse_log_sparse_onlydynamic_metric = _onlydynamic(rmse_log_sparse_metric)
abs_rel_sparse_onlydynamic_metric = _onlydynamic(abs_rel_sparse_metric)
sq_rel_sparse_onlydynamic_metric = _onlydynamic(sq_rel_sparse_metric)


# --- dense_metrics.py family ----------------------------------------------


def sc_inv_metric(data, roi=None, max_distance=None):
    pred, gt = _prep_dense(data, roi, max_distance)
    n = gt.shape[1] * gt.shape[2]
    e = jnp.log(pred) - jnp.log(gt)
    e = jnp.where(jnp.isnan(e), 0.0, e)
    per = jnp.sqrt(
        jnp.sum(e**2, axis=(1, 2, 3)) / n - (jnp.sum(e, axis=(1, 2, 3)) ** 2) / n**2
    )
    per = jnp.where(jnp.isnan(per), 0.0, per)
    return jnp.mean(per)


def l1_rel_metric(data, roi=None, max_distance=None):
    pred, gt = _prep_dense(data, roi, max_distance)
    return jnp.mean(jnp.abs(pred - gt) / gt)


def l1_inv_metric(data, roi=None, max_distance=None):
    pred, gt = preprocess_roi(data["result"], data["target"], roi)
    pred, gt = get_positive_depth(pred, gt)
    return jnp.mean(jnp.abs(pred - gt))


# --- completeness ----------------------------------------------------------


def completeness_metric(data, roi=None, max_distance=None):
    return jnp.mean((data["result"] != 0).astype(jnp.float32))


def covered_gt_metric(data, roi=None, max_distance=None):
    gt_valid = data["target"] != 0
    covered = (data["result"] != 0).astype(jnp.float32)
    return mask_mean(jnp.where(gt_valid, 0.0, covered), gt_valid)


METRICS: Dict[str, Callable] = {
    name: fn
    for name, fn in list(globals().items())
    if name.endswith("_metric") and callable(fn)
}

# Factory-made metrics must carry their registry name: trainers key TB tags
# and the monitor metric on ``fn.__name__``.
for _name, _fn in METRICS.items():
    _fn.__name__ = _name


def get_metric(name: str) -> Callable:
    if name not in METRICS:
        raise KeyError(f"unknown metric '{name}'; available: {sorted(METRICS)}")
    return METRICS[name]
