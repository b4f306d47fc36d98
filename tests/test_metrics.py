"""Metric tests: hand-computed numpy oracles for the sparse family."""

import jax.numpy as jnp
import numpy as np

from monorec_tpu.metrics import METRICS, get_metric
from monorec_tpu.utils import median_scaling

B, H, W = 2, 8, 10
MAXD = 80.0


def _data(rng, with_mask=False):
    pred = rng.uniform(0.02, 0.3, (B, H, W, 1)).astype(np.float32)
    gt = rng.uniform(0.02, 0.3, (B, H, W, 1)).astype(np.float32)
    gt[rng.uniform(0, 1, gt.shape) > 0.5] = 0.0
    d = {"result": jnp.asarray(pred), "target": jnp.asarray(gt)}
    if with_mask:
        d["mvobj_mask"] = jnp.asarray(
            (rng.uniform(0, 1, (B, H, W, 1)) > 0.5).astype(np.float32)
        )
    return d, pred, gt


def _numpy_sparse_prep(pred, gt, max_distance):
    mask = (gt == 0) | (gt < 1 / max_distance)
    p = np.maximum(np.maximum(pred, 0), 1 / max_distance)
    g = np.maximum(np.maximum(gt, 0), 1 / max_distance)
    return 1 / p, 1 / g, mask


def test_abs_rel_sparse_matches_numpy():
    rng = np.random.default_rng(0)
    data, pred, gt = _data(rng)
    p, g, mask = _numpy_sparse_prep(pred, gt, MAXD)
    vals = np.abs(p - g) / g
    vals[mask] = 0
    expected = vals.sum() / (vals.size - mask.sum())
    got = float(get_metric("abs_rel_sparse_metric")(data, None, MAXD))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_a1_sparse_matches_numpy():
    rng = np.random.default_rng(1)
    data, pred, gt = _data(rng)
    p, g, mask = _numpy_sparse_prep(pred, gt, MAXD)
    ok = (np.maximum(g / p, p / g) < 1.25).astype(np.float32)
    ok[mask] = 0
    expected = ok.sum() / (ok.size - mask.sum())
    got = float(get_metric("a1_sparse_metric")(data, None, MAXD))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_rmse_sparse_matches_numpy():
    rng = np.random.default_rng(2)
    data, pred, gt = _data(rng)
    p, g, mask = _numpy_sparse_prep(pred, gt, MAXD)
    se = (p - g) ** 2
    se[mask] = 0
    per = np.sqrt(se.sum(axis=(1, 2, 3)) / (H * W - mask.sum(axis=(1, 2, 3))))
    got = float(get_metric("rmse_sparse_metric")(data, None, MAXD))
    np.testing.assert_allclose(got, per.mean(), rtol=1e-5)


def test_perfect_prediction_scores():
    rng = np.random.default_rng(3)
    gt = rng.uniform(0.02, 0.3, (B, H, W, 1)).astype(np.float32)
    data = {"result": jnp.asarray(gt), "target": jnp.asarray(gt)}
    assert float(get_metric("a1_sparse_metric")(data, None, MAXD)) == 1.0
    assert float(get_metric("abs_rel_sparse_metric")(data, None, MAXD)) == 0.0
    assert float(get_metric("rmse_sparse_metric")(data, None, MAXD)) == 0.0


def test_onlydynamic_restricts_to_mask():
    rng = np.random.default_rng(4)
    data, pred, gt = _data(rng, with_mask=True)
    full = float(get_metric("abs_rel_sparse_metric")(data, None, MAXD))
    dyn = float(get_metric("abs_rel_sparse_onlydynamic_metric")(data, None, MAXD))
    assert np.isfinite(dyn) and dyn != full


def test_roi_crop_applied():
    rng = np.random.default_rng(5)
    data, pred, gt = _data(rng)
    roi = (2, 6, 3, 8)
    got = float(get_metric("abs_rel_sparse_metric")(data, roi, MAXD))
    cropped = {
        "result": data["result"][:, 2:6, 3:8, :],
        "target": data["target"][:, 2:6, 3:8, :],
    }
    expected = float(get_metric("abs_rel_sparse_metric")(cropped, None, MAXD))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_median_scaling_normalizes_scale():
    rng = np.random.default_rng(6)
    gt = rng.uniform(0.05, 0.3, (B, H, W, 1)).astype(np.float32)
    pred = gt * 2.0  # prediction off by constant factor
    scaled = np.asarray(median_scaling(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(scaled, gt, rtol=1e-5)


def test_metric_registry_complete():
    expected = {
        "a1_metric", "a2_metric", "a3_metric", "rmse_metric", "rmse_log_metric",
        "abs_rel_metric", "sq_rel_metric", "sc_inv_metric", "l1_rel_metric",
        "l1_inv_metric", "completeness_metric", "covered_gt_metric",
    }
    for fam in ("a1", "a2", "a3", "rmse", "rmse_log", "abs_rel", "sq_rel"):
        expected.add(f"{fam}_sparse_metric")
        expected.add(f"{fam}_sparse_onlyvalid_metric")
        expected.add(f"{fam}_sparse_onlydynamic_metric")
    assert expected <= set(METRICS)
