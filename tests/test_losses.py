"""Loss kernel tests: hand-computed oracles + behavioral checks."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from monorec_tpu.losses import common as C
from monorec_tpu.losses import monorec_losses as M

B, H, W, FR = 2, 24, 32, 2


def _intrinsics():
    k = np.zeros((4, 4), np.float32)
    k[0, 0] = k[1, 1] = 30.0
    k[0, 2], k[1, 2] = W / 2 - 0.5, H / 2 - 0.5
    k[2, 2] = k[3, 3] = 1
    return k


def _data(rng, stereo=False):
    k = np.tile(_intrinsics(), (B, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, FR, 1, 1))
    poses[:, 0, 0, 3] = 0.2
    poses[:, 1, 0, 3] = -0.2
    d = {
        "keyframe": jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(np.float32)),
        "keyframe_pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))),
        "keyframe_intrinsics": jnp.asarray(k),
        "frames": jnp.asarray(rng.uniform(-0.5, 0.5, (B, FR, H, W, 3)).astype(np.float32)),
        "poses": jnp.asarray(poses),
        "intrinsics": jnp.asarray(np.tile(k[:, None], (1, FR, 1, 1))),
    }
    if stereo:
        sp = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        sp[:, 0, 3] = 0.54
        d["stereoframe"] = jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(np.float32))
        d["stereoframe_pose"] = jnp.asarray(sp)
        d["stereoframe_intrinsics"] = jnp.asarray(k)
    return d


def test_compute_errors_matches_torch_oracle():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (2, 12, 16, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (2, 12, 16, 3)).astype(np.float32)

    # torch oracle: .85*mean_c(ssim(zero-pad, gauss, comp)) + .15*mean_c(L1)
    ta, tb = [torch.from_numpy(x).permute(0, 3, 1, 2) for x in (a, b)]
    g = torch.tensor(
        [[0.0947, 0.1183, 0.0947], [0.1183, 0.1478, 0.1183], [0.0947, 0.1183, 0.0947]]
    )
    kern = g.repeat(3, 1, 1, 1)
    pad = torch.nn.ZeroPad2d(1)
    avg = lambda t: F.conv2d(t, kern, padding=0, groups=3)
    xp, yp = pad(ta), pad(tb)
    mx, my = avg(xp), avg(yp)
    sx = avg(xp * xp) - mx**2
    sy = avg(yp * yp) - my**2
    sxy = avg(xp * yp) - mx * my
    n = (2 * mx * my + 1e-4) * (2 * sxy + 9e-4)
    den = (mx**2 + my**2 + 1e-4) * (sx + sy + 9e-4)
    ssim_t = torch.clamp(1 - n / den, 0, 1) / 2
    ref = (0.85 * ssim_t.mean(1) + 0.15 * (ta - tb).abs().mean(1)).numpy()

    ours = np.asarray(C.compute_errors(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_sparse_depth_loss_hand_computed():
    pred = jnp.asarray(np.full((1, 2, 2, 1), 0.5, np.float32))
    gt = jnp.asarray(np.array([[[[0.0], [1.0]], [[2.0], [0.0]]]], np.float32))
    loss = C.sparse_depth_loss(pred, gt)
    np.testing.assert_allclose(float(loss), (0.5 + 1.5) / 2, rtol=1e-6)
    # all-invalid GT -> 0 (nan guarded)
    loss0 = C.sparse_depth_loss(pred, jnp.zeros_like(gt))
    assert float(loss0) == 0.0


def test_smoothness_prefers_smooth_depth():
    rng = np.random.default_rng(1)
    keyframe = jnp.asarray(np.zeros((1, H, W, 3), np.float32))
    smooth = jnp.ones((1, H, W, 1)) * 0.1
    rough = jnp.asarray(rng.uniform(0.05, 0.15, (1, H, W, 1)).astype(np.float32))
    l_smooth = float(C.edge_aware_smoothness_loss(smooth, keyframe))
    l_rough = float(C.edge_aware_smoothness_loss(rough, keyframe))
    assert l_smooth < 1e-8 < l_rough


def test_reprojection_loss_prefers_true_depth():
    """Plane at depth z0 seen by a translated camera: the reprojection loss at
    the true inverse depth must beat a wrong one."""
    z0, tx, fx = 8.0, 0.4, 30.0
    k = _intrinsics()
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")

    def tex(wx, wy):
        img = np.zeros((H, W, 3), np.float32)
        for c in range(3):
            img[..., c] = 0.4 * np.sin(wx * (c + 1)) * np.cos(wy * (c + 2) * 0.7)
        return img

    wx = (xs - k[0, 2]) / fx * z0
    wy = (ys - k[1, 2]) / fx * z0
    key = tex(wx, wy)
    frame = tex(wx + tx, wy)

    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = tx
    data = {
        "keyframe": jnp.asarray(key[None]),
        "keyframe_pose": jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        "keyframe_intrinsics": jnp.asarray(k[None]),
        "frames": jnp.asarray(frame[None, None]),
        "poses": jnp.asarray(pose[None, None]),
        "intrinsics": jnp.asarray(k[None, None]),
    }
    good = float(
        C.reprojection_loss(jnp.full((1, H, W, 1), 1 / z0), data, automasking=False)
    )
    bad = float(
        C.reprojection_loss(jnp.full((1, H, W, 1), 1 / (2 * z0)), data, automasking=False)
    )
    assert good < bad


def test_mask_loss_matches_torch_bce():
    rng = np.random.default_rng(2)
    gt = (rng.uniform(0, 1, (B, H, W, 1)) > 0.9).astype(np.float32)
    pred = rng.uniform(0.01, 0.99, (B, H, W, 1)).astype(np.float32)

    out = M.mask_loss({"mvobj_mask": jnp.asarray(gt), "cv_mask": jnp.asarray(pred)})

    r = 0.008109558
    w = np.where(gt > 0, 1 / r, 1 / (1 - r)).astype(np.float32)
    ref = F.binary_cross_entropy(
        torch.from_numpy(pred), torch.from_numpy(gt), weight=torch.from_numpy(w)
    ).item()
    np.testing.assert_allclose(float(out["loss"]), ref, rtol=1e-4)
    assert 0 <= float(out["acc"]) <= 1
    assert 0 <= float(out["iou"]) <= 1


def test_depth_loss_composition():
    rng = np.random.default_rng(3)
    data = _data(rng)
    gt = rng.uniform(0.01, 0.3, (B, H, W, 1)).astype(np.float32)
    gt[rng.uniform(0, 1, gt.shape) > 0.3] = 0.0
    data["target"] = jnp.asarray(gt)
    preds = [
        jnp.asarray(rng.uniform(0.01, 0.33, (B, H // s, W // s, 1)).astype(np.float32))
        for s in (1, 2, 4, 8)
    ]
    data["predicted_inverse_depths"] = preds

    out = M.depth_loss(data, alpha=0.5)
    total = float(out["loss"])
    manual = 2 * 0.5 * 4 * sum(
        float(out[f"sdl_{i}"]) for i in range(4)
    ) + 2 * 0.5 * sum(float(out[f"md2l_{i}"]) for i in range(4))
    np.testing.assert_allclose(total, manual, rtol=1e-5)
    assert np.isfinite(total)


def test_refinement_losses_run_and_are_finite():
    rng = np.random.default_rng(4)
    data = _data(rng, stereo=True)
    gt = rng.uniform(0.01, 0.3, (B, H, W, 1)).astype(np.float32)
    gt[rng.uniform(0, 1, gt.shape) > 0.3] = 0.0
    data["target"] = jnp.asarray(gt)
    data["cv_mask"] = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32))
    data["mvobj_mask"] = jnp.asarray(
        (rng.uniform(0, 1, (B, H, W, 1)) > 0.9).astype(np.float32)
    )
    data["inv_depth_min"] = jnp.float32(0.33)
    data["inv_depth_max"] = jnp.float32(0.0025)
    preds = lambda: [
        jnp.asarray(rng.uniform(0.01, 0.33, (B, H // s, W // s, 1)).astype(np.float32))
        for s in (1, 2, 4, 8)
    ]
    data["mono_pred"] = preds()
    data["stereo_pred"] = preds()

    out = M.mask_refinement_loss(data, options=("mask_loss",))
    assert np.isfinite(float(out["loss"]))
    out = M.depth_refinement_loss(data, options=("stereo", "stereo_repr"))
    assert np.isfinite(float(out["loss"]))
    out = M.depth_aux_mask_loss(data)
    assert np.isfinite(float(out["loss"]))


def test_batched_scale_reprojection_equals_per_scale():
    """The refinement losses run all 4 scales through ONE batched
    reprojection pass (scale-major stacking via tile_batch_for_scales).
    Pin that formulation — value AND gradient — against independent
    per-scale reprojection_loss calls, for both branch configurations the
    refinement losses use (mono+stereo automasked min; stereo-only
    border=3)."""
    rng = np.random.default_rng(5)
    data = _data(rng, stereo=True)
    preds = [
        jnp.asarray(rng.uniform(0.05, 0.33, (B, H, W, 1)).astype(np.float32))
        for _ in range(4)
    ]
    s = len(preds)
    tiled = C.tile_batch_for_scales(data, s)

    def batched(stacked, **kw):
        out = C.reprojection_loss(stacked, tiled, reduce=False,
                                  combine_frames="min", **kw)
        return out.reshape(s, B, H, W)

    for kw in (
        dict(use_mono=True, use_stereo=True, automasking=True,
             automask_errors=jnp.tile(
                 C.identity_reprojection_errors(data, use_mono=True,
                                                use_stereo=True),
                 (s, 1, 1, 1))),
        dict(use_mono=False, use_stereo=True, automasking=False, border=3),
    ):
        stacked = jnp.concatenate(preds, axis=0)
        maps = batched(stacked, **kw)
        kw_single = {k: v for k, v in kw.items() if k != "automask_errors"}
        for i, p in enumerate(preds):
            single = C.reprojection_loss(
                p, data, reduce=False, combine_frames="min", **kw_single
            )
            np.testing.assert_allclose(
                np.asarray(maps[i]), np.asarray(single), rtol=1e-5, atol=1e-6
            )

        # Gradient parity: sum of per-scale masked means (how the
        # refinement losses consume the reshaped maps).
        def red(e):
            inv = jnp.isinf(e)
            return C.mask_mean(jnp.where(inv, 0.0, e), inv)

        g_b = jax.grad(
            lambda st: sum(red(m) for m in batched(st, **kw))
        )(stacked)
        g_s = jnp.concatenate(
            [
                jax.grad(
                    lambda p: red(C.reprojection_loss(
                        p, data, reduce=False, combine_frames="min",
                        **kw_single))
                )(p)
                for p in preds
            ],
            axis=0,
        )
        np.testing.assert_allclose(
            np.asarray(g_b), np.asarray(g_s), rtol=1e-4, atol=1e-6
        )


def test_refinement_loss_gradients_finite_and_nonzero():
    """Gradients of both refinement losses w.r.t. the mono predictions
    flow (finite, not identically zero) through the batched-scale path."""
    rng = np.random.default_rng(6)
    data = _data(rng, stereo=True)
    gt = rng.uniform(0.01, 0.3, (B, H, W, 1)).astype(np.float32)
    gt[rng.uniform(0, 1, gt.shape) > 0.3] = 0.0
    data["target"] = jnp.asarray(gt)
    data["cv_mask"] = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32))
    data["mvobj_mask"] = jnp.asarray(
        (rng.uniform(0, 1, (B, H, W, 1)) > 0.9).astype(np.float32)
    )
    data["inv_depth_min"] = jnp.float32(0.33)
    data["inv_depth_max"] = jnp.float32(0.0025)
    preds = lambda: [
        jnp.asarray(rng.uniform(0.01, 0.33, (B, H // s, W // s, 1)).astype(np.float32))
        for s in (1, 2, 4, 8)
    ]
    data["stereo_pred"] = preds()

    for fn, opts in (
        (M.mask_refinement_loss, ("mask_loss",)),
        (M.depth_refinement_loss, ("stereo", "stereo_repr")),
    ):
        grads = jax.grad(
            lambda mp: fn({**data, "mono_pred": mp}, options=opts)["loss"]
        )(preds())
        for g in grads:
            a = np.asarray(g)
            assert np.isfinite(a).all()
            assert np.abs(a).max() > 0
