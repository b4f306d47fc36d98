"""General grid-sample Pallas kernel (interpret mode): forward parity vs
the XLA gather path and analytic coordinate-gradient parity vs autodiff
through it — the TPU path that removes the reprojection losses' serial
gathers (413 ms of a 612 ms train step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monorec_tpu.ops.sampling import bilinear_sample, grid_sample_nhwc

N, H, W, C = 2, 32, 128, 3


def _normalize(x_pix, size):
    return (2.0 * x_pix + 1.0) / size - 1.0


def _grids(kind, seed=0):
    """Normalized (N, H, W, 2) grids; fractional offsets avoid the
    measure-zero integer points where the bilinear subgradient is ambiguous."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    if kind == "smooth":
        dx = 3.3 + 2.0 * np.sin(ys / 7.0)
        dy = -1.7 + np.cos(xs / 11.0)
    elif kind == "edge":
        # depth-discontinuity profile: dx jumps by ~20 px mid-image
        dx = np.where(ys > H // 2, 22.4, 1.3) + 0.1 * np.sin(xs / 5.0)
        dy = np.full_like(xs, 0.6)
    elif kind == "outside":
        dx = np.where(xs < W // 4, -200.0, 5.4)
        dy = np.where(ys < H // 4, 300.0, -0.8)
    elif kind == "random":
        dx = rng.uniform(-6, 6, (H, W)).astype(np.float32) + 0.27
        dy = rng.uniform(-4, 4, (H, W)).astype(np.float32) + 0.13
    x = np.stack([_normalize(xs + dx, W), _normalize(ys + dy, H)], axis=-1)
    out = np.tile(x[None], (N, 1, 1, 1))
    out[1, ..., 0] += 2.0 / W  # decorrelate the two batch elements
    return jnp.asarray(out)


@pytest.mark.parametrize("kind", ["smooth", "edge", "random"])
def test_grid_warp_matches_xla_gather(kind):
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(-0.5, 0.5, (N, H, W, C)).astype(np.float32))
    grids = _grids(kind)
    ref = grid_sample_nhwc(imgs, grids, backend="xla")
    got = grid_sample_nhwc(imgs, grids, backend="tpu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_grid_warp_out_of_image_zeros():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(0.1, 0.9, (N, H, W, C)).astype(np.float32))
    grids = _grids("outside")
    ref = grid_sample_nhwc(imgs, grids, backend="xla")
    got = grid_sample_nhwc(imgs, grids, backend="tpu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    # The far-out region really is zero.
    assert float(jnp.max(jnp.abs(got[:, : H // 4 - 1, : W // 4 - 1]))) == 0.0


@pytest.mark.parametrize("kind", ["smooth", "edge", "random"])
def test_grid_warp_coordinate_gradient_matches_autodiff(kind):
    """The analytic VJP kernel equals autodiff through the gather path."""
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(-0.5, 0.5, (N, H, W, C)).astype(np.float32))
    grids = _grids(kind)
    cot = jnp.asarray(rng.uniform(-1, 1, (N, H, W, C)).astype(np.float32))

    def loss(g, backend, interpret=False):
        return jnp.sum(
            grid_sample_nhwc(imgs, g, backend=backend, interpret=interpret)
            * cot
        )

    g_ref = jax.grad(lambda g: loss(g, "xla"))(grids)
    g_tpu = jax.grad(lambda g: loss(g, "tpu", True))(grids)
    np.testing.assert_allclose(
        np.asarray(g_tpu), np.asarray(g_ref), atol=2e-4, rtol=1e-4
    )


def test_grid_warp_gradient_at_integer_fractions():
    """At exactly-integer sample positions the bilinear subgradient follows
    the reference convention (wx1 = x - x0, derivative ±1) — the hat
    |.|-based form would return 0 there. Caught by the compiled on-chip
    check before this pinned it."""
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.uniform(-0.5, 0.5, (N, H, W, C)).astype(np.float32))
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    # integer dx everywhere; dy has a fractional row stripe for mixture
    dx = np.where(xs < W // 2, 3.0, -2.0)
    dy = np.where(ys % 3 == 0, 1.0, 0.25)
    grids = jnp.asarray(
        np.tile(
            np.stack([_normalize(xs + dx, W), _normalize(ys + dy, H)], -1)[None],
            (N, 1, 1, 1),
        )
    )
    cot = jnp.asarray(rng.uniform(-1, 1, (N, H, W, C)).astype(np.float32))

    def loss(g, backend, interpret=False):
        return jnp.sum(
            grid_sample_nhwc(imgs, g, backend=backend, interpret=interpret)
            * cot
        )

    g_ref = jax.grad(lambda g: loss(g, "xla"))(grids)
    g_tpu = jax.grad(lambda g: loss(g, "tpu", True))(grids)
    np.testing.assert_allclose(
        np.asarray(g_tpu), np.asarray(g_ref), atol=2e-4, rtol=1e-4
    )


def test_grid_warp_wide_channel_grouping():
    """Wide tensors (D=32 cost volumes under mask augmentation) fold channel
    groups into the batch dim — values must match the gather path exactly."""
    rng = np.random.default_rng(8)
    wide = jnp.asarray(rng.uniform(-1, 1, (N, H, W, 32)).astype(np.float32))
    grids = _grids("smooth")
    ref = grid_sample_nhwc(wide, grids, backend="xla")
    got = grid_sample_nhwc(wide, grids, backend="tpu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_mask_aug_resized_crop_tpu_path_matches_xla():
    """MaskAugmentation's resized-crop sampling agrees between backends
    (it routes backend="auto"; forced here for the CPU suite)."""
    import monorec_tpu.models.augmentation as aug
    import monorec_tpu.ops.sampling as sampling

    rng = np.random.default_rng(9)
    imgs = jnp.asarray(rng.uniform(-0.5, 0.5, (N, H, W, 3)).astype(np.float32))
    params = aug.sample_mask_aug_params(jax.random.PRNGKey(2), N, H, W)

    ref = aug.apply_mask_aug(imgs, params)
    orig = aug.grid_sample_nhwc

    def forced(images, grids, backend="xla", interpret=False):
        return sampling.grid_sample_nhwc(
            images, grids, backend="tpu", interpret=True
        )

    aug.grid_sample_nhwc = forced
    try:
        got = aug.apply_mask_aug(imgs, params)
    finally:
        aug.grid_sample_nhwc = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_grid_warp_image_cotangent_is_zero():
    """Image gradients are intentionally zero (frames are data): autodiff
    through the TPU path must not produce NaNs or nonzero image grads."""
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.uniform(-0.5, 0.5, (N, H, W, C)).astype(np.float32))
    grids = _grids("smooth")
    g_img = jax.grad(
        lambda im: jnp.sum(
            grid_sample_nhwc(im, grids, backend="tpu", interpret=True) ** 2
        )
    )(imgs)
    assert np.all(np.asarray(g_img) == 0.0)


def test_grid_warp_coverage_counter():
    """Within-column displacement spread beyond the residual window is
    reported, not silently mis-sampled (the loss then sees 0 = invalid)."""
    from monorec_tpu.ops.pallas.grid_warp import R_MAX, grid_warp

    rng = np.random.default_rng(5)
    imgs = jnp.asarray(
        rng.uniform(0.1, 0.9, (1, C, H, W)).astype(np.float32)
    )
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    # A within-column jump just past the residual window, kept IN-IMAGE
    # (out-of-image pixels are legitimately zero and must not count): the
    # per-lane shear cannot absorb an across-row spread, so these taps
    # exceed the window and must be reported.
    jump = R_MAX + 12.4
    in_img = xs < W - (R_MAX + 14)
    dx = np.where((ys > H // 2) & (ys <= H // 2 + 4) & in_img, jump, 0.3)
    x = jnp.asarray((xs + dx)[None])
    y = jnp.asarray((ys + 0.2)[None])
    _, cov = grid_warp(imgs, x, y, interpret=True)
    assert float(cov[0]) > 0.0


def test_reprojection_loss_tpu_path_matches_xla():
    """The whole reprojection loss agrees between sampler backends on a
    realistic batch (same geometry both ways; only the sampler differs)."""
    from monorec_tpu.losses.common import reprojection_loss
    import monorec_tpu.ops.sampling as sampling

    rng = np.random.default_rng(6)
    b, h, w = 1, 32, 128
    k = np.zeros((4, 4), np.float32)
    k[0, 0] = k[1, 1] = 0.8 * w
    k[0, 2], k[1, 2] = w / 2 - 0.5, h / 2 - 0.5
    k[2, 2] = k[3, 3] = 1.0
    poses = np.tile(np.eye(4, dtype=np.float32), (b, 2, 1, 1))
    poses[:, 0, 0, 3] = 0.15
    poses[:, 1, 0, 3] = -0.15
    data = {
        "keyframe": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, h, w, 3)).astype(np.float32)
        ),
        "keyframe_pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))),
        "keyframe_intrinsics": jnp.asarray(np.tile(k, (b, 1, 1))),
        "frames": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 2, h, w, 3)).astype(np.float32)
        ),
        "poses": jnp.asarray(poses),
        "intrinsics": jnp.asarray(np.tile(k[None], (b, 2, 1, 1))),
    }
    inv_depth = jnp.asarray(
        rng.uniform(0.05, 0.3, (b, h, w, 1)).astype(np.float32)
    )

    r_xla = reprojection_loss(inv_depth, data, automasking=True)

    # The loss's hot path is grid_sample_planar (losses/common.py
    # ``_warp_by_depth_planar``); force ITS kernel path — patching the NHWC
    # wrapper alone would leave every call on the XLA gather path and make
    # the assertions below vacuous.
    orig = sampling.grid_sample_planar
    calls = []

    def forced(images, grids, backend="xla", **kw):
        kw.pop("interpret", None)
        calls.append(images.shape)
        return orig(images, grids, backend="tpu", interpret=True, **kw)


    from monorec_tpu.losses import common as common_mod
    from monorec_tpu.precision import precision_policy, set_precision

    def set_policy(name):
        # Each loss call below retraces after the switch, so the
        # stale-trace warning doesn't apply to this pattern.
        set_precision(name, expect_rebuild=True)

    common_mod.grid_sample_planar, sampling.grid_sample_planar = forced, forced
    prev_policy = precision_policy()
    try:
        # bf16 source quantization (the serving policy): ~2^-8 relative drift.
        set_policy("serving")
        r_bf16, cov = reprojection_loss(
            inv_depth, data, automasking=True, with_coverage=True
        )
        assert calls, "loss never routed through the forced kernel sampler"
        n_kernel_calls = len(calls)
        # Exact-parity mode must match the XLA gather path to fp tolerance.
        set_policy("exact")
        r_f32 = reprojection_loss(inv_depth, data, automasking=True)
        assert len(calls) > n_kernel_calls
    finally:
        set_policy(prev_policy)
        common_mod.grid_sample_planar, sampling.grid_sample_planar = orig, orig
    np.testing.assert_allclose(float(r_f32), float(r_xla), atol=1e-5)
    np.testing.assert_allclose(float(r_bf16), float(r_xla), atol=2e-3)
    assert float(cov) == 0.0  # smooth in-range depths: fully covered


@pytest.mark.parametrize("kind", ["smooth", "edge"])
def test_grid_warp_jac_matches_separate_passes(kind):
    """The fused Jacobian forward equals the plain forward, and its planes
    contracted with a cotangent equal the standalone gradient pass."""
    from monorec_tpu.ops.pallas.grid_warp import (
        grid_warp,
        grid_warp_grad,
        grid_warp_jac,
    )

    rng = np.random.default_rng(11)
    imgs = jnp.asarray(
        np.moveaxis(
            rng.uniform(-0.5, 0.5, (N, H, W, C)).astype(np.float32), -1, 1
        )
    )
    grids = _grids(kind)
    xs = (np.asarray(grids[..., 0]) + 1.0) * W / 2.0 - 0.5
    ys = (np.asarray(grids[..., 1]) + 1.0) * H / 2.0 - 0.5
    xs, ys = jnp.asarray(xs), jnp.asarray(ys)
    cot = jnp.asarray(rng.uniform(-1, 1, (N, C, H, W)).astype(np.float32))

    ref, cov_ref = grid_warp(imgs, xs, ys, interpret=True)
    (out, jx, jy), cov = grid_warp_jac(imgs, xs, ys, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_ref), atol=0)

    gx_ref, gy_ref = grid_warp_grad(imgs, xs, ys, cot, interpret=True)
    gx = jnp.sum(cot * jx, axis=1)
    gy = jnp.sum(cot * jy, axis=1)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), atol=2e-5)
