"""Geometry primitive tests: inverse correctness, projection round-trip, and
normalization parity with the reference conventions."""

import jax.numpy as jnp
import numpy as np

from monorec_tpu import geometry


def _intrinsics(fx, fy, cx, cy):
    k = np.zeros((4, 4), dtype=np.float32)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = fx, fy, cx, cy
    k[2, 2] = k[3, 3] = 1.0
    return k


def _random_pose(rng):
    # Random rotation via QR, determinant fixed to +1.
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = q
    pose[:3, 3] = rng.standard_normal(3)
    return pose


def test_invert_pose_matches_numpy():
    rng = np.random.default_rng(0)
    pose = _random_pose(rng)
    inv = np.asarray(geometry.invert_pose(jnp.asarray(pose)))
    np.testing.assert_allclose(inv, np.linalg.inv(pose), rtol=1e-5, atol=1e-5)


def test_invert_intrinsics_matches_numpy():
    k = _intrinsics(350.0, 360.0, 255.5, 127.0)
    inv = np.asarray(geometry.invert_intrinsics(jnp.asarray(k)))
    np.testing.assert_allclose(inv, np.linalg.inv(k), rtol=1e-5, atol=1e-6)


def test_identity_warp_projects_to_pixel_centers():
    """Backproject + project with identity transform must land on the
    reference normalization: g = 2*u/(S-1) - 1 for pixel index u."""
    h, w = 6, 9
    k = jnp.asarray(_intrinsics(10.0, 11.0, 4.0, 2.5))
    inv_k = geometry.invert_intrinsics(k)
    depths = jnp.full((2, h, w), 5.0)
    pts = geometry.backproject(depths, inv_k, h, w)
    grid = geometry.project(pts, k, jnp.eye(4), h, w)

    xs = 2 * np.arange(w) / (w - 1) - 1
    ys = 2 * np.arange(h) / (h - 1) - 1
    gx, gy = np.meshgrid(xs, ys)
    expected = np.stack([gx, gy], axis=-1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(grid[0]), expected, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grid[1]), expected, rtol=1e-4, atol=1e-4)


def test_pure_translation_shifts_projection():
    """A camera translated by +x sees points shifted by -fx*tx/z pixels."""
    h, w = 8, 8
    fx = 20.0
    k = jnp.asarray(_intrinsics(fx, fx, 3.5, 3.5))
    inv_k = geometry.invert_intrinsics(k)
    z = 4.0
    depths = jnp.full((1, h, w), z)
    pts = geometry.backproject(depths, inv_k, h, w)

    t = np.eye(4, dtype=np.float32)
    tx = 0.5
    t[0, 3] = tx  # key-cam -> source-cam translation
    grid = np.asarray(geometry.project(pts, k, jnp.asarray(t), h, w))

    # Pixel shift in normalized units: du = fx*tx/z; g-space du * 2/(w-1).
    du = fx * tx / z * 2 / (w - 1)
    base = 2 * np.arange(w) / (w - 1) - 1
    np.testing.assert_allclose(grid[0, 0, :, 0], base + du, rtol=1e-4, atol=1e-4)


def test_depth_hypotheses_far_to_near():
    d = np.asarray(geometry.depth_hypotheses(0.0025, 0.33, 32))
    assert d.shape == (32,)
    np.testing.assert_allclose(d[0], 400.0, rtol=1e-5)
    np.testing.assert_allclose(d[-1], 1 / 0.33, rtol=1e-5)
    assert np.all(np.diff(d) < 0)
    # Linear in inverse depth.
    np.testing.assert_allclose(np.diff(1 / d), np.diff(1 / d)[0], rtol=1e-4)
