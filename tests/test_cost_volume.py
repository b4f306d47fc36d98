"""Plane-sweep cost volume parity vs an independent torch oracle.

The oracle follows the reference semantics (monorec_model.py:150-284) but is
written independently against torch primitives; agreement between two
independent implementations pins the numerics.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from monorec_tpu.geometry import depth_hypotheses
from monorec_tpu.ops.cost_volume import CostVolumeConfig, compute_cost_volume

H, W, D = 32, 48, 8
ALPHA = 10.0
CW = np.array([5 / 32, 16 / 32, 11 / 32], dtype=np.float32)


def _intrinsics(fx, fy, cx, cy):
    k = np.zeros((4, 4), dtype=np.float32)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = fx, fy, cx, cy
    k[2, 2] = k[3, 3] = 1.0
    return k


def _torch_ssim_default(x, y):
    pad = torch.nn.ReflectionPad2d(1)
    x, y = pad(x), pad(y)
    avg = lambda t: F.avg_pool2d(t, 3, 1)
    mu_x, mu_y = avg(x), avg(y)
    sx = avg(x * x) - mu_x**2
    sy = avg(y * y) - mu_y**2
    sxy = avg(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 1e-4) * (2 * sxy + 9e-4)
    d = (mu_x**2 + mu_y**2 + 1e-4) * (sx + sy + 9e-4)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def _torch_cost_volume(
    keyframe, key_k, key_pose, frames, ks, poses, depths, use_ssim=1
):
    """Oracle. keyframe: (3,H,W) torch; frames: list of (3,H,W); depths: (D,).

    ``use_ssim`` follows the reference branches (monorec_model.py:227-243):
    1 -> SSIM, 2 -> 0.85*SSIM + 0.15*L1, 0 -> raw L1, else -> 3x3 avg-pooled
    L1.
    """
    h, w = keyframe.shape[-2:]
    d_steps = depths.shape[0]
    ys, xs = torch.meshgrid(
        torch.arange(h, dtype=torch.float32),
        torch.arange(w, dtype=torch.float32),
        indexing="ij",
    )
    coord = torch.stack([xs.reshape(-1), ys.reshape(-1), torch.ones(h * w)], 0)

    inv_k = torch.inverse(key_k)
    rays = inv_k[:3, :3] @ coord  # (3, HW)
    cam = depths.view(d_steps, 1, 1) * rays.unsqueeze(0)  # (D,3,HW)
    cam = torch.cat([cam, torch.ones(d_steps, 1, h * w)], dim=1)  # (D,4,HW)

    border = torch.zeros(1, 1, h, w)
    border[:, :, 2:-2, 2:-2] = 1.0

    sads, valids = [], []
    for frame, k, pose in zip(frames, ks, poses):
        t = torch.inverse(pose) @ key_pose
        proj = (k @ t)[:3, :]
        pc = torch.einsum("ij,djn->din", proj, cam)
        xy = pc[:, :2, :] / (pc[:, 2:3, :] + 1e-7)
        xy[:, 0, :] /= w - 1
        xy[:, 1, :] /= h - 1
        grid = (
            ((xy - 0.5) * 2).clamp(-2, 2).view(d_steps, 2, h, w).permute(0, 2, 3, 1)
        )

        warped = F.grid_sample(
            frame.unsqueeze(0).expand(d_steps, -1, -1, -1), grid, align_corners=False
        )
        wb = F.grid_sample(
            border.expand(d_steps, -1, -1, -1), grid, align_corners=False
        )
        valid = border[0] * torch.min(wb != 0, dim=0)[0]  # (1,H,W)

        key_e = keyframe.unsqueeze(0).expand(d_steps, -1, -1, -1)
        if use_ssim == 1:
            diff = _torch_ssim_default(warped + 0.5, key_e + 0.5)
        elif use_ssim == 2:
            diff = 0.85 * _torch_ssim_default(warped + 0.5, key_e + 0.5) + (
                0.15 * torch.abs(warped - key_e)
            )
        elif use_ssim == 0:
            diff = torch.abs(warped - key_e)
        else:
            diff = F.avg_pool2d(
                torch.abs(warped - key_e), kernel_size=3, stride=1, padding=1
            )
        weighted = torch.einsum("dchw,c->dhw", diff, torch.from_numpy(CW)) / 9.0
        sad = F.conv2d(
            weighted.unsqueeze(1), torch.ones(1, 1, 3, 3), padding=1
        ).squeeze(1)  # (D,H,W)
        sads.append(sad)
        valids.append(valid)

    sads = torch.stack(sads)  # (F,D,H,W)
    valids = torch.stack(valids)  # (F,1,H,W)
    sfcv = (1 - 2 * sads) * valids

    sharp = torch.exp(-ALPHA * (sads - sads.min(dim=1, keepdim=True)[0]) ** 2)
    weight = (1 - (sharp.sum(dim=1, keepdim=True) - 1) / (d_steps - 1)) * valids

    fused = (sads * weight).sum(dim=0)
    wsum = weight.sum(dim=0).squeeze(0)
    nz = wsum > 0
    fused[:, nz] /= wsum[nz]
    fused = 1 - 2 * fused
    fused[:, ~nz] = 0
    return fused, sfcv


@pytest.mark.parametrize(
    "seed,use_ssim", [(0, 1), (1, 1), (0, 2), (0, 0), (0, -1)]
)
def test_cost_volume_matches_torch_oracle(seed, use_ssim):
    rng = np.random.default_rng(seed)
    key = rng.uniform(-0.5, 0.5, (H, W, 3)).astype(np.float32)
    frames = rng.uniform(-0.5, 0.5, (2, H, W, 3)).astype(np.float32)
    k = _intrinsics(30.0, 30.0, W / 2 - 0.5, H / 2 - 0.5)

    key_pose = np.eye(4, dtype=np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[0][0, 3] = 0.3
    poses[1][0, 3] = -0.3
    poses[1][2, 3] = 0.1

    depths = np.asarray(depth_hypotheses(0.0025, 0.33, D))

    fused, sfcv = compute_cost_volume(
        jnp.asarray(key[None]),
        jnp.asarray(k[None]),
        jnp.asarray(key_pose[None]),
        jnp.asarray(frames[None]),
        jnp.asarray(np.stack([k, k])[None]),
        jnp.asarray(poses[None]),
        jnp.float32(0.0025),
        jnp.float32(0.33),
        CostVolumeConfig(depth_steps=D, use_ssim=use_ssim),
    )

    t_fused, t_sfcv = _torch_cost_volume(
        torch.from_numpy(key).permute(2, 0, 1),
        torch.from_numpy(k),
        torch.from_numpy(key_pose),
        [torch.from_numpy(f).permute(2, 0, 1) for f in frames],
        [torch.from_numpy(k), torch.from_numpy(k)],
        [torch.from_numpy(p) for p in poses],
        torch.from_numpy(depths),
        use_ssim=use_ssim,
    )

    np.testing.assert_allclose(
        np.asarray(fused[0]), t_fused.permute(1, 2, 0).numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(sfcv[0]),
        t_sfcv.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3,
        atol=2e-4,
    )


def test_cost_volume_peaks_at_true_depth():
    """Synthetic textured plane at a hypothesis depth: the fused CV must peak
    (max value) at that hypothesis for interior pixels."""
    rng = np.random.default_rng(3)
    depths = np.asarray(depth_hypotheses(0.0025, 0.33, D))
    true_d = float(depths[5])

    fx = 40.0
    k = _intrinsics(fx, fx, W / 2 - 0.5, H / 2 - 0.5)

    # Texture sampled from a smooth random function of world (x, y) at z=true_d.
    def render(cam_pose_inv):
        img = np.zeros((H, W, 3), dtype=np.float32)
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        # keyframe at origin: world point of pixel (u,v) at depth true_d
        wx = (xs - k[0, 2]) / fx * true_d
        wy = (ys - k[1, 2]) / fx * true_d
        for c in range(3):
            img[..., c] = 0.4 * np.sin(wx * (c + 1) * 1.3) * np.cos(wy * (c + 2) * 0.9)
        return img

    key = render(None)
    # Source camera translated by tx; its image of the same plane.
    tx = 0.4
    frame = np.zeros_like(key)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    wx = (xs - k[0, 2]) / fx * true_d - tx  # shift world x into source frame
    wy = (ys - k[1, 2]) / fx * true_d
    for c in range(3):
        frame[..., c] = 0.4 * np.sin((wx + tx) * (c + 1) * 1.3) * np.cos(wy * (c + 2) * 0.9)
    # We rendered frame as seen from a camera at x=+tx observing same plane:
    # pixel (u,v) in source cam sees world x = (u-cx)/fx*d + tx.
    wxs = (xs - k[0, 2]) / fx * true_d + tx
    for c in range(3):
        frame[..., c] = 0.4 * np.sin(wxs * (c + 1) * 1.3) * np.cos(wy * (c + 2) * 0.9)

    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = tx

    fused, _ = compute_cost_volume(
        jnp.asarray(key[None]),
        jnp.asarray(k[None]),
        jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        jnp.asarray(frame[None, None]),
        jnp.asarray(k[None, None]),
        jnp.asarray(pose[None, None]),
        jnp.float32(0.0025),
        jnp.float32(0.33),
        CostVolumeConfig(depth_steps=D),
    )
    cv = np.asarray(fused[0])  # (H, W, D)
    interior = cv[8:-8, 8:-8]
    peak = np.argmax(interior, axis=-1)
    # Majority of interior pixels peak at the true hypothesis.
    assert (peak == 5).mean() > 0.8
