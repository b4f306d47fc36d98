"""Reprojection-loss parity vs an independent torch oracle.

The reprojection loss is the backbone of every training stage; this pins the
full chain (depth-warp via grid_sample semantics, out-of-view inf masking,
automasking, min/avg combination, border masks) against torch primitives.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from monorec_tpu.losses.common import reprojection_loss

B, H, W, FR = 2, 24, 32, 2


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    k = np.zeros((4, 4), np.float32)
    k[0, 0] = k[1, 1] = 30.0
    k[0, 2], k[1, 2] = W / 2 - 0.5, H / 2 - 0.5
    k[2, 2] = k[3, 3] = 1
    kb = np.tile(k, (B, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, FR, 1, 1))
    poses[:, 0, 0, 3] = 0.25
    poses[:, 1, 0, 3] = -0.25
    poses[:, 1, 2, 3] = 0.3
    keyframe = rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(np.float32)
    frames = rng.uniform(-0.5, 0.5, (B, FR, H, W, 3)).astype(np.float32)
    inv_depth = rng.uniform(0.05, 0.3, (B, H, W, 1)).astype(np.float32)
    data = {
        "keyframe": jnp.asarray(keyframe),
        "keyframe_pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))),
        "keyframe_intrinsics": jnp.asarray(kb),
        "frames": jnp.asarray(frames),
        "poses": jnp.asarray(poses),
        "intrinsics": jnp.asarray(np.tile(kb[:, None], (1, FR, 1, 1))),
    }
    return data, keyframe, frames, poses, kb, inv_depth


_GAUSS = torch.tensor(
    [[0.0947, 0.1183, 0.0947], [0.1183, 0.1478, 0.1183], [0.0947, 0.1183, 0.0947]]
)


def _t_compute_errors(a, b):
    """torch oracle of compute_errors (zero-pad gaussian comp-mode SSIM + L1)."""
    c = a.shape[1]
    k = _GAUSS.repeat(c, 1, 1, 1)
    pad = torch.nn.ZeroPad2d(1)
    avg = lambda t: F.conv2d(pad(t), k, groups=c)
    mx, my = avg(a), avg(b)
    sx = avg(a * a) - mx**2
    sy = avg(b * b) - my**2
    sxy = avg(a * b) - mx * my
    n = (2 * mx * my + 1e-4) * (2 * sxy + 9e-4)
    d = (mx**2 + my**2 + 1e-4) * (sx + sy + 9e-4)
    s = torch.clamp(1 - n / d, 0, 1) / 2
    return 0.85 * s.mean(1) + 0.15 * (a - b).abs().mean(1)


def _torch_reprojection(keyframe, frames, poses, kb, inv_depth, automasking):
    """Oracle mirroring common_losses.reprojection_loss semantics."""
    t_key = torch.from_numpy(keyframe).permute(0, 3, 1, 2)
    depth = torch.from_numpy(1.0 / inv_depth[..., 0])

    ys, xs = torch.meshgrid(
        torch.arange(H, dtype=torch.float32),
        torch.arange(W, dtype=torch.float32),
        indexing="ij",
    )
    grid_h = torch.stack([xs.reshape(-1), ys.reshape(-1), torch.ones(H * W)], 0)

    errs = []
    for b in range(B):
        k3 = torch.from_numpy(kb[b])
        cam = depth[b].reshape(1, -1) * (torch.inverse(k3)[:3, :3] @ grid_h)
        cam = torch.cat([cam, torch.ones(1, H * W)], 0)
        per_frame = []
        for f in range(FR):
            t = torch.inverse(torch.from_numpy(poses[b, f]))
            pc = (k3 @ t)[:3, :] @ cam
            xy = pc[:2] / (pc[2:3] + 1e-7)
            xy[0] /= W - 1
            xy[1] /= H - 1
            g = ((xy - 0.5) * 2).reshape(2, H, W).permute(1, 2, 0)[None]
            frame = torch.from_numpy(frames[b, f]).permute(2, 0, 1)[None]
            warped = F.grid_sample(frame + 1.5, g, align_corners=False)
            mask = warped[:, 0] == 0
            warped = warped - 1.0
            e = _t_compute_errors(warped, t_key[b : b + 1] + 0.5)[0]
            e = torch.where(mask[0], torch.tensor(float("inf")), e)
            if automasking:
                e_nw = _t_compute_errors(frame + 0.5, t_key[b : b + 1] + 0.5)[0]
                e = torch.where(e_nw < e, torch.tensor(float("inf")), e)
            per_frame.append(e)
        errs.append(torch.stack(per_frame))
    errs = torch.stack(errs)  # (B, FR, H, W)
    combined = errs.min(dim=1)[0]
    invalid = torch.isinf(combined)
    combined = torch.where(invalid, torch.zeros(()), combined)
    return combined.sum() / (combined.numel() - invalid.float().sum())


@pytest.mark.parametrize("automasking", [False, True])
def test_reprojection_matches_torch_oracle(automasking):
    data, keyframe, frames, poses, kb, inv_depth = _setup()
    ours = float(
        reprojection_loss(
            jnp.asarray(inv_depth), data, automasking=automasking,
            combine_frames="min", reduce=True,
        )
    )
    ref = float(
        _torch_reprojection(keyframe, frames, poses, kb, inv_depth, automasking)
    )
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=1e-5)


def test_reprojection_avg_combination_runs():
    data, *_rest, inv_depth = _setup(1)
    v = float(
        reprojection_loss(
            jnp.asarray(inv_depth), data, combine_frames="avg", reduce=True
        )
    )
    assert np.isfinite(v)
