"""On-device TPU checks: Pallas-vs-XLA cost-volume parity and kernel perf.

The pytest suite is pinned to the virtual CPU mesh, so compiled-kernel
checks run here, on the real chip:

    python tools/tpu_checks.py

Uses chained data dependencies for timing (the axon remote backend's
block_until_ready is not a reliable fence).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(Path(__file__).resolve().parents[1] / ".jax_tpu_cache"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from monorec_tpu.ops.cost_volume import CostVolumeConfig, compute_cost_volume


def build(b, f, h, w, seed=0, tz=0.8, deg=None):
    rng = np.random.default_rng(seed)
    k = np.zeros((4, 4), np.float32)
    k[0, 0] = k[1, 1] = 0.8 * w
    k[0, 2], k[1, 2] = w / 2 - 0.5, h / 2 - 0.5
    k[2, 2] = k[3, 3] = 1
    kb = np.tile(k, (b, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (b, f, 1, 1))
    poses[:, 0, 0, 3] = 0.3
    poses[:, 1, 0, 3] = -0.3
    poses[:, 1, 2, 3] = tz
    if deg is None:
        th = 0.01
        poses[:, 0, :3, :3] = [
            [np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]
        ]
    else:
        from scipy.spatial.transform import Rotation

        rot = Rotation.from_euler(
            "yxz", [deg, deg / 2, deg / 2], degrees=True
        ).as_matrix()
        poses[:, 1, :3, :3] = rot.astype(np.float32)
    return (
        jnp.asarray(rng.uniform(-0.5, 0.5, (b, h, w, 3)).astype(np.float32)),
        jnp.asarray(kb),
        jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))),
        jnp.asarray(rng.uniform(-0.5, 0.5, (b, f, h, w, 3)).astype(np.float32)),
        jnp.asarray(np.tile(kb[:, None], (1, f, 1, 1))),
        jnp.asarray(poses),
        jnp.float32(0.0025),
        jnp.float32(0.33),
    )


def parity(b=2, f=2, h=64, w=128, d_steps=8, warp_dtype="float32", tol=1e-3,
           tz=0.8, deg=None, max_uncovered_frac=0.0):
    """Pallas-vs-XLA parity. With ``max_uncovered_frac`` == 0 (in-envelope
    poses) coverage must be exactly 0 and the per-pixel max diff within
    ``tol``. A nonzero fraction marks a BEYOND-envelope stress pose:
    uncovered pixels degrade to partial tap sums by design (surfaced via
    the coverage counter the trainers log), so the check asserts graceful
    degradation instead — uncovered stays under the fraction and the bulk
    of the volume (mean diff) still matches."""
    args = build(b, f, h, w, tz=tz, deg=deg)
    cfg = CostVolumeConfig(depth_steps=d_steps, warp_dtype=warp_dtype)
    ref_cfg = CostVolumeConfig(depth_steps=d_steps)
    ref = jax.jit(lambda *a: compute_cost_volume(*a, ref_cfg, backend="xla"))(*args)
    new = jax.jit(
        lambda *a: compute_cost_volume(
            *a, cfg, backend="pallas", return_coverage=True
        )
    )(*args)
    cov = np.asarray(new[2])
    ok = True
    for name, (r, n) in zip(("fused", "sfcv"), zip(ref, new)):
        diff = np.abs(np.asarray(r) - np.asarray(n))
        print(
            f"parity {h}x{w} D{d_steps} {warp_dtype} {name}: "
            f"max {diff.max():.2e} mean {diff.mean():.2e}"
        )
        if max_uncovered_frac > 0:
            # Uncovered pixels (partial tap sums) also perturb their
            # pixel's frame-fusion weights, so the error footprint is a
            # few x the uncovered count; the bulk bound reflects that
            # (measured mean 2.3e-3 at 0.31% uncovered).
            ok &= diff.mean() < 5e-3
        else:
            ok &= diff.max() < tol
    total = b * f * d_steps * h * w
    print(
        f"coverage {h}x{w} D{d_steps}: uncovered={cov.sum():.0f} "
        f"({cov.sum() / total:.3%} of px-depths, budget "
        f"{max_uncovered_frac:.3%})"
    )
    ok &= cov.sum() <= max_uncovered_frac * total
    print("PARITY", "PASS" if ok else "FAIL")
    return ok


def grid_warp_parity(n=4, h=256, w=512, seed=3):
    """Compiled parity + coordinate-grad parity of the general grid-sample
    kernel (the reprojection-loss warp path) vs the XLA gather path."""
    from monorec_tpu.ops.sampling import grid_sample_nhwc

    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.uniform(-0.5, 0.5, (n, h, w, 3)).astype(np.float32))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = 20.0 * (xs / w - 0.5) + 2.0 * np.sin(ys / 9.0) + 0.3
    dy = 3.0 * np.cos(xs / 13.0) + 0.2
    gx = (2.0 * (xs + dx) + 1.0) / w - 1.0
    gy = (2.0 * (ys + dy) + 1.0) / h - 1.0
    grids = jnp.asarray(
        np.tile(np.stack([gx, gy], -1)[None], (n, 1, 1, 1))
    )
    cot = jnp.asarray(rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32))

    def loss(g, backend):
        return jnp.sum(grid_sample_nhwc(imgs, g, backend=backend) * cot)

    ref = jax.jit(lambda g: grid_sample_nhwc(imgs, g, backend="xla"))(grids)
    got = jax.jit(lambda g: grid_sample_nhwc(imgs, g, backend="tpu"))(grids)
    g_ref = jax.jit(jax.grad(lambda g: loss(g, "xla")))(grids)
    g_got = jax.jit(jax.grad(lambda g: loss(g, "tpu")))(grids)
    ok = True
    d = np.abs(np.asarray(got) - np.asarray(ref)).max()
    gd = np.abs(np.asarray(g_got) - np.asarray(g_ref)).max()
    g_scale = np.abs(np.asarray(g_ref)).max()
    print(
        f"grid_warp {h}x{w} fwd max|diff| {d:.2e}, grad max|diff| {gd:.2e} "
        f"(scale {g_scale:.1f})"
    )
    # The gradient contracts the cotangent over channels, so its scale is
    # tens; the hi/lo split's ~1e-4 relative error budgets accordingly.
    ok &= d < 1e-3 and gd < 1e-3 + 1e-4 * g_scale
    # bf16 source quantization (the loss-warp default): ~2^-8 relative.
    got16 = jax.jit(
        lambda g: grid_sample_nhwc(
            imgs, g, backend="tpu", kernel_dtype=jnp.bfloat16
        )
    )(grids)
    d16 = np.abs(np.asarray(got16) - np.asarray(ref)).max()
    print(f"grid_warp {h}x{w} bf16-source fwd max|diff| {d16:.2e}")
    ok &= d16 < 2e-2
    print("GRID WARP", "PASS" if ok else "FAIL")
    return ok


def perf():
    args = build(8, 2, 256, 512, 1)
    cfg = CostVolumeConfig(depth_steps=32)

    f = jax.jit(
        lambda eps, *a: compute_cost_volume(a[0] + eps, *a[1:], cfg, backend="pallas")[
            0
        ].mean()
    )
    eps = jnp.float32(0)
    float(f(eps, *args))  # compile
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        eps = f(eps * 1e-9, *args)
    float(eps)
    dt = (time.perf_counter() - t0) / iters
    print(f"pallas cost volume B8 F2 D32 256x512: {dt*1000:.1f} ms -> {8/dt:.1f} kf/s")


if __name__ == "__main__":
    ok = parity()
    # Full-res, high-disparity-spread pose (tz=0.8): stresses the kernel's
    # union tap windows; coverage must stay 0 across the whole image.
    ok &= parity(1, 2, 256, 512, 32)
    # bf16 serving path: source images quantized to bf16 in-kernel; the
    # CV error budget vs the exact f32 XLA path is 5e-3 (measured ~1.6e-3).
    ok &= parity(1, 2, 256, 512, 32, warp_dtype="bfloat16", tol=5e-3)
    # bf16 + PURE translation (deg=0 disables every rotation in build):
    # exercises the WEIGHTED lane selection (bilinear weights folded into
    # the one-hot, select_lanes_weighted) on real hardware — its bf16
    # weight quantization must stay inside the same serving budget.
    ok &= parity(1, 2, 256, 512, 32, warp_dtype="bfloat16", tol=5e-3, deg=0.0)
    # Rotation (1 deg yaw + 0.5 deg pitch/roll) + KITTI-highway forward
    # motion (tz=1.2, i.e. ~43 km/h at 10 fps with a 10 deg/s turn):
    # stresses the per-depth row bases + per-lane shears; in-envelope, so
    # coverage must be exactly 0.
    ok &= parity(1, 2, 256, 512, 32, tz=1.2, deg=1.0)
    # BEYOND-envelope stress (tz=1.6 + 2 deg/frame yaw + 1 deg pitch/roll
    # = 58 km/h while yawing 20 deg/s and pitching 10 deg/s): the true
    # within-block row span at the nearest hypotheses reaches ~30 px on
    # the halo'd 20-row blocks — past the KY=21 window any
    # single-MXU-tile slab affords — so a small fraction of px-depths
    # degrades to partial tap sums. The check pins the degradation
    # envelope: uncovered < 0.5% (measured 0.31% r05; was 1.25% before
    # the per-depth row bases) and the bulk of the volume still matches
    # the XLA oracle.
    ok &= parity(1, 2, 256, 512, 32, tz=1.6, deg=2.0, max_uncovered_frac=0.005)
    ok &= grid_warp_parity()
    perf()
    sys.exit(0 if ok else 1)
