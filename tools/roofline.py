"""Roofline / MFU account of the hot components at the bench operating point.

Turns PARITY.md's "measured compute-bound" claims into checkable numbers:
for each hot component this tool reports measured time, analytic work
(FLOPs split MXU vs VPU, HBM bytes), the implied speed-of-light time on a
v5e chip, and achieved-vs-peak utilization. Components:

* the fused plane-sweep CV kernel (``ops/pallas/cv_kernel.py``) — hand
  model below, including the data-dependent tap-loop bounds (sy_hi / r_hi)
  re-derived in numpy from the actual homographies of the timed batch;
* the general grid-sample loss kernel (``ops/pallas/grid_warp.py``) — same
  style of model with block spans derived from the actual coords;
* the U-Net conv stacks (DepthModule / MaskModule / ResNet) — XLA's own
  ``compiled.cost_analysis()`` FLOP/byte counts.

v5e peaks used (with their provenance):
* MXU bf16: 197e12 FLOP/s (public spec).
* clock derived from it: 197e12 / (4 MXUs * 128*128 * 2) = 1.47 GHz.
* VPU: 8x128 lanes * 4 ALUs * clock = 6.0e12 op/s (counting one op per
  ALU-cycle; FMAs count as one op in the models below, so utilization is
  conservative by up to 2x).
* HBM: 819e9 B/s (public spec).

Timing uses chained data dependencies + scalar fetch (axon fence caveat,
see bench.py). Writes ``artifacts/roofline_r05.json``;
``tools/update_measured.py`` renders the table into MEASURED.md.

Run on the TPU: ``python tools/roofline.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_tpu_cache")
)

import numpy as np

PEAK_MXU_BF16 = 197e12
PEAK_MXU_F32 = PEAK_MXU_BF16 / 4  # one f32 pass = 4 bf16-equivalent passes
PEAK_VPU_OPS = 6.0e12
PEAK_HBM = 819e9


# ---------------------------------------------------------------------------
# CV kernel model (mirrors ops/pallas/cv_kernel.py constants)
# ---------------------------------------------------------------------------


def _cv_kernel_tap_bounds(homs: np.ndarray, h: int, w: int, dchunk: int):
    """Per-program (16x128-block, depth-chunk) tap-loop bounds sy_hi / r_hi,
    re-derived from the homographies the kernel actually ran with.

    Mirrors the kernel's scalar math on non-overlapping 16x128 blocks (the
    real blocks carry a 2px halo — ~29% more pixels, accounted separately
    via the AREA factor; the bounds themselves shift by at most ~1 tap).
    Returns arrays (N, D/dchunk, HB, WB) of sy_hi and r_hi.
    """
    from monorec_tpu.ops.pallas.cv_kernel import KY, R_PD

    n, d = homs.shape[:2]
    hb, wb = h // 16, w // 128
    ys_g, xs_g = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    ones = np.ones_like(xs_g)
    pix = np.stack([xs_g, ys_g, ones], axis=0).reshape(3, -1)  # (3, H*W)

    sy_hi = np.zeros((n, d // dchunk, hb, wb), np.int32)
    r_hi = np.zeros((n, d // dchunk, hb, wb), np.int32)
    for ni in range(n):
        # (D, 3, H*W) projected coords
        pr = np.einsum("dij,jk->dik", homs[ni].astype(np.float64), pix)
        xs = (pr[:, 0] / pr[:, 2]).reshape(d, h, w)
        ys = (pr[:, 1] / pr[:, 2]).reshape(d, h, w)
        hint = (xs > -1) & (xs < w) & (ys > -1) & (ys < h)
        dx = xs - xs_g[None]
        dy = ys - ys_g[None]
        for dci in range(d // dchunk):
            sl = slice(dci * dchunk, (dci + 1) * dchunk)
            for rb in range(hb):
                for cb in range(wb):
                    blk = (
                        slice(rb * 16, rb * 16 + 16),
                        slice(cb * 128, cb * 128 + 128),
                    )
                    hh = hint[sl][(slice(None),) + blk]
                    if not hh.any():
                        continue
                    dyb = dy[sl][(slice(None),) + blk]
                    dxb = dx[sl][(slice(None),) + blk]
                    # r05 kernel: PER-DEPTH row bases (own hinted min per
                    # hypothesis) — only the within-block span enters sy_hi.
                    symax = 0
                    rmax = 0
                    for dd in range(dchunk):
                        hd = hh[dd]
                        if not hd.any():
                            continue
                        b_dd = np.floor(np.where(hd, dyb[dd], np.inf).min())
                        fy_m = np.where(hd, dyb[dd] - b_dd, -np.inf).max()
                        symax = max(
                            symax, int(np.clip(np.floor(fy_m) + 2, 0, KY))
                        )
                        lane_min = np.where(hd, dxb[dd], np.inf).min(axis=0)
                        fxr = dxb[dd] - np.floor(lane_min)[None]
                        m = np.where(hd, fxr, -np.inf).max()
                        if np.isfinite(m):
                            rmax = max(rmax, int(np.clip(np.floor(m) + 2, 0, R_PD)))
                    sy_hi[ni, dci, rb, cb] = symax
                    r_hi[ni, dci, rb, cb] = rmax
    return sy_hi, r_hi


def cv_kernel_model(homs: np.ndarray, h: int, w: int, c: int, dchunk: int,
                    img_bytes: int):
    """Analytic MXU FLOPs, VPU ops, HBM bytes of one plane_sweep_sad launch."""
    from monorec_tpu.ops.pallas.cv_kernel import (
        BAND_H, COLS, COLS_E, PY_N, ROWS, ROWS_E,
    )
    from monorec_tpu.ops.pallas.slab import BAND_W

    n, d = homs.shape[:2]
    sy_hi, r_hi = _cv_kernel_tap_bounds(homs, h, w, dchunk)
    programs = n * (h // ROWS) * (w // COLS) * (d // dchunk)
    area = ROWS_E * COLS_E  # halo'd block pixels
    parts = 1 if img_bytes == 2 else 2  # bf16 sources skip the lo pass

    # MXU: slab build (per DEPTH since the r05 per-depth row bases) =
    # dchunk x 2 halves x C x 2 bands x parts matmuls of
    # (PY_N, BAND_H) x (BAND_H, BAND_W); selection = per (depth, lane-tap):
    # 2 halves x parts matmuls of (C*PY_N, BAND_W) x (BAND_W, 256).
    # Weighted lane selection (r05): row-uniform x residuals (translation-
    # only homographies, bf16 sweeps) fold both hat taps into ONE matmul
    # per hypothesis and collapse the lane-tap loop to 1 iteration. At
    # driving-scale parallax the same condition keeps the shared-slab
    # branch (one build per chunk); otherwise the kernel rebuilds the
    # slab per hypothesis — approximate the build factor accordingly.
    m = homs.reshape(-1, 3, 3)
    translation_only = bool(
        np.all(np.abs(m[:, 0, 1]) == 0)
        and np.all(np.abs(m[:, 1, 0]) == 0)
        and np.all(np.abs(m[:, 2, :2]) == 0)
    )
    weighted = translation_only and img_bytes == 2
    build_factor = 1 if translation_only else dchunk
    slab_flops = programs * build_factor * 2 * c * 2 * parts * (
        2 * PY_N * BAND_H * BAND_W
    )
    if weighted:
        r_hi = np.minimum(r_hi, 1)
    sel_count = float((r_hi.astype(np.int64) * dchunk).sum()) * (
        (h // ROWS) * (w // COLS) / max(1, (h // 16) * (w // 128))
    )  # r_hi sampled on 16x128 blocks; rescale to kernel blocks
    sel_flops = sel_count * 2 * parts * (2 * c * PY_N * BAND_W * 256)
    mxu_flops = slab_flops + sel_flops

    # VPU (ops, FMA = 1): tap loop = per (sy < sy_hi) x (s < r_hi) x depth:
    # C fused mul-adds per halo'd pixel (+ ~4 weight/mask ops per sy);
    # SSIM+SAD epilogue ~ c*31 + 4 ops per halo'd pixel per depth.
    blocks_scale = ((h // ROWS) * (w // COLS)) / max(1, (h // 16) * (w // 128))
    tap_madds = float(
        (sy_hi.astype(np.int64) * r_hi.astype(np.int64) * dchunk).sum()
    ) * blocks_scale * area * c
    tap_wts = float(sy_hi.astype(np.int64).sum()) * blocks_scale * area * (
        4 * dchunk
    )
    ssim_ops = programs * dchunk * area * (c * 31 + 4)
    vpu_ops = tap_madds + tap_wts + ssim_ops

    # HBM: 4 source bands per program + keyframe blocks (resident across
    # the innermost depth axis) + SAD/wmask/coverage outputs.
    bytes_bands = programs * 4 * c * BAND_H * BAND_W * img_bytes
    bytes_key = n * (h // ROWS) * (w // COLS) * c * area * 4
    bytes_out = 2 * n * d * h * w * 4
    hbm = bytes_bands + bytes_key + bytes_out

    return {
        "mxu_flops": mxu_flops,
        "vpu_ops": vpu_ops,
        "hbm_bytes": hbm,
        "mean_sy_hi": float(sy_hi.mean()),
        "mean_r_hi": float(r_hi.mean()),
        "notes": "tap bounds re-derived from the timed homographies; "
        "FMA counted as 1 VPU op",
    }


# ---------------------------------------------------------------------------
# grid_warp (loss reprojection) model
# ---------------------------------------------------------------------------


def grid_warp_model(xs: np.ndarray, ys: np.ndarray, c: int, img_bytes: int,
                    jacobian: bool):
    """Analytic work of one grid_warp(_jac) launch; coords (N, H, W) pixels."""
    from monorec_tpu.ops.pallas.grid_warp import COLS, KY, PY_N, R_MAX, ROWS
    from monorec_tpu.ops.pallas.slab import BAND_W

    n, h, w = xs.shape
    hb, wb = h // ROWS, w // COLS
    programs = n * hb * wb
    parts = 1 if img_bytes == 2 else 2
    band_h = 4 * ROWS

    dx = xs - np.arange(w)[None, None, :]
    dy = ys - np.arange(h)[None, :, None]
    sy_spans = np.zeros((n, hb, wb), np.int64)
    s_spans = np.zeros((n, hb, wb), np.int64)
    for ni in range(n):
        for rb in range(hb):
            for cb in range(wb):
                blk = (
                    slice(rb * ROWS, rb * ROWS + ROWS),
                    slice(cb * COLS, cb * COLS + COLS),
                )
                dyb, dxb = dy[ni][blk], dx[ni][blk]
                sy_spans[ni, rb, cb] = int(
                    np.clip(np.floor(dyb.max()) - np.floor(dyb.min()) + 2, 0, KY)
                )
                lane_min = np.floor(dxb.min(axis=0))
                s_spans[ni, rb, cb] = int(
                    np.clip(
                        np.floor((dxb - lane_min[None]).max()) + 2, 0, R_MAX
                    )
                )

    slab_flops = programs * 2 * c * 2 * parts * (2 * PY_N * band_h * BAND_W)
    sel_flops = float(s_spans.sum()) * 2 * parts * (
        2 * c * PY_N * BAND_W * 256
    )
    # taps: per (s, sy): c madds per pixel (x3 with the two Jacobian FMAs)
    per_tap = c * (3 if jacobian else 1)
    tap_ops = float((s_spans * sy_spans).sum()) * ROWS * COLS * per_tap
    wt_ops = float(s_spans.sum()) * ROWS * COLS * 6
    vpu_ops = tap_ops + wt_ops

    bytes_bands = programs * 4 * c * band_h * BAND_W * img_bytes
    out_mult = 3 if jacobian else 1
    bytes_out = out_mult * n * c * h * w * 4 + n * h * w * 4
    hbm = bytes_bands + bytes_out
    return {
        "mxu_flops": slab_flops + sel_flops,
        "vpu_ops": vpu_ops,
        "hbm_bytes": hbm,
        "mean_sy_span": float(sy_spans.mean()),
        "mean_s_span": float(s_spans.mean()),
        "notes": "block spans derived from the timed coords; FMA = 1 op",
    }


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def _time_chained(fn, *args, iters=16, windows=5):
    # iters=16: the axon tunnel's scalar-fetch RTT is ~27 ms per window
    # (measured); 4-iter windows inflated per-call times by ~7 ms.
    """Median seconds per call; chained scalar feedback as device fence."""
    import jax.numpy as jnp

    eps = jnp.float32(0.0)
    eps = fn(eps, *args)
    float(eps)  # compile
    for _ in range(3):
        eps = fn(eps * 1e-12, *args)
    float(eps)
    meds = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            eps = fn(eps * 1e-12, *args)
        float(eps)
        meds.append((time.perf_counter() - t0) / iters)
    meds.sort()
    return meds[len(meds) // 2]


def _sol(entry):
    """Speed-of-light time + utilization from a work model + measured s."""
    t_mxu = entry["mxu_flops"] / (
        PEAK_MXU_BF16 if entry.get("mxu_bf16", True) else PEAK_MXU_F32
    )
    t_vpu = entry["vpu_ops"] / PEAK_VPU_OPS
    t_hbm = entry["hbm_bytes"] / PEAK_HBM
    bound = max(t_mxu, t_vpu, t_hbm)
    which = {t_mxu: "MXU", t_vpu: "VPU", t_hbm: "HBM"}[bound]
    entry.update(
        sol_ms=round(bound * 1e3, 2),
        bound=which,
        t_mxu_ms=round(t_mxu * 1e3, 2),
        t_vpu_ms=round(t_vpu * 1e3, 2),
        t_hbm_ms=round(t_hbm * 1e3, 2),
        utilization=round(bound / entry["measured_s"], 3),
        measured_ms=round(entry["measured_s"] * 1e3, 2),
    )
    del entry["measured_s"]
    return entry


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from monorec_tpu.models import MonoRec, MonoRecConfig
    from monorec_tpu.ops.cost_volume import plane_sweep_homographies
    from monorec_tpu.precision import apply_to_model_kwargs, set_precision

    set_precision("serving", expect_rebuild=True)
    b, h, w, f, d = 8, 256, 512, 2, 32
    batch = _make_batch(b, h, w, f, stereo=False, mask=False, tz=0.4)
    model = MonoRec(MonoRecConfig(cv_depth_steps=d, **apply_to_model_kwargs({})))
    variables = jax.jit(
        lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt, False)
    )(batch)
    results = {}

    # ---- 1. fused CV sweep (mono, F=2) ---------------------------------
    print("[roofline] timing CV sweep...", file=sys.stderr, flush=True)

    @jax.jit
    def cv_fn(eps, bt):
        bt = dict(bt)
        bt["keyframe"] = bt["keyframe"] + eps
        cv, sfcv = model.apply(variables, bt, method=MonoRec.cost_volume)
        return cv.mean() + sfcv.mean()

    t_cv = _time_chained(cv_fn, batch)
    homs = np.asarray(
        plane_sweep_homographies(
            batch["keyframe_intrinsics"], batch["keyframe_pose"],
            batch["intrinsics"], batch["poses"],
            jnp.linspace(jnp.float32(0.33), jnp.float32(0.0025), d), h, w,
        )
    ).reshape(b * f, d, 3, 3)
    # Mirrors the kernel's default: bf16 sources (the serving policy timed
    # here) run dchunk=8 at D>=32.
    dchunk = 8 if d % 8 == 0 and d >= 32 else (4 if d % 4 == 0 else 2)
    dchunk = int(os.environ.get("MONOREC_CV_DCHUNK", dchunk))
    print("[roofline] deriving CV tap bounds...", file=sys.stderr, flush=True)
    m = cv_kernel_model(homs, h, w, 3, dchunk, img_bytes=2)
    m["measured_s"] = t_cv
    m["what"] = f"fused CV sweep, B={b} F={f} D={d} (bf16 sources)"
    results["cv_sweep"] = _sol(m)

    # ---- 2. grid_warp_jac (loss reprojection warp) ---------------------
    print("[roofline] timing grid_warp_jac...", file=sys.stderr, flush=True)
    from monorec_tpu.ops.pallas import grid_warp as gw

    n_imgs = b * f  # one reprojection pass warps every source frame
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.uniform(-0.5, 0.5, (n_imgs, 3, h, w)).astype(np.float32)
    ).astype(jnp.bfloat16)
    # KITTI-like coords: mostly small flow + disparity-scale lane offsets
    xs_np = (
        np.arange(w)[None, None, :]
        + rng.uniform(-2, 30, (n_imgs, h, w)) * rng.uniform(0, 1, (n_imgs, 1, 1))
    ).astype(np.float32)
    ys_np = (
        np.arange(h)[None, :, None] + rng.uniform(-3, 3, (n_imgs, h, w))
    ).astype(np.float32)
    xs_j, ys_j = jnp.asarray(xs_np), jnp.asarray(ys_np)

    @jax.jit
    def gw_fn(eps, im, xx, yy):
        (out, jx, jy), cov = gw.grid_warp_jac(im, xx + eps, yy)
        return (
            out.astype(jnp.float32).mean()
            + jx.astype(jnp.float32).mean()
            + jy.astype(jnp.float32).mean()
        )

    t_gw = _time_chained(gw_fn, imgs, xs_j, ys_j)
    m = grid_warp_model(xs_np, ys_np, 3, img_bytes=2, jacobian=True)
    m["measured_s"] = t_gw
    m["what"] = f"grid_warp_jac, {n_imgs} warps of {h}x{w}x3 (bf16 sources)"
    results["grid_warp_jac"] = _sol(m)

    # ---- 3-5. conv stacks via XLA cost analysis ------------------------
    feats = model.apply(variables, batch["keyframe"], method=MonoRec.features)
    cv, sfcv = model.apply(variables, batch, method=MonoRec.cost_volume)

    def xla_component(name, what, fn, *args):
        print(f"[roofline] timing {name}...", file=sys.stderr, flush=True)

        def chained(eps, *a):
            out = fn(*((a[0] + eps,) + a[1:]))
            return jax.tree_util.tree_reduce(
                lambda s, x: s + x.astype(jnp.float32).mean(), out,
                jnp.float32(0.0),
            )

        jitted = jax.jit(chained)
        t = _time_chained(jitted, *args)
        ca = jitted.lower(jnp.float32(0.0), *args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ca = ca or {}
        entry = {
            "mxu_flops": float(ca.get("flops", 0.0)),
            "vpu_ops": 0.0,
            "hbm_bytes": float(ca.get("bytes accessed", 0.0)),
            "measured_s": t,
            "what": what,
            "notes": "FLOPs/bytes from XLA cost_analysis (convs -> MXU)",
        }
        results[name] = _sol(entry)

    xla_component(
        "depth_decode_fwd",
        f"DepthModule forward, B={b} (bf16 convs)",
        lambda cvv, kf, ft: model.apply(
            variables, cvv, kf, ft, method=MonoRec.depth
        ),
        cv, batch["keyframe"], feats,
    )
    xla_component(
        "mask_fwd",
        f"MaskModule forward, B={b} F={f} (bf16 convs)",
        lambda sf, ft: model.apply(variables, sf, ft, method=MonoRec.mask),
        sfcv, feats,
    )
    xla_component(
        "resnet_fwd",
        f"ResNet-18 feature pyramid, B={b} (f32)",
        lambda kf: model.apply(variables, kf, method=MonoRec.features),
        batch["keyframe"],
    )

    payload = {
        "operating_point": f"B={b} {h}x{w} D={d} F={f}, serving policy",
        "peaks": {
            "mxu_bf16_flops": PEAK_MXU_BF16,
            "vpu_ops": PEAK_VPU_OPS,
            "hbm_bytes": PEAK_HBM,
        },
        "components": results,
    }
    out = os.path.join(ROOT, "artifacts", "roofline_r05.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload, indent=1))
    print(f"[roofline] wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
