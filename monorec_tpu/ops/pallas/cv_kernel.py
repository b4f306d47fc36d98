"""Fused Pallas TPU kernel: plane-sweep warp + SSIM + patch-SAD scoring.

Round-2 evolution of ``warp_kernel.py``: instead of materializing the warped
stack (N, D, C, H, W) in HBM (~800 MB per batch-8 sweep) and scoring it with
an XLA epilogue of reduce_windows (measured ~100 ms/step), this kernel warps
an extended block with a 2-pixel halo and computes the photometric score
*in-register*:

* per program (one (image, row-block, col-block, depth-chunk) cell) the four
  source-image bands covering the UNION of the chunk's displacement windows
  are DMA'd via scalar-prefetch-driven index maps; plane-sweep displacement
  is monotonic in inverse depth, so the union bounds come from the chunk's
  two endpoint hypotheses;
* the row-aligned band slab (an exact one-hot permutation matmul) is
  anchored per program by a SHARED-OR-SPLIT decision (r05): when one
  chunk-shared row base keeps every hypothesis' taps inside KY — the
  common case at driving-scale parallax — the slab is built once; when
  the chunk's inter-depth y drift would overflow it, each hypothesis
  rebuilds at its own PER-DEPTH row base (exact vector min over its own
  hinted pixels). Both variants are emitted under runtime predicates with
  the selection matmuls INSIDE each branch, so the slab stays in
  registers (a scratch-staged formulation measured ~+3 ms/sweep of pure
  roundtrips). The r02-r04 chunk-shared-only base silently lost 1.25% of
  px-depths at 1.6 m/frame + 2 deg rotation; per-depth bases confine the
  loss to the truly-past-envelope 0.31% (``MONOREC_CV_ROW_BASES`` pins
  shared/per_depth statically for experiments);
  the x displacement profile — which varies by
  tens of pixels across a block under forward motion (zoom about the FOE)
  and by ~12 px across the chunk's hypotheses at near depths — is absorbed
  by PER-DEPTH PER-LANE integer shears folded into the lane-selection
  one-hots: each sheared slab is a single MXU matmul (bf16 hi/lo two-pass,
  ~1e-5 relative), and the bilinear tap loop only covers the per-lane
  residual (fraction + rotation-induced row variation, R_PD taps), reading
  the sheared slabs back at static offsets — no rolls, no per-tap branches;
* the warped block (C, ROWS+4, COLS+4) never leaves VMEM: SSIM
  (3x3 uniform window, reflect padding at image borders — replicated by an
  in-kernel edge fix, ``model/layers.py:91-139``), the channel-weighted sum
  (5/32, 16/32, 11/32)/9 and the 3x3 patch-SAD box sum
  (``monorec_model.py:227-248``) are evaluated on the halo'd block, and only
  the (N, D, H, W) SAD + warped-border-mask maps are written out;
* keyframe statistics (3x3 window sums of k and k^2) are depth-independent:
  they are computed once per (image, row, col) cell from a manually DMA'd
  reflect-padded keyframe block and live in scratch across the depth-chunk
  grid dimension (innermost);
* a per-(image, depth) coverage counter reports in-image pixels whose
  source fell outside the tap window (0 for rigid driving motion; halo
  pixels may be double-counted by adjacent blocks — the counter is a
  diagnostic, nonzero == the CV is degraded).

Layout: images (N, C, H, W) channels-first, W in lanes; outputs
(N, D, H, W) SAD / border-mask and (N, D) coverage.
"""

from __future__ import annotations

import functools
import os as _os_mod
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monorec_tpu.ops.pallas.slab import (
    BAND_W,
    build_aligned_slab,
    lane_iotas,
    select_lanes,
    select_lanes_weighted,
)
from monorec_tpu.ops.pallas.warp_kernel import (
    _corner_displacement_bounds,
    _read_hom,
)

Array = jax.Array

# Perf-analysis ONLY (outputs become wrong): statically disable one kernel
# phase to attribute sweep time. Read at import; set in a fresh process.
# "" | "no_select" (skip lane-selection matmuls) | "no_tapb" (skip the y
# tap loop) | "no_epilogue" (skip SSIM/SAD scoring).
_ABLATE = _os_mod.environ.get("MONOREC_CV_ABLATE", "")

ROWS = 16  # output rows per block
COLS = 128  # output cols per block
HALO = 2  # SSIM (1) + SAD box (1)
ROWS_E = ROWS + 2 * HALO  # warped rows computed per block
COLS_E = COLS + 2 * HALO
# BAND_W comes from slab.py (shared with grid_warp.py); this kernel uses
# 64-row bands so the 128-row slab affords the KY row window.
BAND_H = 64
PAD_Y = 192  # zero padding of the source image (multiple of BAND_H)
PAD_X = 256
KY = 21  # row tap window (per-depth row bases, r05): only the WITHIN-
# block y zoom enters — ROWS_E*tz*inv_depth_max px, ~10 at tz=1.6 (KITTI
# highway frame spacing), ~13 at tz=2.2 — plus rotation-induced variation
# and 2 bilinear/floor margin; the chunk's inter-depth drift moves each
# hypothesis' own slab window instead. Pixels beyond land in the coverage
# counter.
PY_N = 40  # row-permutation output rows (>= KY + ROWS_E - 1, mult of 8)
R_PD = 6  # residual lane taps after the PER-DEPTH per-lane shear: the
# bilinear fraction (2) + within-block row variation of the x displacement
# (exactly 0 for pure translation — the homography's x row is then
# row-independent — and a few px under KITTI-scale rotations) + margin.
# Inter-depth drift no longer enters: each hypothesis carries its own shear.
# Largest per-lane shear that keeps every sheared read inside the 512-lane
# slab: src = dst + off_x + xsh + s <= 511.
XSH_MAX = (2 * BAND_W - 1) - (BAND_W - 1) - (COLS_E - 1) - (R_PD - 1)

_C1 = 0.01**2
_C2 = 0.03**2

assert (BAND_H - 1) + KY + ROWS_E - 1 <= 2 * BAND_H
assert PY_N >= KY + ROWS_E - 1
assert XSH_MAX > 0


def _union_bases(m_first, m_last, y0h, x0h, height, width):
    """Integer FETCH base + band indices for a block's halo'd extent,
    covering the union of the chunk's endpoint hypotheses (displacement is
    monotonic in inverse depth, so interior hypotheses lie between the
    endpoints). Corner-based and hint-free, so it lower-bounds every pixel's
    displacement; the kernel body re-anchors the TAP bases upward inside the
    fetched window — per-lane shears for x, and an exact hinted vector-min
    row base for y (out-of-image corners would otherwise drag the row base
    ~10 px below the warpable pixels under near-depth forward motion,
    overflowing KY). Scalar math; bit-identical in index maps and body.
    """
    b0 = _corner_displacement_bounds(m_first, y0h, x0h, ROWS_E, COLS_E)
    b1 = _corner_displacement_bounds(m_last, y0h, x0h, ROWS_E, COLS_E)
    dy_min = jnp.minimum(b0[0], b1[0])
    dx_min = jnp.minimum(b0[2], b1[2])
    # Hinted lower bound: only pixels whose source lands inside the image
    # (plus the 1 px bilinear reach) ever contribute — their displacement
    # satisfies dy >= -1 - y for every block pixel y, so the fetch base
    # never needs to sit below -(y0h + ROWS_E). Without this, an
    # out-of-image corner at a near-depth hypothesis can drag the window
    # tens of rows below every warpable pixel and the per-depth re-anchor
    # then hits the window's slack clip (r05: measured source of residual
    # coverage loss under strong forward motion). Scalar math, identical
    # in index maps and body.
    dy_min = jnp.maximum(dy_min, -(y0h + ROWS_E) + 0.0)
    dx_min = jnp.maximum(dx_min, -(x0h + COLS_E) + 0.0)
    # Clip so the band window always stays inside the padded image
    # (pixels needing more land in the coverage counter).
    by = jnp.clip(jnp.floor(dy_min), -(PAD_Y - HALO) + 0.0, PAD_Y + 0.0)
    bx = jnp.clip(jnp.floor(dx_min), -(PAD_X - HALO) + 0.0, PAD_X + 0.0)
    by = by.astype(jnp.int32)
    bx = bx.astype(jnp.int32)
    ry = (y0h + by + PAD_Y) // BAND_H
    lx = (x0h + bx + PAD_X) // BAND_W
    return by, bx, ry, lx


def _box3(a: Array) -> Array:
    """3x3 window sum over the trailing two axes; shrinks each by 2."""
    s = a[..., 0:-2, :] + a[..., 1:-1, :] + a[..., 2:, :]
    return s[..., 0:-2] + s[..., 1:-1] + s[..., 2:]


def _sad_kernel(
    hom_ref,  # SMEM (N*D, 8) scalar-prefetch: folded homography rows
    band00_ref, band01_ref, band10_ref, band11_ref,  # source bands
    key_ref,  # (1, 1, 1, C, ROWS_E, COLS_E): halo'd keyframe block (+0.5)
    sad_ref,  # out (1, dchunk, ROWS, COLS)
    wmask_ref,  # out (1, dchunk, ROWS, COLS)
    cov_ref,  # out SMEM (N, D)
    kst_s,  # scratch (2C, ROWS+2, COLS+2): box3(k), box3(k*k)
    acc_s,  # scratch (dchunk, C, ROWS_E, COLS_E): warp accumulators
    macc_s,  # scratch (dchunk, 2, ROWS_E, COLS_E): border-mask accumulators
    shear_s,  # scratch (dchunk*R_PD, C, PY_N, 256): per-depth sheared slabs
    wx_s,  # scratch (dchunk*R_PD, ROWS_E, COLS_E): x tap weights
    *,
    height: int,
    width: int,
    border_radius: int,
    n_depths: int,
    dchunk: int,
    frames_per_image: int,
    use_ssim: int,
    channel_weights: Tuple[float, ...],
    interpret: bool,
    row_base_mode: str,
    wsel: bool,
):
    n = pl.program_id(0)
    rb = pl.program_id(1)
    cb = pl.program_id(2)
    dc = pl.program_id(3)

    channels = band00_ref.shape[1]

    y0h = rb * ROWS - HALO  # halo'd block origin in image coords
    x0h = cb * COLS - HALO

    # --- keyframe window statistics (depth-independent: computed once per
    # (image, row, col) cell; the dc grid axis is innermost and the block
    # index map ignores dc, so Pallas keeps the block resident) -------------
    if use_ssim in (1, 2):

        @pl.when(dc == 0)
        def _():
            k = key_ref[0, 0, 0].astype(jnp.float32)
            kst_s[0:channels] = _box3(k)
            kst_s[channels : 2 * channels] = _box3(k * k)

    # --- shared slab for the whole depth chunk ----------------------------
    ms = [
        _read_hom(hom_ref, n, dc * dchunk + dd, n_depths) for dd in range(dchunk)
    ]
    by, bx, ry, lx = _union_bases(ms[0], ms[-1], y0h, x0h, height, width)
    bxf = bx.astype(jnp.float32)  # row bases are re-anchored per depth below
    off_y = (y0h + by + PAD_Y) - ry * BAND_H
    off_x = (x0h + bx + PAD_X) - lx * BAND_W
    # Per-lane shears may go as low as -off_x: the 512-lane slab starts
    # off_x lanes below the block's base, so lanes whose hinted minimum sits
    # below the (probe-estimated) bx are still coverable.
    xsh_lo = 0.0 - off_x.astype(jnp.float32)

    rows = (jax.lax.broadcasted_iota(jnp.int32, (ROWS_E, COLS_E), 0) + y0h).astype(
        jnp.float32
    )
    cols = (jax.lax.broadcasted_iota(jnp.int32, (ROWS_E, COLS_E), 1) + x0h).astype(
        jnp.float32
    )
    in_img = (rows >= 0) & (rows < height) & (cols >= 0) & (cols < width)

    # --- per-depth displacements + the per-depth per-lane x shears --------
    # The x displacement of rigid plane-sweep motion varies mostly along x
    # (forward motion = zoom about the FOE) — a uniform lane base would need
    # up to ~50 taps per block at near depths. A PER-LANE integer shift (the
    # "shear") absorbs that profile, folded into the lane-selection one-hot
    # so each sheared slab is one MXU matmul; giving each hypothesis its OWN
    # shear also absorbs the chunk's inter-depth drift, leaving only the
    # bilinear fraction + rotation-induced row variation in the tap loop.
    dxs, dys, his = [], [], []
    any_hint = jnp.bool_(False)
    for dd in range(dchunk):
        m00, m01, m02, m10, m11, m12, m20, m21 = ms[dd]
        denom = m20 * cols + m21 * rows + 1.0 + 1e-7
        xs = (m00 * cols + m01 * rows + m02) / denom
        ys = (m10 * cols + m11 * rows + m12) / denom
        hint = (xs > -1.0) & (xs < width + 0.0) & (ys > -1.0) & (ys < height)
        dxs.append(xs - cols)
        dys.append(ys - rows)
        his.append(hint & in_img)
        any_hint = any_hint | jnp.any(his[-1])

    pos = jnp.float32(1e9)
    neg = -pos
    # Exact hinted PER-DEPTH row bases: the fetch base `by` is a hint-free
    # corner lower bound for the whole chunk; each hypothesis re-anchors
    # its OWN slab window at the exact vector min over its own hinted
    # pixels, clamped into the fetched 2-band window (pixels past the
    # clamp land in the coverage counter). A single chunk-shared base
    # (floor of the endpoint min, the pre-r05 design) overflows the
    # PY_N-row slab once the chunk's inter-depth y drift + the in-block
    # zoom span exceed KY — measured 105k uncovered pixels at 1.6 m/frame
    # + 2 deg rotation at 256x512 (tools/tpu_checks.py). Per-depth bases
    # remove the drift term entirely; only the in-block span remains
    # (ROWS_E*tz*inv_depth ~ 10 px at tz=1.6), which KY covers to
    # ~tz=2.5. Cost: the aligned slab is built per hypothesis instead of
    # per chunk (the build matmuls are ~4% of the select matmuls; the
    # select's M=C*PY_N=120 single-MXU-tile shape is untouched).
    slack = (2 * BAND_H - PY_N) - off_y

    own_bys = []
    for dd in range(dchunk):
        own_min_y = jnp.min(jnp.where(his[dd], dys[dd], pos))
        own_bys.append(
            jnp.clip(jnp.floor(own_min_y).astype(jnp.int32), by, by + slack)
        )

    # Shared-or-split slab decision: if ONE chunk-shared row base (the min
    # of the per-depth bases) keeps every hypothesis' fy inside KY — the
    # common case at driving-scale parallax, where the chunk's inter-depth
    # drift is a few px — the aligned slab is built once and shared
    # (identical cost to the r02-r04 design). Only when the drift would
    # overflow KY does each hypothesis re-anchor at its own base and pay a
    # per-depth slab build (+~9% sweep time, measured): the drift then
    # moves each window instead of eating the tap budget — the pre-r05
    # shared-only design lost 105k pixels at 1.6 m/frame + 2 deg rotation
    # at 256x512 (tools/tpu_checks.py).
    shared_by = own_bys[0]
    for bd in own_bys[1:]:
        shared_by = jnp.minimum(shared_by, bd)
    shared_byf = shared_by.astype(jnp.float32)
    if row_base_mode == "shared":  # static: always one chunk-shared base
        shared_ok = jnp.bool_(True)
    elif row_base_mode == "per_depth":  # static: always per-depth bases
        shared_ok = jnp.bool_(False)
    else:  # runtime decision per program
        shared_fy_max = neg
        for dd in range(dchunk):
            shared_fy_max = jnp.maximum(
                shared_fy_max,
                jnp.max(jnp.where(his[dd], dys[dd] - shared_byf, neg)),
            )
        shared_ok = shared_fy_max <= KY - 1.0

    fys, fxrs, xshfs, r_his, by_dds, byf_dds = [], [], [], [], [], []
    sy_hi = jnp.int32(0)
    r_hi = jnp.int32(0)
    for dd in range(dchunk):
        hi = his[dd]
        if row_base_mode == "shared":
            by_dd = shared_by
        elif row_base_mode == "per_depth":
            by_dd = own_bys[dd]
        else:
            by_dd = jnp.where(shared_ok, shared_by, own_bys[dd])
        byf_dd = by_dd.astype(jnp.float32)
        by_dds.append(by_dd)
        byf_dds.append(byf_dd)
        fy = dys[dd] - byf_dd
        # PER-DEPTH per-lane shears: each hypothesis' own lane profile
        # (min over its own hinted pixels per lane) is absorbed into its
        # own selection one-hot, so the residual tap window only spans the
        # bilinear fraction + in-block variation (R_PD taps).
        lane_min = jnp.min(jnp.where(hi, dxs[dd], pos), axis=0, keepdims=True)
        xsh_dd = jnp.clip(
            jnp.floor(lane_min - bxf), xsh_lo, float(XSH_MAX)
        ).astype(jnp.int32)  # (1, COLS_E)
        xshf = xsh_dd.astype(jnp.float32)
        fxr = dxs[dd] - bxf - xshf  # residual after this depth's shear
        fys.append(fy)
        fxrs.append(fxr)
        xshfs.append((xsh_dd, xshf))
        uncov = hi & (
            (fy > KY - 1.0) | (fy < 0.0) | (fxr > R_PD - 1.0) | (fxr < 0.0)
        )
        d = dc * dchunk + dd

        @pl.when((rb == 0) & (cb == 0))
        def _(d=d):
            cov_ref[n, d] = 0.0

        cov_ref[n, d] += jnp.sum(uncov.astype(jnp.float32))

        fy_max = jnp.max(jnp.where(hi, fy, neg))
        fxr_max = jnp.max(jnp.where(hi, fxr, neg))
        sy_hi = jnp.maximum(
            sy_hi, jnp.clip(jnp.floor(fy_max).astype(jnp.int32) + 2, 0, KY)
        )
        r_hi_dd = jnp.clip(jnp.floor(fxr_max).astype(jnp.int32) + 2, 0, R_PD)
        r_his.append(r_hi_dd)
        r_hi = jnp.maximum(r_hi, r_hi_dd)

    # Base index maps for the sheared one-hots, one per hypothesis:
    # src = dst + off_x + xsh_dd[dst].
    lane_src, lane_dst = lane_iotas(256)
    shear_bases = []
    for dd in range(dchunk):
        xsh_dd, _ = xshfs[dd]
        xsh_full = jnp.pad(xsh_dd, ((0, 0), (0, 256 - COLS_E)))
        shear_bases.append(lane_dst + off_x + xsh_full)  # (256, 256)

    # Weighted-selection eligibility (select_lanes_weighted): when the x
    # residual is ROW-UNIFORM — exactly true for translation-only
    # homographies, i.e. rotation-free plane sweeps including every
    # rectified stereo frame — and the per-lane shear absorbed the integer
    # part exactly (residual in [0, 1) over hinted lanes), the two hat
    # taps fold into ONE selection matmul per depth and the phase-B lane
    # loop collapses to a single iteration. Gated off for f32 sources on
    # real hardware: their selections must stay exact one-hots (bf16
    # weights would leak ~2^-9 into the EXACT policy); bf16 (serving)
    # sweeps already budget source quantization of that size, and
    # interpret mode uses f32 weights (bit-exact) so the CPU parity tests
    # cover the folded path.
    # MONOREC_CV_WSEL=0 disables the fold (A/B + regression testing).
    wsel_static = wsel and (interpret or band00_ref.dtype == jnp.bfloat16)
    if wsel_static and _ABLATE != "no_select":
        xuni = jnp.bool_(True)
        for dd in range(dchunk):
            # Row-uniform dx <=> the homography's x output has no row
            # dependence: m01 == 0 (numerator) and m21 == 0 (denominator)
            # — a SCALAR check (exactly true for translation-only sweeps;
            # the earlier grid-max formulation cost a (ROWS_E, COLS_E)
            # reduction per hypothesis).
            m01, m21 = ms[dd][1], ms[dd][7]
            xuni = xuni & (m01 == 0.0) & (m21 == 0.0)
            # Residual in [0, 1) over hinted lanes: the upper end reuses
            # the per-depth tap bound (r_hi_dd <= 2 <=> floor(fxr_max)
            # <= 0, trivially satisfied by an all-unhinted hypothesis);
            # the lower end only fails when the shear clipped.
            fmin = jnp.min(jnp.where(his[dd], fxrs[dd], pos))
            xuni = xuni & (r_his[dd] <= 2) & (fmin >= 0.0)
    else:
        xuni = jnp.bool_(False)
    # Phase-B lane-tap bound: 1 in weighted mode (x interpolation already
    # inside the slab), r_hi otherwise.
    r_hi_b = jnp.where(xuni, jnp.int32(1), r_hi)

    acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)
    macc_s[...] = jnp.zeros(macc_s.shape, jnp.float32)

    # --- phase A: aligned slab (shared or per-depth) + sheared slabs ------
    # Scratch is flat (dchunk*R_PD, ...) so phase B can index it with one
    # dynamic leading index (the proven-safe Mosaic pattern). The weights
    # are written under the SHARED bound r_hi: for s in [r_hi_dd, r_hi) the
    # hat weight is exactly zero for every pixel of depth dd (s >=
    # floor(fxr_max)+2), so phase B's reads of that depth's stale slab
    # slots are annihilated; only the expensive selection matmul is guarded
    # by the per-depth bound... which here is also the shared bound, since
    # an unwritten slot could hold non-finite bits that survive
    # multiplication by a zero weight (0*NaN).
    shear_dtype = jnp.float32 if interpret else jnp.bfloat16

    def build(off):
        return build_aligned_slab(
            band00_ref[0], band01_ref[0], band10_ref[0], band11_ref[0],
            off, PY_N, interpret,
        )[0]

    def write_weights(dd, s, sf):
        tx = cols + bxf + xshfs[dd][1] + sf
        ind_x = (
            (tx >= border_radius) & (tx < width - border_radius)
        ).astype(jnp.float32)
        # Zero the weight at unhinted pixels: their residual is
        # arbitrary, and a nonzero hat weight there could read a
        # slab slot no program ever wrote (uninitialized VMEM).
        # Hinted pixels of depth dd are zero past r_his[dd] by
        # construction. Unhinted pixels are masked downstream
        # either way (their taps fail the border indicators).
        wx = jnp.clip(1.0 - jnp.abs(fxrs[dd] - sf), 0.0, 1.0)
        wx = wx * his[dd].astype(jnp.float32)
        wx_s[dd * R_PD + s] = wx
        macc_s[dd, 1] += wx * ind_x

    def per_s_selects(dd, halves_v):
        for s in range(R_PD):

            @pl.when(s < r_hi)
            def _(s=s):
                write_weights(dd, s, float(s))
                if _ABLATE != "no_select":
                    shear_s[dd * R_PD + s] = select_lanes(
                        halves_v, lane_src, shear_bases[dd], s, shear_dtype,
                    )  # (C, PY_N, 256)

    def weighted_select(dd, halves_v):
        # Border-mask x interpolation: both hat taps, as the per-s path
        # accumulates them (fxr in [0,1) here, so s=0 carries 1-fxr and
        # s=1 carries fxr).
        for s2 in (0, 1):
            tx = cols + bxf + xshfs[dd][1] + float(s2)
            ind_x = (
                (tx >= border_radius) & (tx < width - border_radius)
            ).astype(jnp.float32)
            wtap = jnp.clip(1.0 - jnp.abs(fxrs[dd] - s2), 0.0, 1.0)
            macc_s[dd, 1] += wtap * his[dd].astype(jnp.float32) * ind_x
        # Phase B multiplies by wx_s: the bilinear weight lives in the
        # slab now, so the slot carries only the hint mask.
        wx_s[dd * R_PD] = his[dd].astype(jnp.float32)
        fr = jnp.clip(
            jnp.pad(fxrs[dd][0:1, :], ((0, 0), (0, 256 - COLS_E))),
            0.0, 1.0,
        )
        shear_s[dd * R_PD] = select_lanes_weighted(
            halves_v, lane_src, shear_bases[dd], fr, shear_dtype,
        )  # (C, PY_N, 256)

    def select_all(shared_slab: bool):
        """Sheared-slab selection for every (depth, lane-tap) slot. The
        slab values are built INSIDE the caller's pl.when branch, so the
        shared-vs-per-depth choice stays runtime-conditional without
        staging the slab through scratch (a staged version measured
        ~+3 ms per sweep in pure roundtrips)."""
        halves_v = None
        for dd in range(dchunk):
            if not shared_slab or dd == 0:
                halves_v = build(off_y + (by_dds[dd] - by))
            if wsel_static and _ABLATE != "no_select":

                @pl.when(xuni)
                def _(dd=dd, halves_v=halves_v):
                    weighted_select(dd, halves_v)

                @pl.when(jnp.logical_not(xuni))
                def _(dd=dd, halves_v=halves_v):
                    per_s_selects(dd, halves_v)

            else:
                per_s_selects(dd, halves_v)

    # Row-aligned slab (machinery in slab.py, shared with grid_warp.py):
    # built once when the chunk shares one base, rebuilt per hypothesis
    # otherwise. Static modes emit one branch; "auto" emits both under
    # runtime predicates.
    if row_base_mode == "shared":

        @pl.when(any_hint)
        def _():
            select_all(shared_slab=True)

    elif row_base_mode == "per_depth":

        @pl.when(any_hint)
        def _():
            select_all(shared_slab=False)

    else:

        @pl.when(any_hint & shared_ok)
        def _():
            select_all(shared_slab=True)

        @pl.when(any_hint & jnp.logical_not(shared_ok))
        def _():
            select_all(shared_slab=False)

    # --- phase B: banded y taps over the per-depth sheared slabs ----------
    for sy in range(0 if _ABLATE == "no_tapb" else KY):
        syf = float(sy)

        @pl.when(any_hint & (sy < sy_hi))
        def _(sy=sy, syf=syf):
            wys = []
            for dd in range(dchunk):
                ty = rows + byf_dds[dd] + syf
                ind_y = (
                    (ty >= border_radius) & (ty < height - border_radius)
                ).astype(jnp.float32)
                wy = jnp.clip(1.0 - jnp.abs(fys[dd] - syf), 0.0, 1.0)
                wys.append(wy)
                macc_s[dd, 0] += wy * ind_y

            def sbody(s, _):
                # r_hi_b = max over depths (1 in weighted-selection mode);
                # taps past a depth's own r_hi have zero hat weight (and
                # read a stale-but-finite slab slot), so no per-depth
                # predication is needed in the body.
                for dd in range(dchunk):
                    src = shear_s[dd * R_PD + s, :, sy : sy + ROWS_E, :COLS_E]
                    acc_s[dd] += (wys[dd] * wx_s[dd * R_PD + s])[None] * src
                return 0

            jax.lax.fori_loop(0, r_hi_b, sbody, 0)

    # --- in-register SSIM + channel-weighted 3x3 SAD ----------------------
    # NOTE on borders: the reference reflect-pads the warped image for SSIM
    # and zero-pads the weighted diff for the SAD box sum. Both only affect
    # SAD values within 2 px of the image border — exactly the
    # border_radius=2 ring that ``valid``'s border_mask zeroes downstream
    # (monorec_model.py:282-284), so this kernel leaves border-ring SAD
    # values unspecified instead of spending rolls on the reflection fix.
    cw = [float(x) for x in channel_weights]

    if _ABLATE == "no_epilogue":
        for dd in range(dchunk):
            sad_ref[0, dd] = acc_s[dd, 0, HALO : HALO + ROWS, HALO : HALO + COLS]
            wm = macc_s[dd, 0] * macc_s[dd, 1]
            wmask_ref[0, dd] = wm[HALO : HALO + ROWS, HALO : HALO + COLS]
        return

    for dd in range(dchunk):
        w = acc_s[dd] + 0.5  # warped + 0.5 (SSIM input domain, layers.py:120)
        k = key_ref[0, 0, 0].astype(jnp.float32)  # already + 0.5

        if use_ssim in (1, 2):
            mu_x_s = _box3(w)
            ex2_s = _box3(w * w)
            exy_s = _box3(w * k)
            mu_y_s = kst_s[0:channels]
            ey2_s = kst_s[channels : 2 * channels]
            mu_x = mu_x_s * (1.0 / 9.0)
            mu_y = mu_y_s * (1.0 / 9.0)
            sigma_x = ex2_s * (1.0 / 9.0) - mu_x * mu_x
            sigma_y = ey2_s * (1.0 / 9.0) - mu_y * mu_y
            sigma_xy = exy_s * (1.0 / 9.0) - mu_x * mu_y
            nume = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
            deno = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
            diff = jnp.clip((1.0 - nume / deno) * 0.5, 0.0, 1.0)
            if use_ssim == 2:
                l1 = jnp.abs(
                    w[:, 1 : 1 + ROWS + 2, 1 : 1 + COLS + 2]
                    - k[:, 1 : 1 + ROWS + 2, 1 : 1 + COLS + 2]
                )
                diff = 0.85 * diff + 0.15 * l1
        elif use_ssim == 0:
            diff = jnp.abs(
                w[:, 1 : 1 + ROWS + 2, 1 : 1 + COLS + 2]
                - k[:, 1 : 1 + ROWS + 2, 1 : 1 + COLS + 2]
            )
        else:
            # 3x3 zero-padded avg-pooled L1 (reference "else" branch).
            l1 = jnp.abs(w - k) * in_img.astype(jnp.float32)[None]
            diff = _box3(l1) * (1.0 / 9.0)

        e = cw[0] * diff[0]
        for c in range(1, channels):
            e = e + cw[c] * diff[c]
        sad_ref[0, dd] = _box3(e)
        wm = macc_s[dd, 0] * macc_s[dd, 1]
        wmask_ref[0, dd] = wm[HALO : HALO + ROWS, HALO : HALO + COLS]


def plane_sweep_sad(
    images: Array,  # (N, C, H, W) float32 or bfloat16 in [-0.5, 0.5]
    keyframes: Array,  # (B, C, H, W) float32, N == B * frames_per_image
    homographies: Array,  # (N, D, 3, 3), normalized so m22 == 1
    border_radius: int = 2,
    frames_per_image: int = 2,
    use_ssim: int = 1,
    channel_weights: Tuple[float, ...] = (5 / 32 / 9, 16 / 32 / 9, 11 / 32 / 9),
    interpret: bool = False,
    row_base_mode: str = None,
) -> Tuple[Array, Array, Array]:
    """Public entry: resolves the row-base mode (env override read OUTSIDE
    the jit boundary so it can never alias a stale cache entry) and
    delegates to the jitted implementation."""
    import os as _os

    if row_base_mode is None:
        row_base_mode = _os.environ.get("MONOREC_CV_ROW_BASES", "auto")
    assert row_base_mode in ("auto", "shared", "per_depth"), row_base_mode
    # The dchunk / weighted-selection overrides must also resolve OUTSIDE
    # the jit boundary (and be part of the jit key) for the same
    # stale-cache reason.
    dchunk_env = _os.environ.get("MONOREC_CV_DCHUNK")
    wsel = _os.environ.get("MONOREC_CV_WSEL", "1") != "0"
    return _plane_sweep_sad_impl(
        images, keyframes, homographies,
        border_radius=border_radius, frames_per_image=frames_per_image,
        use_ssim=use_ssim, channel_weights=channel_weights,
        interpret=interpret, row_base_mode=row_base_mode,
        dchunk_env=int(dchunk_env) if dchunk_env else None,
        wsel=wsel,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "border_radius", "frames_per_image", "use_ssim", "channel_weights",
        "interpret", "row_base_mode", "dchunk_env", "wsel",
    ),
)
def _plane_sweep_sad_impl(
    images: Array,  # (N, C, H, W) float32 or bfloat16 in [-0.5, 0.5]
    keyframes: Array,  # (B, C, H, W) float32, N == B * frames_per_image
    homographies: Array,  # (N, D, 3, 3), normalized so m22 == 1
    border_radius: int = 2,
    frames_per_image: int = 2,
    use_ssim: int = 1,
    channel_weights: Tuple[float, ...] = (5 / 32 / 9, 16 / 32 / 9, 11 / 32 / 9),
    interpret: bool = False,
    row_base_mode: str = "auto",
    dchunk_env: int = None,
    wsel: bool = True,
) -> Tuple[Array, Array, Array]:
    """Fused plane-sweep scoring: SAD(SSIM(warp(images), keyframe)).

    ``channel_weights`` are the reference's per-channel conv3d weights
    *already divided by patch_size**2* (``monorec_model.py:141-142``); the
    kernel applies the extra 1/9 of the SSIM window internally.

    Returns sad (N, D, H, W), warped border mask (N, D, H, W), and
    uncovered-pixel counts (N, D).
    """
    n, c, h, w = images.shape
    b = keyframes.shape[0]
    d = homographies.shape[1]
    assert h % ROWS == 0 and w % COLS == 0, (h, w)
    assert n == b * frames_per_image, (n, b, frames_per_image)
    assert len(channel_weights) == c

    # Depth hypotheses per program. More hypotheses per chunk amortize the
    # per-program fixed work — measured 2.9 us/program of setup
    # (displacement grids, bases, Mosaic grid overhead), ~39% of the r05
    # dchunk=4 sweep — and the r05 per-depth row bases absorb the chunk's
    # inter-depth y drift, so dchunk no longer eats the KY tap budget
    # (dchunk=8 coverage re-verified by the full tools/tpu_checks.py
    # suite: in-envelope cases exactly 0). dchunk=8 on bf16 sources:
    # 61.1 -> 53.0 ms on the B=8 F=2 D=32 mono sweep. f32 sources keep
    # dchunk=4: their hi/lo two-pass matmuls at 48 slab slots degrade
    # badly (241 vs 156 ms at tz=0.8) — VMEM pressure serializes the
    # pipeline. MONOREC_CV_DCHUNK overrides for experiments.
    if images.dtype == jnp.bfloat16 and d % 8 == 0 and d >= 32:
        dchunk = 8
    elif d % 4 == 0 and d >= 24:
        dchunk = 4
    elif d % 2 == 0 and d >= 12:
        dchunk = 2
    else:
        dchunk = 1
    if dchunk_env and d % dchunk_env == 0:  # perf experiments only
        dchunk = dchunk_env


    padded = jnp.pad(images, ((0, 0), (0, 0), (PAD_Y, PAD_Y), (PAD_X, PAD_X)))
    key_p = jnp.pad(
        keyframes.astype(jnp.float32) + 0.5,
        ((0, 0), (0, 0), (HALO, HALO), (HALO, HALO)),
        mode="reflect",
    )
    # Overlapping halo'd keyframe blocks, pre-gathered so the kernel reads
    # them through an ordinary (pipelined) BlockSpec: (B, RB, CB, C, RE, CE).
    rb_n, cb_n = h // ROWS, w // COLS
    key_rows = jnp.stack(
        [key_p[:, :, r * ROWS : r * ROWS + ROWS_E, :] for r in range(rb_n)], 1
    )
    key_blocks = jnp.stack(
        [key_rows[..., cc * COLS : cc * COLS + COLS_E] for cc in range(cb_n)], 2
    )

    hom = jnp.asarray(homographies.reshape(n * d, 9)[:, :8], jnp.float32)

    grid = (n, h // ROWS, w // COLS, d // dchunk)
    n_row_bands = (h + 2 * PAD_Y) // BAND_H
    n_lane_bands = (w + 2 * PAD_X) // BAND_W

    def band_index(ni, rbi, cbi, dci, hom_ref, dr, dl):
        m0 = _read_hom(hom_ref, ni, dci * dchunk, d)
        m1 = _read_hom(hom_ref, ni, dci * dchunk + dchunk - 1, d)
        _, _, ry, lx = _union_bases(
            m0, m1, rbi * ROWS - HALO, cbi * COLS - HALO, h, w
        )
        ry = jnp.clip(ry + dr, 0, n_row_bands - 1)
        lx = jnp.clip(lx + dl, 0, n_lane_bands - 1)
        return (ni, 0, ry, lx)

    def band_spec(dr, dl):
        return pl.BlockSpec(
            (1, c, BAND_H, BAND_W),
            functools.partial(band_index, dr=dr, dl=dl),
        )

    kernel = functools.partial(
        _sad_kernel,
        height=h,
        width=w,
        border_radius=border_radius,
        n_depths=d,
        dchunk=dchunk,
        frames_per_image=frames_per_image,
        use_ssim=use_ssim,
        channel_weights=channel_weights,
        interpret=interpret,
        row_base_mode=row_base_mode,
        wsel=wsel,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            band_spec(0, 0), band_spec(0, 1), band_spec(1, 0), band_spec(1, 1),
            pl.BlockSpec(
                (1, 1, 1, c, ROWS_E, COLS_E),
                lambda ni, rbi, cbi, dci, hom: (
                    ni // frames_per_image, rbi, cbi, 0, 0, 0
                ),
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, dchunk, ROWS, COLS),
                lambda ni, rbi, cbi, dci, hom: (ni, dci, rbi, cbi),
            ),
            pl.BlockSpec(
                (1, dchunk, ROWS, COLS),
                lambda ni, rbi, cbi, dci, hom: (ni, dci, rbi, cbi),
            ),
            pl.BlockSpec(
                (n, d), lambda ni, rbi, cbi, dci, hom: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * c, ROWS + 2, COLS + 2), jnp.float32),
            pltpu.VMEM((dchunk, c, ROWS_E, COLS_E), jnp.float32),
            pltpu.VMEM((dchunk, 2, ROWS_E, COLS_E), jnp.float32),
            pltpu.VMEM((dchunk * R_PD, c, PY_N, 256), jnp.float32),
            pltpu.VMEM((dchunk * R_PD, ROWS_E, COLS_E), jnp.float32),
        ],
    )

    sad, wmask, cov = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, d, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, d, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(hom, padded, padded, padded, padded, key_blocks)
    return sad, wmask, cov
