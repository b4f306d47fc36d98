"""Pallas TPU kernel: general bilinear grid sampling (data-driven coords).

The reprojection losses warp source frames by the *predicted* depth
(``common_losses.py:16-114`` in the reference); unlike the plane-sweep
kernel the sample coordinates are per-pixel data, so they cannot be folded
into scalar-prefetched homographies. XLA lowers the ``jnp.take``
formulation to serial gathers — measured 4.3 ms per 256x512x3 warp, 413 ms
of a 612 ms stage-1 train step. This kernel reuses the cv_kernel machinery
with the displacement field read from VMEM instead of computed from
scalars:

* per (image, row-block, col-block) program, the four source bands covering
  the block's displacement window are DMA'd via index maps driven by
  per-block integer bounds (min displacement over the block, precomputed on
  the XLA side and scalar-prefetched);
* ONE row-aligned 128x512 slab per program (exact one-hot permutation
  matmuls on bf16 hi/lo parts); the per-lane x displacement profile is
  absorbed by a per-lane integer shear folded into the lane-selection
  one-hots; the bilinear tap loop covers the residual spread with a
  DYNAMIC-bound double loop (s outer over lane taps, sy inner over row
  taps via ``fori_loop`` on a single slab scratch), so the cost scales
  with each block's actual displacement spread, not the static window;
* the windows are sized for depth-discontinuity warps: a depth edge makes
  BOTH coordinates jump (dx and dy jump by up to coord*t*delta_inv under
  forward motion — measured ~33 px of dy at a 5 m object under 1.4 m
  ego-motion), so the row window KY=48 (128-row band slab) covers ~46 px
  dy jumps and the lane residual window R_MAX=72 covers ~70 px disparity
  jumps (the worst fixture-scale stereo edge is ~65 px); pixels beyond
  produce 0 (the losses treat them as invalid reprojections) and are
  counted per image;
* out-of-image taps read the image's zero padding — torch
  ``grid_sample(padding_mode='zeros', align_corners=False)`` semantics;
* the same banded machinery computes the *coordinate gradient* two ways:
  ``grid_warp_jac`` emits the per-pixel Jacobian (d out/dx, d out/dy)
  alongside the values in the SAME pass (two extra FMAs per tap; the
  training VJP then reduces it against the cotangent elementwise, so the
  gather machinery runs once per warp), and ``grid_warp_grad`` is a
  standalone cotangent-contracting pass. Neither needs a scatter (image
  gradients are never needed — the warped frames are data, not
  parameters).

Layout: images (N, C, H, W) channels-first, coords as absolute pixel
positions (align_corners=False units) in two (N, H, W) planes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monorec_tpu.ops.pallas.slab import (
    BAND_W,
    build_aligned_slab,
    lane_iotas,
    select_lanes,
)

Array = jax.Array

import os as _os

# Output rows per program. 32 (default) halves per-program overhead,
# slab-build matmuls and band DMA per output pixel versus 16, at the cost
# of 128-row bands (more VMEM); measured +4% on the full stage-1 train step
# with identical kernel outputs (the tap math is ROWS-independent).
# Experiment knob (read once at import): MONOREC_GW_ROWS=16.
ROWS = int(_os.environ.get("MONOREC_GW_ROWS", "32"))
assert ROWS in (16, 32), ROWS
COLS = 128  # output cols per program
BAND_H = 4 * ROWS  # row-band granularity: the 2-band slab gives KY=48 taps
PAD_Y = 48  # top padding (the bottom pad grows to fill whole bands)
KY = 48  # row tap window: within-block dy spread incl. depth-edge jumps
PY_N = KY + ROWS  # row-permutation rows (>= KY + ROWS - 1, multiple of 8)
# Residual lane taps after the per-lane shear. The shear absorbs across-lane
# (vertical-edge) disparity jumps up to XSH_MAX; ACROSS-ROW jumps
# (horizontal depth edges) land in the residual window, so R_MAX bounds the
# representable within-column spread — pixels beyond it are zeroed +
# counted (the losses treat them as invalid reprojections). 72 covers the
# worst stereo edge jump at fixture-scale intrinsics (fx*0.54*full
# inv-range ~ 65 px at a 3.2 m object; real-KITTI fx ~ 497 pushes it to
# ~84 px — those extreme rows stay counted); vertical-edge jumps beyond
# XSH_MAX spill into this window too (total per-lane reach
# XSH_MAX + R_MAX = 129 either way). Both loops are bounded by dynamic
# (r_hi, sy_hi), so smooth blocks pay nothing.
R_MAX = 72
XSH_MAX = (2 * BAND_W - 1) - (BAND_W - 1) - (COLS - 1) - (R_MAX - 1)

assert (BAND_H - 1) + KY + ROWS - 1 <= 2 * BAND_H
assert PY_N >= KY + ROWS - 1
# The 8-strided row loop reads aligned 24-row windows up to the last tap.
assert KY % 8 == 0 and PY_N >= 8 * (KY // 8 - 1) + ROWS + 8
assert XSH_MAX > 0


def _hat_grad(d: Array) -> Array:
    """Derivative of the bilinear hat weight w.r.t. the coordinate, in the
    reference convention (``wx1 = x - x0``, no abs): a tap at offset
    d = frac - s is the floor tap for d in [0, 1) (derivative -1) and the
    ceil tap for d in [-1, 0) (derivative +1). ``-sign(d)`` would return 0
    at exactly-integer fractions, where torch/XLA autodiff gives
    I[x0+1] - I[x0]."""
    return jnp.where(
        (d >= 0.0) & (d < 1.0),
        -1.0,
        jnp.where((d >= -1.0) & (d < 0.0), 1.0, 0.0),
    )


def _pad_extents(height: int, width: int) -> Tuple[int, int, int, int]:
    """(pad_top, pad_bottom, pad_left, pad_right): zero padding such that the
    2-band window (2*BAND_H rows x 512 lanes) always fits the padded
    extent."""
    total_h = -(-(height + PAD_Y + BAND_H) // BAND_H) * BAND_H
    total_w = -(-(width + 2 * BAND_W) // BAND_W) * BAND_W
    return PAD_Y, total_h - height - PAD_Y, BAND_W, total_w - width - BAND_W


def _bounds_clip(height: int, width: int) -> Tuple[int, int, int, int]:
    """Clip range for the per-block (by, bx) bases so every derived band
    index (incl. +1) is in range."""
    pt, pb, plft, prt = _pad_extents(height, width)
    n_row_bands = (height + pt + pb) // BAND_H
    n_lane_bands = (width + plft + prt) // BAND_W
    by_lo = -(pt - 2)
    by_hi = (n_row_bands - 1) * BAND_H - pt - (height - ROWS) - 1
    bx_lo = -(plft - 2)
    bx_hi = (n_lane_bands - 1) * BAND_W - plft - (width - COLS) - 1
    return by_lo, min(by_hi, pt - 2), bx_lo, min(bx_hi, plft - 2)


def _compute_bounds(
    xs: Array, ys: Array, height: int, width: int
) -> Array:
    """Per-block integer displacement bases (2, N*RB*CB) int32, from the min
    displacement over each block's in-image ("hinted") pixels. Laid out
    coordinate-major: SMEM pads every leading-dim row, so (NB, 2) would
    burn ~512 B per block and blow the 1 MB SMEM budget at ~2k blocks
    (a 4-scale-stacked loss warp is 6k blocks); (2, NB) is two rows."""
    n, h, w = xs.shape
    rb, cb = h // ROWS, w // COLS
    rows = jnp.arange(h, dtype=xs.dtype)[None, :, None]
    cols = jnp.arange(w, dtype=xs.dtype)[None, None, :]
    hint = (xs > -1.0) & (xs < width) & (ys > -1.0) & (ys < height)
    big = jnp.asarray(1e9, xs.dtype)
    dy = jnp.where(hint, ys - rows, big).reshape(n, rb, ROWS, cb, COLS)
    dx = jnp.where(hint, xs - cols, big).reshape(n, rb, ROWS, cb, COLS)
    dy_min = jnp.min(dy, axis=(2, 4))
    dx_min = jnp.min(dx, axis=(2, 4))
    by_lo, by_hi, bx_lo, bx_hi = _bounds_clip(height, width)
    by = jnp.clip(jnp.floor(dy_min), by_lo, by_hi).astype(jnp.int32)
    bx = jnp.clip(jnp.floor(dx_min), bx_lo, bx_hi).astype(jnp.int32)
    return jnp.stack(
        [by.reshape(n * rb * cb), bx.reshape(n * rb * cb)], axis=0
    )


def _warp_kernel(
    bounds_ref,  # SMEM (2, N*RB*CB): row 0 = per-block by, row 1 = bx
    band00_ref, band01_ref, band10_ref, band11_ref,  # source bands
    x_ref, y_ref,  # (1, ROWS, COLS) absolute pixel coords
    cot_ref_or_out,  # bwd: cot (1, C, ROWS, COLS); fwd: out (1, C, ROWS, COLS)
    *refs,
    height: int,
    width: int,
    rb_n: int,
    cb_n: int,
    pad_top: int,
    pad_left: int,
    with_grad: bool,
    with_jac: bool,
    interpret: bool,
):
    if with_grad:
        cot_ref = cot_ref_or_out
        out_ref, cov_ref, acc_s, cur_s = refs
    elif with_jac:
        out_ref = cot_ref_or_out
        jx_ref, jy_ref, cov_ref, acc_s, cur_s = refs
    else:
        out_ref = cot_ref_or_out
        cov_ref, acc_s, cur_s = refs

    n = pl.program_id(0)
    rbi = pl.program_id(1)
    cbi = pl.program_id(2)
    y0 = rbi * ROWS
    x0 = cbi * COLS

    flat = (n * rb_n + rbi) * cb_n + cbi
    by = bounds_ref[0, flat]
    bx = bounds_ref[1, flat]
    byf = by.astype(jnp.float32)
    bxf = bx.astype(jnp.float32)

    rows = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 0) + y0).astype(
        jnp.float32
    )
    cols = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1) + x0).astype(
        jnp.float32
    )
    xs = x_ref[0].astype(jnp.float32)
    ys = y_ref[0].astype(jnp.float32)
    hint = (xs > -1.0) & (xs < width + 0.0) & (ys > -1.0) & (ys < height + 0.0)
    any_hint = jnp.any(hint)

    dy = ys - rows
    dx = xs - cols
    fy = dy - byf  # (ROWS, COLS)

    pos = jnp.float32(1e9)
    neg = -pos
    lane_min = jnp.min(jnp.where(hint, dx, pos), axis=0, keepdims=True)
    xsh = jnp.clip(
        jnp.floor(lane_min - bxf), 0.0, float(XSH_MAX)
    ).astype(jnp.int32)  # (1, COLS)
    xshf = xsh.astype(jnp.float32)
    fxr = dx - bxf - xshf  # residual after the per-lane shear

    uncov = hint & (
        (fy > KY - 1.0) | (fy < 0.0) | (fxr > R_MAX - 1.0) | (fxr < 0.0)
    )

    @pl.when((rbi == 0) & (cbi == 0))
    def _():
        cov_ref[n] = 0.0

    cov_ref[n] += jnp.sum(uncov.astype(jnp.float32))

    fy_max = jnp.max(jnp.where(hint, fy, neg))
    fxr_max = jnp.max(jnp.where(hint, fxr, neg))
    sy_hi = jnp.clip(jnp.floor(fy_max).astype(jnp.int32) + 2, 0, KY)
    r_hi = jnp.clip(jnp.floor(fxr_max).astype(jnp.int32) + 2, 0, R_MAX)

    # --- row-aligned slab (machinery in slab.py, shared with cv_kernel) ---
    ry = (y0 + by + pad_top) // BAND_H
    lx = (x0 + bx + pad_left) // BAND_W
    off_y = (y0 + by + pad_top) - ry * BAND_H
    off_x = (x0 + bx + pad_left) - lx * BAND_W
    halves, shear_dtype = build_aligned_slab(
        band00_ref[0], band01_ref[0], band10_ref[0], band11_ref[0],
        off_y, PY_N, interpret,
    )  # (C, PY_N, 256) half pairs — C-major keeps ROWS in the sublane dim

    lane_src, lane_dst = lane_iotas(256)
    xsh_full = jnp.pad(xsh, ((0, 0), (0, 256 - COLS)))
    shear_base = lane_dst + off_x + xsh_full  # (512, 256)

    acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)
    if with_grad:
        cot = cot_ref[0].astype(jnp.float32)  # (C, ROWS, COLS)

    # --- double tap loop: lane taps outer (one sheared slab at a time in
    # scratch), row taps inner — BOTH loops are dynamic fori_loops, so the
    # compiled program holds ONE copy of the tap body and per-block cost
    # scales with the block's actual displacement spread --------------------
    def sbody(s, _):
        cur_s[...] = select_lanes(
            halves, lane_src, shear_base, s, shear_dtype
        )  # (C, PY_N, 256)
        d = fxr - s.astype(jnp.float32)
        wxs = jnp.clip(1.0 - jnp.abs(d), 0.0, 1.0)
        dwxs = _hat_grad(d) if (with_grad or with_jac) else None

        # Mosaic only allows dynamic sublane offsets that are multiples
        # of 8, so the row loop strides by 8 (one aligned 24-row window
        # read per iteration) with a BRANCH-FREE static 8-tap sub-loop:
        # taps beyond a pixel's fraction window have zero hat weight,
        # so no per-tap predication is needed (and scalar branches in
        # tap loops dominate runtime — see cv_kernel).
        def cbody(ci, _):
            v = cur_s[:, pl.ds(8 * ci, ROWS + 8), :COLS]
            base = (8 * ci).astype(jnp.float32)
            for f in range(8):
                dyy = fy - (base + float(f))
                wy = jnp.clip(1.0 - jnp.abs(dyy), 0.0, 1.0)
                src = v[:, f : f + ROWS, :]
                if with_grad:
                    dwy = _hat_grad(dyy)
                    ctv = jnp.sum(cot * src, axis=0)  # (ROWS, COLS)
                    acc_s[0] += dwxs * wy * ctv
                    acc_s[1] += wxs * dwy * ctv
                elif with_jac:
                    c = src.shape[0]
                    dwy = _hat_grad(dyy)
                    acc_s[:c] += (wy * wxs)[None] * src
                    acc_s[c : 2 * c] += (wy * dwxs)[None] * src
                    acc_s[2 * c :] += (dwy * wxs)[None] * src
                else:
                    acc_s[...] += (wy * wxs)[None] * src
            return 0

        jax.lax.fori_loop(0, (sy_hi + 7) // 8, cbody, 0)
        return 0

    @pl.when(any_hint)
    def _():
        jax.lax.fori_loop(0, r_hi, sbody, 0)

    if with_jac:
        c = out_ref.shape[1]
        out_ref[0] = acc_s[:c]
        jx_ref[0] = acc_s[c : 2 * c]
        jy_ref[0] = acc_s[2 * c :]
    else:
        out_ref[0] = acc_s[...]


def _make_call(
    images: Array,  # (N, C, H, W)
    xs: Array,  # (N, H, W)
    ys: Array,  # (N, H, W)
    cot: Optional[Array],  # (N, C, H, W) for the gradient pass
    interpret: bool,
    with_jac: bool = False,
):
    n, c, h, w = images.shape
    assert h % ROWS == 0 and w % COLS == 0, (h, w)
    assert xs.shape == (n, h, w) and ys.shape == (n, h, w)
    with_grad = cot is not None
    assert not (with_grad and with_jac)

    pt, pb, plft, prt = _pad_extents(h, w)
    padded = jnp.pad(images, ((0, 0), (0, 0), (pt, pb), (plft, prt)))
    n_row_bands = (h + pt + pb) // BAND_H
    n_lane_bands = (w + plft + prt) // BAND_W

    bounds = _compute_bounds(xs, ys, h, w)
    rb_n, cb_n = h // ROWS, w // COLS

    def band_index(ni, rbi, cbi, bounds_ref, dr, dl):
        flat = (ni * rb_n + rbi) * cb_n + cbi
        ry = (rbi * ROWS + bounds_ref[0, flat] + pt) // BAND_H
        lx = (cbi * COLS + bounds_ref[1, flat] + plft) // BAND_W
        ry = jnp.clip(ry + dr, 0, n_row_bands - 1)
        lx = jnp.clip(lx + dl, 0, n_lane_bands - 1)
        return (ni, 0, ry, lx)

    def band_spec(dr, dl):
        return pl.BlockSpec(
            (1, c, BAND_H, BAND_W),
            functools.partial(band_index, dr=dr, dl=dl),
        )

    coord_spec = pl.BlockSpec(
        (1, ROWS, COLS), lambda ni, rbi, cbi, bounds: (ni, rbi, cbi)
    )
    full_spec = pl.BlockSpec(
        (1, c, ROWS, COLS), lambda ni, rbi, cbi, bounds: (ni, 0, rbi, cbi)
    )

    in_specs = [band_spec(0, 0), band_spec(0, 1), band_spec(1, 0), band_spec(1, 1),
                coord_spec, coord_spec]
    inputs = [padded, padded, padded, padded, xs, ys]
    if with_grad:
        in_specs.append(full_spec)
        inputs.append(cot)
        out_specs = [
            pl.BlockSpec(
                (1, 2, ROWS, COLS),
                lambda ni, rbi, cbi, bounds: (ni, 0, rbi, cbi),
            )
        ]
        out_shapes = [jax.ShapeDtypeStruct((n, 2, h, w), jnp.float32)]
        acc_shape = (2, ROWS, COLS)
    elif with_jac:
        out_specs = [full_spec, full_spec, full_spec]  # out, d/dx, d/dy
        out_shapes = [jax.ShapeDtypeStruct((n, c, h, w), jnp.float32)] * 3
        acc_shape = (3 * c, ROWS, COLS)
    else:
        out_specs = [full_spec]
        out_shapes = [jax.ShapeDtypeStruct((n, c, h, w), jnp.float32)]
        acc_shape = (c, ROWS, COLS)

    kernel = functools.partial(
        _warp_kernel,
        height=h,
        width=w,
        rb_n=rb_n,
        cb_n=cb_n,
        pad_top=pt,
        pad_left=plft,
        with_grad=with_grad,
        with_jac=with_jac,
        interpret=interpret,
    )

    scratch = [
        pltpu.VMEM(acc_shape, jnp.float32),
        pltpu.VMEM((c, PY_N, 256), jnp.float32),  # current sheared slab
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, rb_n, cb_n),
        in_specs=in_specs,
        out_specs=out_specs
        + [
            pl.BlockSpec(
                (n,), lambda ni, rbi, cbi, bounds: (0,),
                memory_space=pltpu.SMEM,
            ),
        ],
        scratch_shapes=scratch,
    )

    *outs, cov = pl.pallas_call(
        kernel,
        out_shape=out_shapes + [jax.ShapeDtypeStruct((n,), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(bounds, *inputs)
    return (tuple(outs) if with_jac else outs[0]), cov


@functools.partial(jax.jit, static_argnames=("interpret",))
def grid_warp(
    images: Array, xs: Array, ys: Array, interpret: bool = False
) -> Tuple[Array, Array]:
    """Bilinear sample ``images`` (N, C, H, W) at absolute pixel coords
    (``xs``, ``ys``; each (N, H, W)), zeros padding. Returns the warped
    images (N, C, H, W) f32 and per-image uncovered-pixel counts (N,)."""
    return _make_call(images, xs, ys, None, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def grid_warp_jac(
    images: Array, xs: Array, ys: Array, interpret: bool = False
) -> Tuple[Tuple[Array, Array, Array], Array]:
    """Forward warp that also emits the per-pixel coordinate Jacobian in
    ONE banded pass: returns ((out, d/dxs, d/dys), cov), each (N, C, H, W).
    Two extra VPU FMAs per tap versus re-running the whole
    band/slab/selection machinery in a second gradient pass — the training
    VJP saves the Jacobian planes and reduces them against the cotangent
    elementwise (no second kernel launch)."""
    return _make_call(images, xs, ys, None, interpret, with_jac=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def grid_warp_grad(
    images: Array, xs: Array, ys: Array, cot: Array, interpret: bool = False
) -> Tuple[Array, Array]:
    """Coordinate gradient of ``sum(grid_warp(...) * cot)``: returns
    (N, 2, H, W) — channel 0 = d/dxs, channel 1 = d/dys."""
    g, _ = _make_call(images, xs, ys, cot, interpret)
    return g[:, 0], g[:, 1]
