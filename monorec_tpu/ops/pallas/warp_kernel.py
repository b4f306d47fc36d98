"""Fused Pallas TPU kernel: plane-sweep homography warping.

TPU has no fast vector gather — XLA lowers ``jnp.take`` to serial loops
(~420 ms for one image's 32-hypothesis warp; the whole XLA cost volume ran at
1.5 keyframes/s). This kernel removes every gather:

* the grid is (image, depth, row-block, col-block); for each program the
  index maps (driven by the scalar-prefetched homographies — index maps are
  scalar jaxprs, the documented Pallas mechanism for data-dependent
  fetching) DMA exactly the four BAND_H x BAND_W bands of the padded source
  image that the sub-block's displacement window needs, so arbitrary
  in-image displacements are supported without giant VMEM slabs;
* the residual offset inside the fetched slab is aligned with exact one-hot
  PERMUTATION MATMULS on the MXU at HIGHEST precision (Mosaic's dynamic
  rotates/slices are unreliable on this stack, and bit-decomposed rolls are
  VPU-bandwidth-bound);
* bilinear sampling is banded tap accumulation: static row bands (predicated
  by ``pl.when``) and a dynamic-trip-count lane loop that advances with a
  static roll-by-1 — executed taps track the actual displacement spread, and
  no per-tap scalar branch is paid for skipped taps;
* the warped border-validity mask (reference grid-samples a border
  indicator, ``monorec_model.py:212-219``) factors into (vertical interp of
  the row indicator) x (horizontal interp of the column indicator) and is
  accumulated outside the quadratic loop;
* a per-(image, depth) coverage counter reports pixels whose in-image source
  fell outside the tap window (0 for rigid driving motion; such pixels
  degrade to "invalid reprojection", which the cost volume masks anyway).

Layout: images are (N, C, H, W) channels-first with W in lanes; outputs
(N, D, C, H, W) / (N, D, H, W).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

ROWS = 16  # output rows per program
COLS = 128  # output cols per program
BAND_H = 32  # image band granularity (rows)
BAND_W = 256  # image band granularity (lanes)
PAD_Y = 160  # vertical padding of the source image (multiple of BAND_H)
PAD_X = 256  # horizontal padding (multiple of BAND_W)
KY = 8  # row tap window (covers within-block dy spread + band residual... see below)
KX = 120  # max lane taps (dynamic trip count; covers within-block dx spread)

PY_N = 24  # row-permutation output rows (>= KY + ROWS - 1, multiple of 8)

# The aligned slab must cover the worst residual offset plus the tap span.
assert (BAND_H - 1) + KY + ROWS - 1 <= 2 * BAND_H
assert (BAND_W - 1) + KX + COLS - 1 <= 2 * BAND_W
assert PY_N >= KY + ROWS - 1


def _corner_displacement_bounds(m, y0, x0, rows, cols):
    """Displacement extremes of a homography over a sub-block, from its four
    corners (exact for monotonic/rigid-motion homographies; excess shows up
    in the coverage counter). Pure scalar math usable in index maps.

    m: tuple of 8 scalars (m22 == 1). Returns (dy_min, dy_max, dx_min,
    dx_max) as f32 scalars.
    """
    m00, m01, m02, m10, m11, m12, m20, m21 = m

    def disp(x, y):
        x = jnp.float32(1.0) * x
        y = jnp.float32(1.0) * y
        den = m20 * x + m21 * y + 1.0 + 1e-7
        return (m10 * x + m11 * y + m12) / den - y, (
            m00 * x + m01 * y + m02
        ) / den - x

    corners = [
        disp(x0, y0),
        disp(x0 + cols - 1, y0),
        disp(x0, y0 + rows - 1),
        disp(x0 + cols - 1, y0 + rows - 1),
    ]
    dys = [c[0] for c in corners]
    dxs = [c[1] for c in corners]
    dy_min = jnp.minimum(jnp.minimum(dys[0], dys[1]), jnp.minimum(dys[2], dys[3]))
    dy_max = jnp.maximum(jnp.maximum(dys[0], dys[1]), jnp.maximum(dys[2], dys[3]))
    dx_min = jnp.minimum(jnp.minimum(dxs[0], dxs[1]), jnp.minimum(dxs[2], dxs[3]))
    dx_max = jnp.maximum(jnp.maximum(dxs[0], dxs[1]), jnp.maximum(dxs[2], dxs[3]))
    return dy_min, dy_max, dx_min, dx_max


def _read_hom(hom_ref, n, d, n_depths):
    flat = n * n_depths + d
    return tuple(hom_ref[flat, i] for i in range(8))


def _bases(m, y0, x0, height, width):
    """Integer tap bases and band indices for a sub-block (scalar math).

    Must be identical in the index maps and the kernel body so the fetched
    bands and the tap window agree.
    """
    dy_min, dy_max, dx_min, dx_max = _corner_displacement_bounds(
        m, y0, x0, ROWS, COLS
    )
    # Clamp to the padded extent (pixels needing more are out of coverage).
    by = jnp.clip(jnp.floor(dy_min), -PAD_Y + 0.0, PAD_Y + 0.0)
    bx = jnp.clip(jnp.floor(dx_min), -PAD_X + 0.0, PAD_X + 0.0)
    by = by.astype(jnp.int32)
    bx = bx.astype(jnp.int32)
    ry = (y0 + by + PAD_Y) // BAND_H  # top band index (padded-image units)
    lx = (x0 + bx + PAD_X) // BAND_W
    return by, bx, ry, lx, dy_min, dy_max, dx_min, dx_max


def _warp_kernel(
    hom_ref,  # SMEM (N*D, 8) scalar-prefetch: folded homography rows
    *refs,  # 4*DCHUNK image-band refs, 3 outputs, 2 scratch (see wrapper)
    height: int,
    width: int,
    border_radius: int,
    n_depths: int,
    dchunk: int,
):
    band_refs = refs[: 4 * dchunk]
    warped_ref, wmask_ref, cov_ref, acc_ref, macc_ref = refs[4 * dchunk :]

    n = pl.program_id(0)
    dc = pl.program_id(1)
    rb = pl.program_id(2)
    cb = pl.program_id(3)

    for dd in range(dchunk):
        _one_depth(
            hom_ref, band_refs[4 * dd : 4 * dd + 4],
            warped_ref, wmask_ref, cov_ref, acc_ref, macc_ref,
            n, dc * dchunk + dd, dd, rb, cb,
            height, width, border_radius, n_depths,
        )


def _one_depth(
    hom_ref, bands, warped_ref, wmask_ref, cov_ref, acc_ref, macc_ref,
    n, d, dd, rb, cb, height, width, border_radius, n_depths,
):
    band00_ref, band01_ref, band10_ref, band11_ref = bands
    channels = band00_ref.shape[1]
    img_dtype = band00_ref.dtype

    m = _read_hom(hom_ref, n, d, n_depths)
    m00, m01, m02, m10, m11, m12, m20, m21 = m

    @pl.when((rb == 0) & (cb == 0))
    def _():
        cov_ref[n, d] = 0.0

    y0 = rb * ROWS
    x0 = cb * COLS

    by, bx, ry, lx, _, _, _, _ = _bases(m, y0, x0, height, width)
    byf = by.astype(jnp.float32)
    bxf = bx.astype(jnp.float32)

    rows = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 0) + y0).astype(
        jnp.float32
    )
    cols = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1) + x0).astype(
        jnp.float32
    )
    denom = m20 * cols + m21 * rows + 1.0 + 1e-7
    xs = (m00 * cols + m01 * rows + m02) / denom
    ys = (m10 * cols + m11 * rows + m12) / denom
    dx = xs - cols
    dy = ys - rows

    hint = (xs > -1.0) & (xs < width + 0.0) & (ys > -1.0) & (ys < height)
    any_hint = jnp.any(hint)
    uncov = hint & (
        (dx > bxf + (KX - 1)) | (dy > byf + (KY - 1)) | (dx < bxf) | (dy < byf)
    )
    cov_ref[n, d] += jnp.sum(uncov.astype(jnp.float32))

    fy = dy - byf  # in [0, KY) where covered
    fx = dx - bxf

    # Assemble the 32 x 512 slab from the four fetched bands and align its
    # origin to (y0 + by, x0 + bx). The dynamic integer shift is an exact
    # one-hot PERMUTATION MATMUL on the MXU (Mosaic's dynamic rotates and
    # dynamic slices are unreliable on this stack, and bit-decomposed rolls
    # are VPU-bandwidth-bound).
    top = jnp.concatenate([band00_ref[0], band01_ref[0]], axis=2)
    bot = jnp.concatenate([band10_ref[0], band11_ref[0]], axis=2)
    slab = jnp.concatenate([top, bot], axis=1)  # (C, 32, 512)

    off_y = (y0 + by + PAD_Y) - ry * BAND_H  # in [0, BAND_H)
    off_x = (x0 + bx + PAD_X) - lx * BAND_W  # in [0, BAND_W)

    n_rows = KY + ROWS - 1
    row_src = jax.lax.broadcasted_iota(jnp.int32, (2 * BAND_H, PY_N), 0)
    row_dst = jax.lax.broadcasted_iota(jnp.int32, (2 * BAND_H, PY_N), 1)
    py = (row_src == row_dst + off_y).astype(img_dtype)
    lane_src = jax.lax.broadcasted_iota(jnp.int32, (2 * BAND_W, 256), 0)
    lane_dst = jax.lax.broadcasted_iota(jnp.int32, (2 * BAND_W, 256), 1)
    px = (lane_src == lane_dst + off_x).astype(img_dtype)  # (512, 256)

    # One-hot selection of bf16 values with f32 accumulation is EXACT at
    # default matmul precision; f32 images need HIGHEST (operands would
    # otherwise be rounded to bf16 by the MXU).
    mm_precision = (
        jax.lax.Precision.DEFAULT
        if img_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    # py^T selects rows [off_y, off_y+PY_N): (2BH,PY_N) x (C,2BH,512).
    slab = jax.lax.dot_general(
        py, slab,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mm_precision,
    )
    slab = jnp.moveaxis(slab, 0, 1)  # (C, PY_N, 512)
    # px selects lanes [off_x, off_x+256): exact shift, no wrap-around.
    slab = jax.lax.dot_general(
        slab.astype(img_dtype), px,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mm_precision,
    )  # (C, PY_N, 256)
    slab = slab[:, :n_rows, :].astype(img_dtype)

    acc_ref[...] = jnp.zeros((channels, ROWS, COLS), jnp.float32)
    macc_ref[...] = jnp.zeros((2, ROWS, COLS), jnp.float32)

    # Dynamic lane-tap count: taps sx in [0, sx_hi) with sx_hi from the
    # actual spread — skipped taps cost nothing (no per-tap branch).
    fx_max = jnp.max(jnp.where(hint, fx, -jnp.float32(1e9)))
    sx_hi = jnp.clip(jnp.floor(fx_max).astype(jnp.int32) + 2, 0, KX)
    fy_max = jnp.max(jnp.where(hint, fy, -jnp.float32(1e9)))
    sy_hi = jnp.clip(jnp.floor(fy_max).astype(jnp.int32) + 2, 0, KY)

    for sy in range(KY):
        syf = float(sy)

        @pl.when(any_hint & (sy < sy_hi))
        def _(sy=sy, syf=syf):
            wy = jnp.clip(1.0 - jnp.abs(fy - syf), 0.0, 1.0)
            ty = rows + byf + syf
            ind_y = ((ty >= border_radius) & (ty < height - border_radius)).astype(
                jnp.float32
            )
            macc_ref[0] += wy * ind_y
            band = slab[:, sy : sy + ROWS, :]

            def lane_tap(sx, carry):
                band_r, acc = carry
                sxf = sx.astype(jnp.float32)
                wx = jnp.clip(1.0 - jnp.abs(fx - sxf), 0.0, 1.0)
                acc = acc + (wy * wx)[None] * band_r[:, :, :COLS].astype(
                    jnp.float32
                )
                return jnp.roll(band_r, -1, axis=2), acc

            _, acc = jax.lax.fori_loop(
                0, sx_hi, lane_tap, (band, jnp.zeros_like(acc_ref[...]))
            )
            acc_ref[...] += acc

    def mask_tap(sx, carry):
        sxf = sx.astype(jnp.float32)
        wx = jnp.clip(1.0 - jnp.abs(fx - sxf), 0.0, 1.0)
        tx = cols + bxf + sxf
        ind_x = ((tx >= border_radius) & (tx < width - border_radius)).astype(
            jnp.float32
        )
        return carry + wx * ind_x

    @pl.when(any_hint)
    def _():
        macc_ref[1] = jax.lax.fori_loop(
            0, sx_hi, mask_tap, jnp.zeros((ROWS, COLS), jnp.float32)
        )

    warped_ref[0, dd] = acc_ref[...].astype(img_dtype)
    wmask_ref[0, dd] = macc_ref[0] * macc_ref[1]


@functools.partial(jax.jit, static_argnames=("border_radius", "interpret"))
def warp_plane_sweep(
    images: Array,  # (N, C, H, W) float32 or bfloat16
    homographies: Array,  # (N, D, 3, 3), normalized so m22 == 1
    border_radius: int = 2,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Warp every image over D plane-sweep homographies.

    The homography maps an output pixel (x, y, 1) to homogeneous source
    coordinates; rows must be pre-normalized so that entry (2,2) == 1 (the
    wrapper in ``cost_volume.py`` does this and folds in the grid_sample
    align_corners=False rescale).

    Returns:
      warped (N, D, C, H, W), warped border mask (N, D, H, W), and
      uncovered-pixel counts (N, D).
    """
    n, c, h, w = images.shape
    d = homographies.shape[1]
    assert h % ROWS == 0 and w % COLS == 0, (h, w)

    # Several depth hypotheses share one program to amortize per-program
    # overhead (grid sequencing + DMA latency dominate the kernel).
    dchunk = 4 if d % 4 == 0 else (2 if d % 2 == 0 else 1)

    padded = jnp.pad(images, ((0, 0), (0, 0), (PAD_Y, PAD_Y), (PAD_X, PAD_X)))

    hom = jnp.asarray(homographies.reshape(n * d, 9)[:, :8], jnp.float32)

    grid = (n, d // dchunk, h // ROWS, w // COLS)
    n_row_bands = (h + 2 * PAD_Y) // BAND_H
    n_lane_bands = (w + 2 * PAD_X) // BAND_W

    def band_index(ni, dci, rbi, cbi, hom_ref, dd, dr, dl):
        m = _read_hom(hom_ref, ni, dci * dchunk + dd, d)
        _, _, ry, lx, *_ = _bases(m, rbi * ROWS, cbi * COLS, h, w)
        ry = jnp.clip(ry + dr, 0, n_row_bands - 1)
        lx = jnp.clip(lx + dl, 0, n_lane_bands - 1)
        return (ni, 0, ry, lx)

    def band_spec(dd, dr, dl):
        return pl.BlockSpec(
            (1, c, BAND_H, BAND_W),
            functools.partial(band_index, dd=dd, dr=dr, dl=dl),
        )

    kernel = functools.partial(
        _warp_kernel,
        height=h,
        width=w,
        border_radius=border_radius,
        n_depths=d,
        dchunk=dchunk,
    )

    in_specs = [
        band_spec(dd, dr, dl)
        for dd in range(dchunk)
        for (dr, dl) in ((0, 0), (0, 1), (1, 0), (1, 1))
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, dchunk, c, ROWS, COLS),
                lambda ni, dci, rbi, cbi, hom: (ni, dci, 0, rbi, cbi),
            ),
            pl.BlockSpec(
                (1, dchunk, ROWS, COLS),
                lambda ni, dci, rbi, cbi, hom: (ni, dci, rbi, cbi),
            ),
            pl.BlockSpec(
                (n, d), lambda ni, dci, rbi, cbi, hom: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, ROWS, COLS), jnp.float32),
            pltpu.VMEM((2, ROWS, COLS), jnp.float32),
        ],
    )

    warped, wmask, cov = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, d, c, h, w), images.dtype),
            jax.ShapeDtypeStruct((n, d, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(hom, *([padded] * (4 * dchunk)))
    return warped, wmask, cov
