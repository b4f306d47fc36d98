"""Fused Pallas TPU kernel: plane-sweep homography warping.

TPU has no fast vector gather — XLA lowers ``jnp.take`` to serial loops
(~420 ms for one image's 32-hypothesis warp; the whole XLA cost volume ran at
1.5 keyframes/s). This kernel removes every gather:

* the padded source image lives in VMEM for the whole (image, depth) sweep;
* each (8-row x 128-col) output sub-block computes its source coordinates
  from the per-(image, depth) plane-induced homography (VPU, closed form);
* a statically-aligned (48, 384) slab around the sub-block is loaded from
  VMEM and aligned to the local integer displacement base with two dynamic
  ``pltpu.roll``s (sublane + lane rotates — the TPU-native substitute for a
  gather);
* bilinear sampling is banded tap accumulation over the slab: for each
  (sy, sx) window offset the tap is a static row-broadcast + lane slice,
  FMA-weighted by ``max(0, 1-|disp - s|)`` — exact bilinear wherever the
  window covers the true displacement. Taps whose weight is provably zero
  for the whole sub-block are skipped via scalar range tests;
* the warped border-validity mask (what the reference gets by grid-sampling
  a border indicator, ``monorec_model.py:212-219``) is accumulated in the
  same loop from an analytic interior indicator;
* a per-(image, depth) coverage counter reports pixels whose in-image
  source fell outside the window (0 for driving-scale motion; such pixels
  degrade to "invalid reprojection", which the cost volume masks anyway).

Layout: images are (N, C, Hp, Wp) channels-first with W in lanes; outputs
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

ROWS = 8  # output rows per program tile
COLS = 128  # output cols per sub-block
PAD_Y = 16  # vertical displacement coverage (rows)
PAD_X = 128  # horizontal displacement coverage (cols)
SLAB_H = ROWS + 2 * PAD_Y  # 48
SLAB_W = COLS + 2 * PAD_X  # 384


def _warp_kernel(
    hom_ref,  # SMEM (N*D, 8) scalar-prefetch: folded homography rows
    image_ref,  # VMEM (1, C, Hp, Wp) padded source image
    warped_ref,  # VMEM (1, 1, C, ROWS, W)
    wmask_ref,  # VMEM (1, 1, ROWS, W)
    cov_ref,  # SMEM (N, D) uncovered-pixel counts (full array resident)
    acc_ref,  # VMEM scratch (C, ROWS, COLS) tap accumulator
    macc_ref,  # VMEM scratch (ROWS, COLS) mask accumulator
    *,
    height: int,
    width: int,
    ky: int,
    kx: int,
    border_radius: int,
    n_depths: int,
):
    n = pl.program_id(0)
    d = pl.program_id(1)
    rb = pl.program_id(2)
    channels = image_ref.shape[1]

    flat = n * n_depths + d
    m00 = hom_ref[flat, 0]
    m01 = hom_ref[flat, 1]
    m02 = hom_ref[flat, 2]
    m10 = hom_ref[flat, 3]
    m11 = hom_ref[flat, 4]
    m12 = hom_ref[flat, 5]
    m20 = hom_ref[flat, 6]
    m21 = hom_ref[flat, 7]

    @pl.when(rb == 0)
    def _():
        cov_ref[n, d] = 0.0

    y0 = rb * ROWS

    def col_block(cb, _):
        x0 = cb * COLS
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 0) + y0
        ).astype(jnp.float32)
        cols = (
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1) + x0
        ).astype(jnp.float32)

        denom = m20 * cols + m21 * rows + 1.0 + 1e-7
        xs = (m00 * cols + m01 * rows + m02) / denom
        ys = (m10 * cols + m11 * rows + m12) / denom

        dx = xs - cols
        dy = ys - rows

        # Source-in-image hint: only these pixels constrain the window base.
        hint = (xs > -1.0) & (xs < width + 0.0) & (ys > -1.0) & (ys < height)
        big = jnp.float32(1e9)
        dx_min = jnp.min(jnp.where(hint, dx, big))
        dy_min = jnp.min(jnp.where(hint, dy, big))
        dx_max = jnp.max(jnp.where(hint, dx, -big))
        dy_max = jnp.max(jnp.where(hint, dy, -big))

        # Integer window bases. Bounds keep every tap inside the un-wrapped
        # part of the rolled slab: sublane taps use rows [0, ky+ROWS-1) after
        # a roll by (by + PAD_Y); lane taps use lanes [0, kx+COLS-1).
        by = jnp.clip(
            jnp.floor(dy_min), -PAD_Y + 0.0, (SLAB_H - PAD_Y - ROWS - ky) + 0.0
        ).astype(jnp.int32)
        bx = jnp.clip(
            jnp.floor(dx_min), -PAD_X + 0.0, (SLAB_W - PAD_X - COLS - kx) + 0.0
        ).astype(jnp.int32)
        byf = by.astype(jnp.float32)
        bxf = bx.astype(jnp.float32)

        # Coverage diagnostics: in-image pixels needing taps beyond window.
        any_hint = jnp.any(hint)
        uncov = hint & (
            (dx > bxf + (kx - 1)) | (dy > byf + (ky - 1)) | (dx < bxf) | (dy < byf)
        )
        cov_ref[n, d] += jnp.sum(uncov.astype(jnp.float32))

        fy = dy - byf  # in [0, ky) where covered
        fx = dx - bxf

        # Aligned static slab, aligned to (by, bx) so that
        # slab[c, r, l] == padded_source[y0 + by + r, x0 + bx + l].
        # Mosaic's dynamic rotates/slices are unreliable on this stack, so
        # the dynamic shift is decomposed into blended STATIC rolls (one per
        # bit of the shift amount) — every primitive static. Row bits run on
        # the full-height slab; the slab is then trimmed to the tap band so
        # lane bits touch a third of the data.
        slab = image_ref[0, :, pl.ds(y0, SLAB_H), pl.ds(x0, SLAB_W)]

        shift_y = by + PAD_Y  # in [0, 2*PAD_Y]
        shift_x = bx + PAD_X  # in [0, 2*PAD_X]
        # Arithmetic blend (scalar * vector) — Mosaic cannot legalize a
        # scalar-predicated vector select here.
        for bit in range(6):  # covers shifts up to 63 rows
            amt = 1 << bit
            b = ((shift_y >> bit) & 1).astype(jnp.float32)
            slab = b * jnp.roll(slab, -amt, axis=1) + (1.0 - b) * slab
        slab = slab[:, : ky + ROWS - 1, :]
        for bit in range(9):  # covers shifts up to 511 lanes
            amt = 1 << bit
            b = ((shift_x >> bit) & 1).astype(jnp.float32)
            slab = b * jnp.roll(slab, -amt, axis=2) + (1.0 - b) * slab

        acc_ref[...] = jnp.zeros((channels, ROWS, COLS), jnp.float32)
        macc_ref[...] = jnp.zeros((ROWS, COLS), jnp.float32)

        for sy in range(ky):
            syf = float(sy)
            needed_y = (
                any_hint
                & (byf + syf > dy_min - 1.0)
                & (byf + syf < dy_max + 1.0)
            )

            @pl.when(needed_y)
            def _(sy=sy, syf=syf):
                wy = jnp.clip(1.0 - jnp.abs(fy - syf), 0.0, 1.0)
                ty = rows + byf + syf
                row_b = slab[:, sy : sy + ROWS, :]
                for sx in range(kx):
                    sxf = float(sx)
                    needed_x = (bxf + sxf > dx_min - 1.0) & (
                        bxf + sxf < dx_max + 1.0
                    )

                    @pl.when(needed_x)
                    def _(sx=sx, sxf=sxf, row_b=row_b, wy=wy, ty=ty):
                        wx = jnp.clip(1.0 - jnp.abs(fx - sxf), 0.0, 1.0)
                        w = wy * wx
                        tx = cols + bxf + sxf
                        interior = (
                            (ty >= border_radius)
                            & (ty < height - border_radius)
                            & (tx >= border_radius)
                            & (tx < width - border_radius)
                        ).astype(jnp.float32)
                        patch = row_b[:, :, sx : sx + COLS]
                        acc_ref[...] += w[None] * patch
                        macc_ref[...] += w * interior

        warped_ref[0, 0, :, :, pl.ds(x0, COLS)] = acc_ref[...]
        wmask_ref[0, 0, :, pl.ds(x0, COLS)] = macc_ref[...]
        return 0

    jax.lax.fori_loop(0, width // COLS, col_block, 0)


@functools.partial(
    jax.jit,
    static_argnames=("ky", "kx", "border_radius", "interpret"),
)
def warp_plane_sweep(
    images: Array,  # (N, C, H, W) float32
    homographies: Array,  # (N, D, 3, 3), normalized so m22 == 1
    ky: int = 8,
    kx: int = 48,
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
    assert ky + ROWS <= SLAB_H - PAD_Y and kx + COLS <= SLAB_W - PAD_X

    padded = jnp.pad(images, ((0, 0), (0, 0), (PAD_Y, PAD_Y), (PAD_X, PAD_X)))

    hom = homographies.reshape(n * d, 9)[:, :8]
    hom = jnp.asarray(hom, jnp.float32)

    grid = (n, d, h // ROWS)

    kernel = functools.partial(
        _warp_kernel,
        height=h,
        width=w,
        ky=ky,
        kx=kx,
        border_radius=border_radius,
        n_depths=d,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, c, h + 2 * PAD_Y, w + 2 * PAD_X),
                lambda ni, di, rbi, hom: (ni, 0, 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, c, ROWS, w), lambda ni, di, rbi, hom: (ni, di, 0, rbi, 0)
            ),
            pl.BlockSpec(
                (1, 1, ROWS, w), lambda ni, di, rbi, hom: (ni, di, rbi, 0)
            ),
            pl.BlockSpec(
                (n, d), lambda ni, di, rbi, hom: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, ROWS, COLS), jnp.float32),
            pltpu.VMEM((ROWS, COLS), jnp.float32),
        ],
    )

    warped, wmask, cov = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, d, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, d, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(hom, padded)
    return warped, wmask, cov
