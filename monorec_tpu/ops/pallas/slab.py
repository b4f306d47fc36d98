"""Shared banded-slab machinery for the gather-free warp kernels.

Both the plane-sweep kernel (``cv_kernel.py``) and the general grid-sample
kernel (``grid_warp.py``) read their source pixels through the same
three-step construction, which encodes the hard-won Mosaic constraints in
ONE place:

1. four DMA'd ``BAND_H x BAND_W`` bands concatenate into a 64x512 slab;
2. an exact one-hot PERMUTATION MATMUL aligns slab rows so output row k
   reads absolute source row (base + k) — Mosaic's dynamic rotates/slices
   are unreliable on this stack, and f32 one-hot matmuls need HIGHEST
   precision (6 passes) while bf16 one-hots are exact at DEFAULT;
3. the f32 slab splits into bf16 hi + lo parts: one-hot selection of bf16
   operands is exact, and hi + lo reconstructs the f32 value to ~1e-5
   relative — two single-pass matmuls instead of one 6-pass HIGHEST
   (bf16 source images skip the lo pass entirely).

The XLA:CPU interpreter cannot execute bf16 x bf16 dots, so interpret mode
upcasts the one-hot operands to f32 — bit-identical results (selection is
exact either way).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

BAND_H = 32  # source band granularity (rows)
BAND_W = 256  # source band granularity (lanes)


def build_aligned_slab(
    band00: Array, band01: Array, band10: Array, band11: Array,
    off_y, py_n: int, interpret: bool, c_major: bool = True,
) -> Tuple[Array, Optional[Array], object]:
    """Concatenate the 2x2 band window and row-align it.

    The f32 slab splits into bf16 hi/lo BEFORE the row matmul: one-hot row
    selection commutes with the per-element split, so two DEFAULT-precision
    bf16 passes produce bit-identical values to one 6-pass HIGHEST f32
    matmul followed by the split — at a third of the MXU cost.

    Args:
      band00..band11: (C, band_h, band_w) refs' loaded blocks (leading
        singleton already indexed away by the caller as ``ref[0]``); the
        band geometry is taken from the inputs, so kernels may use
        different band sizes.
      off_y: scalar int32 — slab row holding the window's first tap row.
      py_n: static output row count (>= tap window + block rows - 1).
      c_major: True -> (C, py_n, 2*band_w) parts (static row reads);
        False -> (py_n, C, 2*band_w) (leading-axis dynamic row reads).

    Returns (slab_hi, slab_lo, shear_dtype): bf16 hi/lo parts of the
    row-aligned slab (lo is None for bf16 sources) and the dtype the
    lane-selection one-hots must use.
    """
    band_h = band00.shape[1]
    top = jnp.concatenate([band00, band01], axis=2)
    bot = jnp.concatenate([band10, band11], axis=2)
    slab = jnp.concatenate([top, bot], axis=1)  # (C, 2*band_h, 2*band_w)
    img_dtype = slab.dtype

    # Split first (per-element, so it commutes with the row selection).
    shear_dtype = jnp.float32 if interpret else jnp.bfloat16
    parts = [slab.astype(jnp.bfloat16)]
    if img_dtype != jnp.bfloat16:
        parts.append(
            (slab.astype(jnp.float32) - parts[0].astype(jnp.float32)).astype(
                jnp.bfloat16
            )
        )

    row_src = jax.lax.broadcasted_iota(jnp.int32, (2 * band_h, py_n), 0)
    row_dst = jax.lax.broadcasted_iota(jnp.int32, (2 * band_h, py_n), 1)
    py = (row_src == row_dst + off_y).astype(shear_dtype)

    out = []
    for part in parts:
        part_y = jax.lax.dot_general(
            py, part.astype(shear_dtype),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (py_n, C, 2*band_w) f32, values exactly representable in bf16
        if c_major:
            part_y = jnp.moveaxis(part_y, 0, 1)
        out.append(part_y.astype(shear_dtype))
    slab_hi = out[0]
    slab_lo = out[1] if len(out) > 1 else None
    return slab_hi, slab_lo, shear_dtype


def lane_iotas(out_lanes: int = 256, band_w: int = BAND_W) -> Tuple[Array, Array]:
    """(lane_src, lane_dst) iotas for the (2*band_w, out_lanes) one-hots."""
    lane_src = jax.lax.broadcasted_iota(jnp.int32, (2 * band_w, out_lanes), 0)
    lane_dst = jax.lax.broadcasted_iota(jnp.int32, (2 * band_w, out_lanes), 1)
    return lane_src, lane_dst


def select_lanes(
    slab_hi: Array, slab_lo: Optional[Array], lane_src: Array,
    shear_base: Array, s: int, shear_dtype,
) -> Array:
    """Sheared lane selection: one exact one-hot matmul per hi/lo part.

    ``shear_base`` is (2*BAND_W, out_lanes): destination lane d reads
    source lane ``shear_base[_, d] + s``. Returns (C, py_n, out_lanes) f32.
    """
    pxs = (lane_src == shear_base + s).astype(shear_dtype)
    sl = jax.lax.dot_general(
        slab_hi, pxs,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if slab_lo is not None:
        sl = sl + jax.lax.dot_general(
            slab_lo, pxs,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return sl
