"""Shared banded-slab machinery for the gather-free warp kernels.

Both the plane-sweep kernel (``cv_kernel.py``) and the general grid-sample
kernel (``grid_warp.py``) read their source pixels through the same
construction, which encodes the hard-won Mosaic constraints in ONE place:

1. four DMA'd ``BAND_H x BAND_W`` bands are row-aligned by exact one-hot
   PERMUTATION MATMULS so output row k reads absolute source row
   (base + k) — Mosaic's dynamic rotates/slices are unreliable on this
   stack, and f32 one-hot matmuls need HIGHEST precision (6 passes) while
   bf16 one-hots are exact at DEFAULT;
2. each f32 band splits into bf16 hi + lo parts BEFORE the row matmul:
   one-hot selection of bf16 operands is exact, and hi + lo reconstructs
   the f32 value to ~1e-5 relative — two single-pass matmuls instead of
   one 6-pass HIGHEST (bf16 source images skip the lo pass entirely);
3. the aligned slab stays in TWO 256-lane halves (left = the 00/10 bands,
   right = 01/11): the per-band-pair matmuls write (C, py_n, BAND_W)
   C-major results DIRECTLY, with no row/lane concatenation and no
   relayout of the matmul output — measured ~6x cheaper than the round-2
   single-slab build (concat to 64x512, one (py_n, C*2W) dot, moveaxis),
   which cost ~21 ms/step of pure data movement in the stage-1 step;
4. lane selection contracts each half with its own 256-wide one-hot
   (source lane = dst + base + s, minus BAND_W for the right half) and
   sums — same MXU FLOPs as the round-2 single 512-wide contraction.

The XLA:CPU interpreter cannot execute bf16 x bf16 dots, so interpret mode
upcasts the one-hot operands to f32 — bit-identical results (selection is
exact either way).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

BAND_H = 32  # source band granularity (rows)
BAND_W = 256  # source band granularity (lanes)

# halves: [(left_hi, right_hi)] for bf16 sources,
# [(left_hi, right_hi), (left_lo, right_lo)] for f32 sources;
# every part is (C, py_n, BAND_W).
Halves = List[Tuple[Array, Array]]


def _split_parts(x: Array, img_dtype) -> List[Array]:
    """bf16 hi/lo split (exact one-hot operands; hi+lo ~ f32 to 1e-5)."""
    hi = x.astype(jnp.bfloat16)
    if img_dtype == jnp.bfloat16:
        return [hi]
    lo = (x.astype(jnp.float32) - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return [hi, lo]


def build_aligned_slab(
    band00: Array, band01: Array, band10: Array, band11: Array,
    off_y, py_n: int, interpret: bool,
) -> Tuple[Halves, object]:
    """Row-align the 2x2 band window into two C-major 256-lane halves.

    Output row k of each half reads absolute band-window row (k + off_y):
    rows < BAND_H come from the top band's permutation matmul, rows >=
    BAND_H from the bottom band's (rows past the window match neither
    one-hot and read zero). The per-band-pair dots write (C, py_n, BAND_W)
    directly — no concatenation, no output relayout.

    Args:
      band00..band11: (C, band_h, band_w) refs' loaded blocks (leading
        singleton already indexed away by the caller as ``ref[0]``).
      off_y: scalar int32 — band-window row holding the first tap row.
      py_n: static output row count (>= tap window + block rows - 1).

    Returns (halves, shear_dtype): the hi/lo half pairs and the dtype the
    lane-selection one-hots must use.
    """
    band_h = band00.shape[1]
    c = band00.shape[0]
    img_dtype = band00.dtype
    shear_dtype = jnp.float32 if interpret else jnp.bfloat16

    row_dst = jax.lax.broadcasted_iota(jnp.int32, (py_n, band_h), 0)
    row_src = jax.lax.broadcasted_iota(jnp.int32, (py_n, band_h), 1)
    py_top = (row_src == row_dst + off_y).astype(shear_dtype)
    py_bot = (row_src == row_dst + (off_y - band_h)).astype(shear_dtype)

    def align(top_band: Array, bot_band: Array) -> List[Array]:
        tops = _split_parts(top_band, img_dtype)
        bots = _split_parts(bot_band, img_dtype)
        outs = []
        for tp, bt in zip(tops, bots):
            chans = []
            for cc in range(c):
                a = jax.lax.dot_general(
                    py_top, tp[cc].astype(shear_dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                b = jax.lax.dot_general(
                    py_bot, bt[cc].astype(shear_dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                chans.append((a + b)[None])
            # Values are exactly representable in bf16 (selection of bf16
            # operands), so the cast back is lossless.
            outs.append(jnp.concatenate(chans, axis=0).astype(shear_dtype))
        return outs

    lefts = align(band00, band10)
    rights = align(band01, band11)
    return list(zip(lefts, rights)), shear_dtype


def lane_iotas(out_lanes: int = 256) -> Tuple[Array, Array]:
    """(lane_src, lane_dst) iotas for the (BAND_W, out_lanes) one-hots."""
    lane_src = jax.lax.broadcasted_iota(jnp.int32, (BAND_W, out_lanes), 0)
    lane_dst = jax.lax.broadcasted_iota(jnp.int32, (BAND_W, out_lanes), 1)
    return lane_src, lane_dst


def select_lanes_weighted(
    halves: Halves, lane_src: Array, shear_base: Array, frac: Array,
    shear_dtype,
) -> Array:
    """Bilinear-WEIGHTED lane selection: dst lane d reads
    ``(1-frac[d]) * src(base[d]) + frac[d] * src(base[d]+1)`` in ONE
    matmul per half per hi/lo part — the two hat taps folded into the
    selection matrix. Usable only when the x residual is row-uniform
    (``frac`` is per-lane): exact with f32 weights (interpret); with bf16
    weights the fold quantizes the weights to ~2^-9 relative (bf16 x bf16
    products are exact in the f32 accumulator, so that rounding is the
    only error) — reserved for bf16-source (serving) sweeps whose budget
    already absorbs source quantization of the same magnitude.
    ``frac`` is (1, out_lanes), clipped to [0, 1] by the caller."""
    sel_left = (lane_src == shear_base).astype(jnp.float32)
    sel_left1 = (lane_src == shear_base + 1).astype(jnp.float32)
    w_left = (sel_left * (1.0 - frac) + sel_left1 * frac).astype(shear_dtype)
    sel_right = (lane_src == shear_base - BAND_W).astype(jnp.float32)
    sel_right1 = (lane_src == shear_base + 1 - BAND_W).astype(jnp.float32)
    w_right = (sel_right * (1.0 - frac) + sel_right1 * frac).astype(shear_dtype)
    sl = None
    for left, right in halves:
        part = jax.lax.dot_general(
            left, w_left,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            right, w_right,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = part if sl is None else sl + part
    return sl


def select_lanes(
    halves: Halves, lane_src: Array, shear_base: Array, s: int, shear_dtype,
) -> Array:
    """Sheared lane selection over the two slab halves.

    ``shear_base`` is (BAND_W, out_lanes) with identical rows: destination
    lane d reads band-window source lane ``shear_base[_, d] + s`` (left
    half for values < BAND_W, right half for the rest — the right one-hot
    is the same predicate shifted by BAND_W). One exact one-hot matmul per
    half per hi/lo part; returns (C, py_n, out_lanes) f32.
    """
    pxs_left = (lane_src == shear_base + s).astype(shear_dtype)
    pxs_right = (lane_src == shear_base + (s - BAND_W)).astype(shear_dtype)
    sl = None
    for left, right in halves:
        part = jax.lax.dot_general(
            left, pxs_left,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            right, pxs_right,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = part if sl is None else sl + part
    return sl
