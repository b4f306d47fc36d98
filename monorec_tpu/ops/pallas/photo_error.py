"""Pallas TPU kernel: fused photometric error (gaussian SSIM + L1).

``compute_errors`` (reference ``common_losses.py:10-13``) scores a warped
frame against the keyframe with ``0.85 * SSIM(zero-pad, gaussian window,
comp_mode) + 0.15 * L1``, channel-averaged. Expressed in XLA this is five
3x3 window averages plus a long elementwise chain over (B*F*scales, 3,
256, 512) stacks; the window taps are misaligned (+-1 lane/sublane) reads
that XLA materializes around, measured ~23 ms of the stage-1 train step
(forward + backward). This kernel evaluates the whole error map in VMEM:

* per (image, row-block) program the two 16-row blocks covering the
  block's 1-pixel halo are read for both inputs (inputs are pre-padded by
  one zero row on top, matching the reference's zero-pad SSIM);
* the 3x3 window statistics (mu_x, mu_y, E[xx], E[yy], E[xy]) are 9-tap
  stencils evaluated in registers — row taps are static sublane slices,
  lane taps are ``pltpu.roll`` with zero edge fill (zero-pad semantics);
* the SSIM formula, clamp, channel mean and the L1 term produce ONE
  (rows, W) error map per program — no (N, C, H, W) intermediate ever
  touches HBM;
* the backward pass is a second kernel computing the analytic cotangent
  w.r.t. the WARPED input only (the keyframe is data): per channel,
  d err/dx = W*(g_mu) + 2x * W*(g_exx) + y * W*(g_exy) + 0.15/C *
  cot * sign(x-y), where the g-maps are pointwise functions of the window
  stats (recomputed in VMEM) and W* is the same symmetric 3x3 stencil
  (the transpose of a zero-pad window average is the same window average
  of the zero-padded cotangent).

Layout: planar (M, C, H, W), W in lanes. The clamp subgradient uses the
inclusive indicator (0 <= q <= 1), matching ``jax.lax.clamp``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BROWS = 16  # output rows per program

_C1 = 0.01**2
_C2 = 0.03**2

# The reference 3x3 gaussian window (model/layers.py GaussianAverage).
_G = (
    (0.0947, 0.1183, 0.0947),
    (0.1183, 0.1478, 0.1183),
    (0.0947, 0.1183, 0.0947),
)


def _lane_shift(v: Array, b: int, interpret: bool) -> Array:
    """Shift lanes by b in {-1, 0, 1} with zero fill at the image edge."""
    if b == 0:
        return v
    w = v.shape[-1]
    if interpret:
        # interpret mode runs on CPU where pltpu.roll is unavailable.
        rolled = jnp.roll(v, -b, axis=-1)
    else:
        # pltpu.roll rejects negative shifts; -b mod w is the same rotation.
        rolled = pltpu.roll(v, (-b) % w, axis=len(v.shape) - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, len(v.shape) - 1)
    edge = (lane == w - 1) if b == 1 else (lane == 0)
    return jnp.where(edge, 0.0, rolled)


def _stencil(v: Array, rows: int, interpret: bool) -> Array:
    """Weighted 3x3 window sum: v (C, rows+2, W) -> (C, rows, W).

    Row taps are static sublane slices of the halo'd value; lane taps are
    rolls with zero fill. Accumulation order is row-major over the 9 taps
    (pure f32 reordering vs the XLA conv, ~1e-7)."""
    out = None
    for a in range(3):
        va = v[:, a : a + rows, :]
        for b in range(3):
            t = _G[a][b] * _lane_shift(va, b - 1, interpret)
            out = t if out is None else out + t
    return out


def _ssim_terms(mu_x, mu_y, e_xx, e_yy, e_xy):
    a = 2.0 * mu_x * mu_y + _C1
    b = 2.0 * (e_xy - mu_x * mu_y) + _C2
    p = mu_x * mu_x + mu_y * mu_y + _C1
    q = e_xx + e_yy - mu_x * mu_x - mu_y * mu_y + _C2
    return a, b, p, q


def _fwd_kernel(
    x0_ref, x1_ref, y0_ref, y1_ref,  # (1, C, BROWS, W) row blocks
    out_ref,  # (1, BROWS, W)
    *, channels: int, interpret: bool,
):
    c = channels
    xw = jnp.concatenate([x0_ref[0], x1_ref[0]], axis=1)[:, : BROWS + 2, :]
    yw = jnp.concatenate([y0_ref[0], y1_ref[0]], axis=1)[:, : BROWS + 2, :]
    xw = xw.astype(jnp.float32)
    yw = yw.astype(jnp.float32)

    st = functools.partial(_stencil, rows=BROWS, interpret=interpret)
    mu_x = st(xw)
    mu_y = st(yw)
    e_xx = st(xw * xw)
    e_yy = st(yw * yw)
    e_xy = st(xw * yw)
    a, b, p, q = _ssim_terms(mu_x, mu_y, e_xx, e_yy, e_xy)
    s = jnp.clip(1.0 - (a * b) / (p * q), 0.0, 1.0) * 0.5

    xc = xw[:, 1 : 1 + BROWS, :]
    yc = yw[:, 1 : 1 + BROWS, :]
    l1 = jnp.abs(xc - yc)
    out_ref[0] = (0.85 / c) * jnp.sum(s, axis=0) + (0.15 / c) * jnp.sum(
        l1, axis=0
    )


def _bwd_kernel(
    x0_ref, x1_ref, y0_ref, y1_ref,  # (1, C, BROWS, W); padded 2 rows on top
    c0_ref, c1_ref,  # (1, BROWS, W) cotangent blocks; padded 1 row on top
    gx_ref,  # out (1, C, BROWS, W)
    *, channels: int, interpret: bool,
):
    c = channels
    xw = jnp.concatenate([x0_ref[0], x1_ref[0]], axis=1)[:, : BROWS + 4, :]
    yw = jnp.concatenate([y0_ref[0], y1_ref[0]], axis=1)[:, : BROWS + 4, :]
    xw = xw.astype(jnp.float32)
    yw = yw.astype(jnp.float32)
    cot = jnp.concatenate([c0_ref[0], c1_ref[0]], axis=0)[
        : BROWS + 2, :
    ].astype(jnp.float32)

    # Window stats on an 18-row extent (the stencil's transpose spreads the
    # cotangent one row/lane outward, so the g-maps need a 1-pixel halo).
    st_h = functools.partial(_stencil, rows=BROWS + 2, interpret=interpret)
    mu_x = st_h(xw)
    mu_y = st_h(yw)
    e_xx = st_h(xw * xw)
    e_yy = st_h(yw * yw)
    e_xy = st_h(xw * yw)
    a, b, p, q = _ssim_terms(mu_x, mu_y, e_xx, e_yy, e_xy)
    pq = p * q
    val = 1.0 - (a * b) / pq
    # lax.clamp passes gradient on the CLOSED interval.
    ind = ((val >= 0.0) & (val <= 1.0)).astype(jnp.float32)
    g_q = (0.85 / c) * 0.5 * cot[None] * ind  # (C, BROWS+2, W)

    inv_pq = 1.0 / pq
    # d val/d mu_x = -(dA*B + A*dB)/pq + A*B*(dP*q + p*dQ)/pq^2 with
    # dA/dmu_x = 2 mu_y, dB/dmu_x = -2 mu_y, dP/dmu_x = 2 mu_x,
    # dQ/dmu_x = -2 mu_x.
    g_mux = g_q * (
        -2.0 * mu_y * (b - a) * inv_pq
        + 2.0 * mu_x * a * b * (q - p) * inv_pq * inv_pq
    )
    g_muy = g_q * (
        -2.0 * mu_x * (b - a) * inv_pq
        + 2.0 * mu_y * a * b * (q - p) * inv_pq * inv_pq
    )
    g_exx = g_q * (a * b * inv_pq * inv_pq * p)  # via dQ: +A*B*P/pq^2
    g_exy = g_q * (-2.0 * a * inv_pq)

    st = functools.partial(_stencil, rows=BROWS, interpret=interpret)
    xc = xw[:, 2 : 2 + BROWS, :]
    yc = yw[:, 2 : 2 + BROWS, :]
    cot_c = cot[1 : 1 + BROWS, :]
    # mu_y and e_yy gradients vanish (keyframe is data); mu_xy couples to x
    # only through e_xy (W * (x*y)) and mu_x*mu_y (inside g_mux already).
    del g_muy
    gx = (
        st(g_mux)
        + 2.0 * xc * st(g_exx)
        + yc * st(g_exy)
        + (0.15 / c) * cot_c[None] * jnp.sign(xc - yc)
    )
    gx_ref[0] = gx


def _row_specs(dr_list, c, w, grid_rank):
    def spec(dr):
        return pl.BlockSpec(
            (1, c, BROWS, w), lambda m, rb, dr=dr: (m, 0, rb + dr, 0)
        )

    return [spec(dr) for dr in dr_list]


@functools.partial(jax.jit, static_argnames=("interpret",))
def photo_error_fwd(x: Array, y: Array, interpret: bool = False) -> Array:
    """Fused photometric error map: x, y (M, C, H, W) -> (M, H, W)."""
    m, c, h, w = x.shape
    assert y.shape == x.shape, (x.shape, y.shape)
    assert h % BROWS == 0 and w % 128 == 0, (h, w)
    rb_n = h // BROWS
    # One zero row on top (the window's top halo), bottom filled so block
    # rb+1 always exists.
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, BROWS - 1), (0, 0)))
    yp = jnp.pad(y, ((0, 0), (0, 0), (1, BROWS - 1), (0, 0)))

    kernel = functools.partial(_fwd_kernel, channels=c, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(m, rb_n),
        in_specs=_row_specs((0, 1), c, w, 2) + _row_specs((0, 1), c, w, 2),
        out_specs=pl.BlockSpec((1, BROWS, w), lambda mi, rb: (mi, rb, 0)),
        out_shape=jax.ShapeDtypeStruct((m, h, w), jnp.float32),
        interpret=interpret,
    )(xp, xp, yp, yp)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def photo_error_bwd(
    x: Array, y: Array, cot: Array, interpret: bool = False
) -> Array:
    """Analytic cotangent of ``photo_error_fwd`` w.r.t. x: (M, C, H, W)."""
    m, c, h, w = x.shape
    rb_n = h // BROWS
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, BROWS - 2), (0, 0)))
    yp = jnp.pad(y, ((0, 0), (0, 0), (2, BROWS - 2), (0, 0)))
    cp = jnp.pad(cot, ((0, 0), (1, BROWS - 1), (0, 0)))

    def cot_spec(dr):
        return pl.BlockSpec(
            (1, BROWS, w), lambda mi, rb, dr=dr: (mi, rb + dr, 0)
        )

    kernel = functools.partial(_bwd_kernel, channels=c, interpret=interpret)
    gx = pl.pallas_call(
        kernel,
        grid=(m, rb_n),
        in_specs=_row_specs((0, 1), c, w, 2)
        + _row_specs((0, 1), c, w, 2)
        + [cot_spec(0), cot_spec(1)],
        out_specs=pl.BlockSpec(
            (1, c, BROWS, w), lambda mi, rb: (mi, 0, rb, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((m, c, h, w), jnp.float32),
        interpret=interpret,
    )(xp, xp, yp, yp, cp, cp)
    return gx


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def photo_error(x: Array, y: Array, interpret: bool = False) -> Array:
    """compute_errors in one fused pass (planar): 0.85*SSIM(zero-pad,
    gaussian, comp_mode) + 0.15*L1, channel-averaged. Differentiable w.r.t.
    x (the warped frames); y (the keyframe) is treated as data."""
    return photo_error_fwd(x, y, interpret=interpret)


def _photo_error_vjp_fwd(x, y, interpret):
    return photo_error_fwd(x, y, interpret=interpret), (x, y)


def _photo_error_vjp_bwd(interpret, res, cot):
    x, y = res
    gx = photo_error_bwd(x, y, cot, interpret=interpret)
    return gx, jnp.zeros_like(y)


photo_error.defvjp(_photo_error_vjp_fwd, _photo_error_vjp_bwd)
