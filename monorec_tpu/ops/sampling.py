"""Bilinear image sampling with torch ``grid_sample`` semantics.

Replicates ``F.grid_sample(..., mode='bilinear', padding_mode='zeros',
align_corners=False)`` — the exact flavor used throughout the reference
(``monorec_model.py:215-218``, ``common_losses.py:52-54``) — as a pure-JAX
gather so the plane-sweep warp can be jitted/vmapped and later swapped for a
fused Pallas kernel.

Coordinate convention (align_corners=False): a normalized coordinate g in
[-1, 1] maps to the continuous pixel coordinate ``((g + 1) * S - 1) / 2``
where S is the extent along that axis. Out-of-bounds taps contribute zero.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp

Array = jax.Array

logger = logging.getLogger(__name__)
_warned_rows_gate = False


def _warn_rows_gate(h: int, rows: int) -> None:
    """The Pallas kernel's true row minimum is 16; the default block height
    is ROWS=32 (~4% faster at 256x512). A height that is a multiple of 16
    but not of ROWS falls back to the ~10x slower serial-gather XLA path —
    that quiet perf cliff must be loud (once per process)."""
    global _warned_rows_gate
    if _warned_rows_gate:
        return
    _warned_rows_gate = True
    logger.warning(
        "grid_sample: height %d is not divisible by the kernel block height "
        "ROWS=%d, so the warp falls back to the serial XLA gather path "
        "(~10x slower). Set MONOREC_GW_ROWS=16 (env, read at import) to "
        "restore kernel eligibility for 16-divisible heights.",
        h, rows,
    )


def _unnormalize(coord: Array, size: int) -> Array:
    return ((coord + 1.0) * size - 1.0) / 2.0


def bilinear_sample(image: Array, grid: Array) -> Array:
    """Sample a single image at normalized grid locations.

    Args:
      image: (H, W, C) source image.
      grid: (..., 2) normalized coordinates, last axis = (x, y) in [-1, 1].

    Returns:
      (..., C) bilinearly interpolated samples; zero for out-of-bounds taps.
    """
    h, w, c = image.shape
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = image.reshape(h * w, c)

    def tap(xi: Array, yi: Array, wgt: Array) -> Array:
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jnp.take(flat, yi_c * w + xi_c, axis=0)
        return vals * (wgt * inside.astype(image.dtype))[..., None]

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _grid_sample_tpu(interpret: bool, images: Array, xs: Array, ys: Array):
    """Pallas grid sampler with an analytic coordinate VJP.

    Returns (warped, per-image uncovered-pixel counts). The warped values'
    gradient w.r.t. the source images is never needed (the losses warp
    *data* frames), so no scatter exists anywhere. Under differentiation
    the forward kernel emits the per-pixel coordinate Jacobian alongside
    the values (two extra FMAs per tap) and the backward pass is a pure
    elementwise cotangent contraction — the banded gather machinery runs
    ONCE per warp instead of twice. The coverage count is a diagnostic
    with zero gradient.
    """
    from monorec_tpu.ops.pallas.grid_warp import grid_warp

    return grid_warp(images, xs, ys, interpret=interpret)


def _grid_sample_tpu_fwd(interpret, images, xs, ys):
    from monorec_tpu.ops.pallas.grid_warp import grid_warp_jac

    (out, jx, jy), cov = grid_warp_jac(images, xs, ys, interpret=interpret)
    return (out, cov), (images, jx, jy)


def _grid_sample_tpu_bwd(interpret, res, cots):
    images, jx, jy = res
    cot, _cov_cot = cots  # the coverage diagnostic carries no gradient
    gx = jnp.sum(cot * jx, axis=1)
    gy = jnp.sum(cot * jy, axis=1)
    return jnp.zeros_like(images), gx, gy


_grid_sample_tpu.defvjp(_grid_sample_tpu_fwd, _grid_sample_tpu_bwd)


def grid_sample_planar(
    images: Array,
    grids: Array,
    backend: str = "xla",
    interpret: bool = False,
    return_coverage: bool = False,
    kernel_dtype=None,
):
    """Batched sampler in the kernel's native planar layout:
    images (N, C, H, W), grids (N, Ho, Wo, 2) -> (N, C, Ho, Wo).

    backend="auto" picks the Pallas banded-warp kernel on TPU when shapes
    allow (same-size sampling, H % ROWS == 0, W % COLS == 0) — XLA lowers
    the gather formulation to serial loops (~4.3 ms per 256x512x3 warp),
    the kernel to permutation matmuls (~0.4 ms). "xla" keeps the exact
    gather path (required for per-pixel-depth cost volumes and tiny test
    shapes). Planar callers pay NO layout copies on the kernel path: the
    kernel reads and writes (N, C, H, W) directly, and channel counts above
    the kernel's scratch budget fold into the batch dim by a pure reshape
    (the NHWC wrapper needs two full-stack transposes per call instead).

    ``kernel_dtype`` (None | jnp.float32 | jnp.bfloat16) quantizes the
    source values on the KERNEL path only (the XLA path is unaffected, so
    CPU parity tests keep exact semantics). bf16 sources skip the slab's
    lo-part pass entirely — one permutation matmul per tap instead of two,
    and half the band DMA — at a ~2^-8 relative source quantization (the
    recommended TPU loss-warp configuration; images are uint8-derived so
    the quantization is below sensor noise). The output is always f32
    accumulated and returned in the input dtype.

    ``return_coverage`` also returns per-image uncovered-pixel counts (N,):
    in-image samples the kernel's tap window could not reach (zeroed in the
    output; possible at extreme depth discontinuities). Always 0 on the
    XLA path.
    """
    n, c, h, w = images.shape
    if backend == "auto":
        from monorec_tpu.ops.pallas.grid_warp import COLS, ROWS

        on_tpu = jax.default_backend() not in ("cpu", "gpu") or interpret
        ok = (
            grids.shape == (n, h, w, 2)
            and h % ROWS == 0
            and w % COLS == 0
        )
        if (
            on_tpu and not ok and grids.shape == (n, h, w, 2)
            and h % 16 == 0 and h % ROWS != 0 and w % COLS == 0
        ):
            _warn_rows_gate(h, ROWS)
        backend = "tpu" if (on_tpu and ok) else "xla"
    if backend == "tpu":
        kdtype = jnp.float32 if kernel_dtype is None else kernel_dtype
        x = jnp.clip(_unnormalize(grids[..., 0], w), -3.0, w + 2.0)
        y = jnp.clip(_unnormalize(grids[..., 1], h), -3.0, h + 2.0)
        x = x.astype(jnp.float32)
        y = y.astype(jnp.float32)
        # The kernel's sheared-slab scratch scales with the channel count;
        # wide tensors (e.g. D=32 cost volumes under augmentation) fold
        # channel groups into the batch dimension (a reshape, no copy).
        cg = 4
        if c > cg:
            g = -(-c // cg)
            imgs = jnp.pad(images, ((0, 0), (0, g * cg - c), (0, 0), (0, 0)))
            imgs = imgs.reshape(n * g, cg, h, w).astype(kdtype)
            out, cov = _grid_sample_tpu(
                interpret, imgs, jnp.repeat(x, g, axis=0), jnp.repeat(y, g, axis=0)
            )
            out = out.reshape(n, g * cg, h, w)[:, :c].astype(images.dtype)
            cov = jnp.sum(cov.reshape(n, g), axis=1)
        else:
            out, cov = _grid_sample_tpu(interpret, images.astype(kdtype), x, y)
            out = out.astype(images.dtype)
        if return_coverage:
            return out, cov
        return out
    out = jax.vmap(bilinear_sample)(jnp.moveaxis(images, 1, -1), grids)
    out = jnp.moveaxis(out, -1, 1)
    if return_coverage:
        return out, jnp.zeros((n,), jnp.float32)
    return out


def grid_sample_nhwc(
    images: Array,
    grids: Array,
    backend: str = "xla",
    interpret: bool = False,
    return_coverage: bool = False,
    kernel_dtype=None,
):
    """Batched sampler: images (N, H, W, C), grids (N, Ho, Wo, 2) ->
    (N, Ho, Wo, C). NHWC convenience wrapper over ``grid_sample_planar``
    (see there for backend/kernel_dtype/coverage semantics); the kernel
    path pays an NHWC->NCHW transpose of the sources and one back on the
    warped output — hot planar callers (the reprojection losses) use
    ``grid_sample_planar`` directly."""
    n, h, w, c = images.shape
    if backend == "auto":
        from monorec_tpu.ops.pallas.grid_warp import COLS, ROWS

        on_tpu = jax.default_backend() not in ("cpu", "gpu") or interpret
        ok = (
            grids.shape == (n, h, w, 2)
            and h % ROWS == 0
            and w % COLS == 0
        )
        if (
            on_tpu and not ok and grids.shape == (n, h, w, 2)
            and h % 16 == 0 and h % ROWS != 0 and w % COLS == 0
        ):
            _warn_rows_gate(h, ROWS)
        backend = "tpu" if (on_tpu and ok) else "xla"
    if backend == "tpu":
        out = grid_sample_planar(
            jnp.moveaxis(images, -1, 1), grids, backend="tpu",
            interpret=interpret, return_coverage=return_coverage,
            kernel_dtype=kernel_dtype,
        )
        if return_coverage:
            return jnp.moveaxis(out[0], 1, -1), out[1]
        return jnp.moveaxis(out, 1, -1)
    out = jax.vmap(bilinear_sample)(images, grids)
    if return_coverage:
        return out, jnp.zeros((n,), jnp.float32)
    return out
