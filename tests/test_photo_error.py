"""Fused photometric-error Pallas kernel (interpret mode): forward and
analytic-backward parity vs the pure-jnp planar formulation
(``losses/common.py::compute_errors_planar`` jnp path), which itself is
parity-tested against the torch oracle in ``test_reprojection_parity.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monorec_tpu.losses.common import compute_errors_planar
from monorec_tpu.ops.pallas.photo_error import photo_error
from monorec_tpu.ops.ssim import ssim_planar

M, C, H, W = 2, 3, 32, 128


def _jnp_errors(x, y):
    s = ssim_planar(
        x, y, pad_reflection=False, gaussian_average=True, comp_mode=True
    )
    return 0.85 * jnp.mean(s, axis=-3) + 0.15 * jnp.mean(
        jnp.abs(x - y), axis=-3
    )


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    # Keyframe-space values in [1, 2] (the losses add 1.5 to [-0.5, 0.5]
    # images before warping); a few exact zeros exercise the L1 sign
    # subgradient and the invalid-pixel value range.
    x = rng.uniform(1.0, 2.0, (M, C, H, W)).astype(np.float32)
    y = rng.uniform(1.0, 2.0, (M, C, H, W)).astype(np.float32)
    x[0, :, :3, :5] = 0.0
    return jnp.asarray(x), jnp.asarray(y)


def test_photo_error_forward_matches_jnp():
    x, y = _inputs()
    ref = np.asarray(_jnp_errors(x, y))
    got = np.asarray(photo_error(x, y, True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_photo_error_gradient_matches_jnp():
    x, y = _inputs(seed=1)
    cot = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (M, H, W)).astype(np.float32)
    )

    def loss_k(x):
        return jnp.sum(photo_error(x, y, True) * cot)

    def loss_j(x):
        return jnp.sum(_jnp_errors(x, y) * cot)

    g_ref = np.asarray(jax.grad(loss_j)(x))
    g_got = np.asarray(jax.grad(loss_k)(x))
    # The analytic backward regroups the quotient-rule terms, so f32
    # cancellation noise reaches ~1e-5 on gradient values of ~0.1.
    np.testing.assert_allclose(g_got, g_ref, rtol=1e-3, atol=2e-5)


def test_photo_error_keyframe_gets_no_gradient():
    x, y = _inputs(seed=3)
    g = jax.grad(lambda y: jnp.sum(photo_error(x, y, True)))(y)
    assert float(jnp.abs(g).max()) == 0.0


def test_compute_errors_planar_dtype_and_symmetry_contract():
    """compute_errors_planar returns f32 on every backend/input dtype, and
    img1_is_data=False forces the symmetric-gradient jnp path (the kernel's
    custom VJP hard-zeros d/d(img1))."""
    from monorec_tpu.losses.common import compute_errors_planar

    x, y = _inputs(seed=4)
    out_f32 = compute_errors_planar(x, y)
    out_bf16 = compute_errors_planar(
        x.astype(jnp.bfloat16), y.astype(jnp.bfloat16)
    )
    assert out_f32.dtype == jnp.float32
    assert out_bf16.dtype == jnp.float32

    # Symmetric path: img1 receives a nonzero gradient.
    g = jax.grad(
        lambda y: jnp.sum(compute_errors_planar(x, y, img1_is_data=False))
    )(y)
    assert float(jnp.abs(g).max()) > 0.0
