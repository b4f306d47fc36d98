"""Layer geometry + numerical parity vs torch oracles (weights copied over)."""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from monorec_tpu.models import layers as L
from monorec_tpu.utils.torch_compat import (
    conv_kernel_from_torch,
    conv_transpose_kernel_from_torch,
)


def _torch_same_pad(x, kernel, stride):
    """Oracle for TF-"same" padding (reference PadSameConv2d formula)."""
    import math

    _, _, h, w = x.shape
    ky, kx = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    sy, sx = stride if isinstance(stride, tuple) else (stride, stride)
    py = (sy * (math.ceil(h / sy) - 1) + ky - h) / 2
    px = (sx * (math.ceil(w / sx) - 1) + kx - w) / 2
    return torch.nn.functional.pad(
        x, [math.floor(px), math.ceil(px), math.floor(py), math.ceil(py)]
    )


@pytest.mark.parametrize("kernel,stride,h,w", [(7, 2, 33, 47), (5, 2, 32, 48), (3, 1, 10, 10), (2, 1, 8, 8)])
def test_pad_same_matches_torch_formula(kernel, stride, h, w):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, h, w, 2)).astype(np.float32)
    ours = np.asarray(L.pad_same(jnp.asarray(x), kernel, stride))
    ref = (
        _torch_same_pad(torch.from_numpy(x).permute(0, 3, 1, 2), kernel, stride)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_array_equal(ours, ref)


def test_conv_lrelu_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 16, 3)).astype(np.float32)

    tconv = torch.nn.Conv2d(3, 5, 3, stride=2)
    with torch.no_grad():
        ref = torch.nn.functional.leaky_relu(
            tconv(_torch_same_pad(torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2)), 0.1
        ).permute(0, 2, 3, 1).numpy()

    m = L.ConvLReLU(5, 3, 2)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(lambda p: p, params)
    flat = params["params"]["SamePadConv_0"]["Conv_0"]
    flat["kernel"] = jnp.asarray(conv_kernel_from_torch(tconv.weight.detach().numpy()))
    flat["bias"] = jnp.asarray(tconv.bias.detach().numpy())

    out = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_refine_matches_torch_transposed_conv():
    """Refine = ConvTranspose(k4, s2) + LeakyReLU + center crop to 2x."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 6, 9, 3)).astype(np.float32)

    tconv = torch.nn.ConvTranspose2d(3, 4, 4, 2)
    with torch.no_grad():
        y = torch.nn.functional.leaky_relu(
            tconv(torch.from_numpy(x).permute(0, 3, 1, 2)), 0.1
        )
        ref = y[:, :, 1:-1, 1:-1].permute(0, 2, 3, 1).numpy()

    m = L.Refine(4)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ct = params["params"]["ConvTranspose_0"]
    ct["kernel"] = jnp.asarray(
        conv_transpose_kernel_from_torch(tconv.weight.detach().numpy())
    )
    ct["bias"] = jnp.asarray(tconv.bias.detach().numpy())

    out = np.asarray(m.apply(params, jnp.asarray(x)))
    assert out.shape == (1, 12, 18, 4)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_upconv_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)

    tconv = torch.nn.Conv2d(3, 4, 2, 1)
    with torch.no_grad():
        up = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2
        )
        ref = tconv(_torch_same_pad(up, 2, 1)).permute(0, 2, 3, 1).numpy()

    m = L.Upconv(4)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    flat = params["params"]["SamePadConv_0"]["Conv_0"]
    flat["kernel"] = jnp.asarray(conv_kernel_from_torch(tconv.weight.detach().numpy()))
    flat["bias"] = jnp.asarray(tconv.bias.detach().numpy())

    out = np.asarray(m.apply(params, jnp.asarray(x)))
    assert out.shape == (1, 10, 14, 4)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_separable_conv_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 9, 13, 3)).astype(np.float32)
    k, s = 5, 2

    ty = torch.nn.Conv2d(3, 4, (k, 1), stride=(s, 1))
    tx = torch.nn.Conv2d(4, 4, (1, k), stride=(1, s))
    with torch.no_grad():
        t = _torch_same_pad(torch.from_numpy(x).permute(0, 3, 1, 2), (k, 1), (s, 1))
        t = torch.nn.functional.leaky_relu(ty(t), 0.1)
        t = _torch_same_pad(t, (1, k), (1, s))
        ref = torch.nn.functional.leaky_relu(tx(t), 0.1).permute(0, 2, 3, 1).numpy()

    m = L.SeparableConvLReLU(4, k, s)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p0 = params["params"]["SamePadConv_0"]["Conv_0"]
    p1 = params["params"]["SamePadConv_1"]["Conv_0"]
    p0["kernel"] = jnp.asarray(conv_kernel_from_torch(ty.weight.detach().numpy()))
    p0["bias"] = jnp.asarray(ty.bias.detach().numpy())
    p1["kernel"] = jnp.asarray(conv_kernel_from_torch(tx.weight.detach().numpy()))
    p1["bias"] = jnp.asarray(tx.bias.detach().numpy())

    out = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_max_pool_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 8, 12, 3)).astype(np.float32)
    ref = (
        torch.nn.functional.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    out = np.asarray(L.max_pool_2x2(jnp.asarray(x)))
    np.testing.assert_array_equal(out, ref)
