"""Parity of predictor building blocks vs torch (CPU) oracles — these are
the pieces whose exact semantics (align_corners, adaptive pooling windows,
frozen BN) make or break predictor weight-conversion parity."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gan_control_tpu.losses.predictors.common import (
    FrozenBatchNorm,
    PReLU,
    adaptive_avg_pool,
    avg_pool,
    max_pool,
    resize_bicubic,
    resize_bilinear,
)


def nhwc(t):  # torch NCHW -> numpy NHWC
    return t.detach().numpy().transpose(0, 2, 3, 1)


def to_torch(x):  # numpy NHWC -> torch NCHW
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, 17, 17, 3)).astype(np.float32)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("out", [8, 23])
def test_resize_bilinear_matches_torch(img, align, out):
    want = nhwc(
        F.interpolate(to_torch(img), size=(out, out), mode="bilinear", align_corners=align)
    )
    got = np.asarray(resize_bilinear(jnp.asarray(img), (out, out), align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
def test_resize_bicubic_matches_torch(img, align):
    want = nhwc(
        F.interpolate(to_torch(img), size=(11, 11), mode="bicubic", align_corners=align)
    )
    got = np.asarray(resize_bicubic(jnp.asarray(img), (11, 11), align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("size", [1, 2, 3, 6])
def test_adaptive_avg_pool_matches_torch(img, size):
    want = nhwc(F.adaptive_avg_pool2d(to_torch(img), size))
    got = np.asarray(adaptive_avg_pool(jnp.asarray(img), size))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_max_pool_matches_torch(img):
    want = nhwc(F.max_pool2d(to_torch(img), 3, stride=2, padding=1))
    got = np.asarray(max_pool(jnp.asarray(img), 3, 2, padding=1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_frozen_batchnorm_matches_torch_eval(img):
    c = img.shape[-1]
    rng = np.random.default_rng(1)
    scale = rng.standard_normal(c).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = rng.random(c).astype(np.float32) + 0.5

    bn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    want = nhwc(bn(to_torch(img)))

    mod = FrozenBatchNorm(c)
    params = {"params": {"scale": scale, "bias": bias, "mean": mean, "var": var}}
    got = np.asarray(mod.apply(params, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_prelu_matches_torch(img):
    c = img.shape[-1]
    alpha = np.array([0.1, 0.3, -0.2], np.float32)
    pr = torch.nn.PReLU(c)
    with torch.no_grad():
        pr.weight.copy_(torch.from_numpy(alpha))
    want = nhwc(pr(to_torch(img)))
    got = np.asarray(PReLU(c).apply({"params": {"alpha": alpha}}, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
