"""ADA augmentation tests: identity at p=0, shape preservation, and
transform-matrix correctness vs a numpy oracle of the reference math."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from gan_control_tpu.training.ada import (
    ada_p_update,
    apply_affine,
    apply_color,
    augment,
    sample_affine,
    sample_color,
)


def test_augment_p0_is_near_identity_on_smooth_image():
    """With p=0 every transform is the identity; the SYM6 up/grid/down round
    trip reconstructs band-limited content closely (high-frequency noise is
    attenuated by the antialiasing filter — in the reference as well)."""
    y, x = np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 32), indexing="ij")
    smooth = np.exp(-(x**2 + y**2) * 3).astype(np.float32)
    img = jnp.asarray(np.tile(smooth[None, :, :, None], (2, 1, 1, 3)))
    out = jax.jit(augment)(img, jnp.asarray(0.0), jax.random.PRNGKey(0))
    assert out.shape == img.shape
    diff = np.abs(np.asarray(out) - np.asarray(img))
    assert diff.mean() < 0.05, diff.mean()  # SYM6 round trip is approximate (same in reference)


def test_apply_affine_matches_torch_oracle():
    """Parity of the warp path vs a torch composition of the same pipeline:
    reflect-pad + FIR-2x-up (correlation), grid-sample (align_corners=False,
    zeros), FIR-2x-down (convolution), crop — the reference's
    random_apply_affine (non_leaking.py:316-371) at fixed pad."""
    import torch
    import torch.nn.functional as F

    from gan_control_tpu.training.ada import SYM6, apply_affine

    rng = np.random.default_rng(0)
    img_np = rng.standard_normal((1, 3, 32, 32)).astype(np.float32) * 0.3
    h = w = 32
    pad, len_k = 8, len(SYM6)
    pad_k = (len_k + 1) // 2

    g_np = np.eye(3, dtype=np.float32)[None].copy()
    g_np[0, 0, 0], g_np[0, 0, 2], g_np[0, 1, 1], g_np[0, 1, 0] = 1.1, 0.05, 0.9, 0.1

    k2 = torch.from_numpy(np.outer(SYM6, SYM6))

    def fir(x, kernel, up=1, down=1):
        # true convolution with zero-stuffing (upfirdn semantics)
        c = x.shape[1]
        kk = torch.flip(kernel, (0, 1))[None, None].repeat(c, 1, 1, 1)
        if up > 1:
            z = torch.zeros(x.shape[0], c, x.shape[2] * up, x.shape[3] * up)
            z[:, :, ::up, ::up] = x
            x = z
        return F.conv2d(x, kk, stride=down, groups=c)

    timg = torch.from_numpy(img_np)
    img_pad = F.pad(timg, (pad + pad_k,) * 4, mode="reflect")
    w_p = img_pad.shape[3] - len_k + 1
    h_p = img_pad.shape[2] - len_k + 1
    img_2x = fir(img_pad, torch.flip(k2, (0, 1)), up=2)

    n, _, h2, w2 = img_2x.shape
    gx = torch.linspace(-2 * pad / w - 1, 2 * (w_p - pad) / w - 1, w2)
    gy = torch.linspace(-2 * pad / h - 1, 2 * (h_p - pad) / h - 1, h2)
    grid = torch.stack(
        [gx[None, :].expand(h2, w2), gy[:, None].expand(h2, w2), torch.ones(h2, w2)],
        dim=-1,
    )[None]
    ginv = torch.inverse(torch.from_numpy(g_np))[:, :2, :]
    warped = grid.reshape(1, -1, 3) @ ginv.transpose(1, 2)
    warped = warped.reshape(1, h2, w2, 2)
    warped = warped * torch.tensor([w / w_p, h / h_p]) + torch.tensor(
        [(w + 2 * pad) / w_p - 1, (h + 2 * pad) / h_p - 1]
    )
    img_aff = F.grid_sample(img_2x, warped, mode="bilinear", align_corners=False,
                            padding_mode="zeros")
    img_down = fir(img_aff, k2, down=2)
    want = img_down[:, :, pad : pad + h, pad : pad + w].numpy()

    got = np.asarray(
        apply_affine(jnp.asarray(img_np.transpose(0, 2, 3, 1)), jnp.asarray(g_np))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)


def test_augment_p1_changes_image():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32) * 0.3)
    out = jax.jit(augment)(img, jnp.asarray(1.0), jax.random.PRNGKey(1))
    assert out.shape == img.shape
    assert np.abs(np.asarray(out) - np.asarray(img)).mean() > 0.05
    assert np.all(np.isfinite(np.asarray(out)))


def test_sample_affine_p0_identity():
    g = sample_affine(jax.random.PRNGKey(0), 0.0, 4, 32, 32)
    np.testing.assert_allclose(np.asarray(g), np.tile(np.eye(3), (4, 1, 1)), atol=1e-6)


def test_sample_color_p0_identity_and_apply():
    c = sample_color(jax.random.PRNGKey(0), 0.0, 3)
    np.testing.assert_allclose(np.asarray(c), np.tile(np.eye(4), (3, 1, 1)), atol=1e-6)
    img = jnp.ones((3, 4, 4, 3)) * 0.5
    out = apply_color(img, c)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_color_matrices_last_row_structure():
    """Row 3 stays (0,0,0,s) — the saturation matrix scales the homogeneous
    row (it does in the reference's saturation_mat too); apply_color only
    reads the top 3 rows, so only the (0,0,0,*) pattern matters."""
    c = np.asarray(sample_color(jax.random.PRNGKey(2), 1.0, 8))
    np.testing.assert_allclose(c[:, 3, :3], 0.0, atol=1e-5)
    assert np.all(c[:, 3, 3] > 0)


def test_ada_p_update_direction():
    p = jnp.asarray(0.5)
    up = ada_p_update(p, jnp.asarray(0.9), 0.6, 16, 500_000)
    down = ada_p_update(p, jnp.asarray(0.1), 0.6, 16, 500_000)
    assert float(up) > 0.5 > float(down)
    assert float(ada_p_update(jnp.asarray(0.0), jnp.asarray(-1.0), 0.6, 16, 1000)) == 0.0


def test_apply_affine_beyond_pad_reflects_not_zeros():
    """Transforms needing more pad than the fixed h//4 (58% of draws at
    p=0.6!) must sample the mirrored continuation, not zeros. Oracle: the
    same torch pipeline with a LARGE materialized reflect pad. Tolerances
    are loose because the reference's own grid math is pad-dependent at
    sub-pixel scale (see ada.py module docstring)."""
    import torch
    import torch.nn.functional as F

    from gan_control_tpu.training.ada import SYM6, apply_affine

    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w] / h
    img_np = np.stack(
        [np.sin(2 * np.pi * xx), np.cos(2 * np.pi * yy), xx * yy], 0
    )[None].astype(np.float32)
    # translation by (1.0, -0.7) units = (16, 11) px >> fixed pad 8
    g_np = np.eye(3, dtype=np.float32)[None].copy()
    g_np[0, 0, 2], g_np[0, 1, 2] = 1.0, -0.7

    def oracle(img_t, pad):
        len_k = len(SYM6)
        pad_k = (len_k + 1) // 2
        k2 = torch.from_numpy(np.outer(SYM6, SYM6))

        def fir(x, kernel, up=1, down=1):
            c = x.shape[1]
            kk = torch.flip(kernel, (0, 1))[None, None].repeat(c, 1, 1, 1)
            if up > 1:
                z = torch.zeros(x.shape[0], c, x.shape[2] * up, x.shape[3] * up)
                z[:, :, ::up, ::up] = x
                x = z
            return F.conv2d(x, kk, stride=down, groups=c)

        img_pad = F.pad(img_t, (pad + pad_k,) * 4, mode="reflect")
        w_p = img_pad.shape[3] - len_k + 1
        h_p = img_pad.shape[2] - len_k + 1
        img2 = fir(img_pad, torch.flip(k2, (0, 1)), up=2)
        _, _, h2, w2 = img2.shape
        gx = torch.linspace(-2 * pad / w - 1, 2 * (w_p - pad) / w - 1, w2)
        gy = torch.linspace(-2 * pad / h - 1, 2 * (h_p - pad) / h - 1, h2)
        grid = torch.stack(
            [gx[None, :].expand(h2, w2), gy[:, None].expand(h2, w2),
             torch.ones(h2, w2)], dim=-1)[None]
        ginv = torch.inverse(torch.from_numpy(g_np))[:, :2, :]
        warped = (grid.reshape(1, -1, 3) @ ginv.transpose(1, 2)).reshape(1, h2, w2, 2)
        warped = warped * torch.tensor([w / w_p, h / h_p]) + torch.tensor(
            [(w + 2 * pad) / w_p - 1, (h + 2 * pad) / h_p - 1])
        aff = F.grid_sample(img2, warped, mode="bilinear", align_corners=False,
                            padding_mode="zeros")
        return fir(aff, k2, down=2)[:, :, pad : pad + h, pad : pad + w].numpy()

    want = oracle(torch.from_numpy(img_np), 24)  # 24px covers the pre-image
    got = np.asarray(
        apply_affine(jnp.asarray(img_np.transpose(0, 2, 3, 1)), jnp.asarray(g_np))
    ).transpose(0, 3, 1, 2)

    signal_rms = float(np.sqrt((want ** 2).mean()))
    err_rms = float(np.sqrt(((got - want) ** 2).mean()))
    assert err_rms < 0.4 * signal_rms, (err_rms, signal_rms)
    # strongly correlated with the mirrored continuation
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.93, corr
    # and definitely not zeros in the folded region (left/top strip)
    strip = got[:, :, :, :6]
    assert float(np.sqrt((strip ** 2).mean())) > 0.2 * signal_rms
