"""ADA (adaptive discriminator augmentation) — non-leaking differentiable
augmentation, jittable with static shapes.

Behavior contract (reference trainers/non_leaking.py — the StyleGAN2-ADA
pipeline; note the reference file cannot even import as published, its
`gan_control.models.op` dependency was stripped, SURVEY.md §0):
  - geometric pipeline (:151-207): x-flip, 90° rotations, integer translate
    (±0.125), isotropic scale (lognormal 0.2·ln2), p_rot-gated pre/post
    rotation (uniform ±π), anisotropic scale, fractional translate
    (N(0,0.125)); each applied with probability p as a 3x3 homogeneous
    matrix product.
  - color pipeline (:210-241): brightness (N(0,0.2)), contrast (lognormal
    0.5·ln2), luma flip, hue rotation (uniform ±π), saturation (lognormal
    ln2) as 4x4 homogeneous matrices.
  - application (:316-371): reflect-pad, SYM6 FIR 2x upsample, bilinear
    grid-sample at affine coordinates, FIR 2x downsample, crop; color as a
    per-pixel 3x3 matmul + offset (:374-391).
  - p adaptation (reference generator_trainer.py:669-688): r_t =
    E[sign(D(real))]; p += sign(r_t - target) * n_preds / ada_length,
    clamped to [0, 1).

TPU-first deviations (both intentional, static-shape requirements):
  - The reference computes a per-batch dynamic padding from the sampled
    affine extremes and retries on reflect-pad failure (:288-313). Here the
    pad is a FIXED h//4 + kernel support (static shapes under jit), and
    pre-image coordinates beyond it are reflect-FOLDED back into the frame
    (_fold_reflect) — the mirrored continuation a larger reflect pad would
    hold. This matters: at ADA p=0.6 a measured 58% of sampled affines need
    more than h//4 of padding (24% need more than h//2), so zeros there
    would blacken a large fraction of augmented batches. The folded content
    matches a big-pad reference run up to ~2px of seam phase — within the
    reference's OWN pad-to-pad variation (its linspace grid stretches
    sub-pixel with the pad size; two reference runs padded 16 vs 24 differ
    by up to 0.15 in [-1,1] units on the same transform). Unlike the
    reference we never resample an affine whose pad exceeds the image (its
    retry loop); those ultra-tail transforms get reflect-tiled content.
  - p adapts every step from the current batch's sign statistic instead of
    every 256 predictions from an accumulated buffer — the same drift in
    expectation, finer-grained steps, and no host/device syncs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.ops.upfirdn2d import upfirdn2d

SYM6 = np.array(
    [
        0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
        -0.048311742585633, 0.4910559419267466, 0.787641141030194,
        0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
        0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
    ],
    dtype=np.float32,
)


def _random_apply(rng, p, mat, prev, eye):
    """select ? mat @ prev : prev  (reference random_mat_apply)."""
    b = mat.shape[0]
    sel = jax.random.bernoulli(rng, p, (b, 1, 1)).astype(mat.dtype)
    return (sel * mat + (1 - sel) * eye) @ prev


def _translate_mat(tx, ty):
    b = tx.shape[0]
    m = jnp.tile(jnp.eye(3), (b, 1, 1))
    return m.at[:, 0, 2].set(tx).at[:, 1, 2].set(ty)


def _rotate_mat(theta):
    b = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = jnp.tile(jnp.eye(3), (b, 1, 1))
    return (
        m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s).at[:, 1, 0].set(s).at[:, 1, 1].set(c)
    )


def _scale_mat(sx, sy):
    b = sx.shape[0]
    m = jnp.tile(jnp.eye(3), (b, 1, 1))
    return m.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy)


def sample_affine(rng, p, batch, height, width):
    """[B,3,3] geometric transforms (reference sample_affine, :151-207)."""
    keys = jax.random.split(rng, 16)
    eye = jnp.tile(jnp.eye(3), (batch, 1, 1))
    g = eye

    flip = jax.random.randint(keys[0], (batch,), 0, 2).astype(jnp.float32)
    g = _random_apply(keys[1], p, _scale_mat(1 - 2 * flip, jnp.ones(batch)), g, eye)

    rot90 = jax.random.choice(keys[2], jnp.array([0.0, 3.0]), (batch,))
    g = _random_apply(keys[3], p, _rotate_mat(-math.pi / 2 * rot90), g, eye)

    t = jax.random.uniform(keys[4], (batch,), minval=-0.125, maxval=0.125)
    th = jnp.round(t * height) / height
    tw = jnp.round(t * width) / width
    g = _random_apply(keys[5], p, _translate_mat(tw, th), g, eye)

    s = jnp.exp(jax.random.normal(keys[6], (batch,)) * (0.2 * math.log(2)))
    g = _random_apply(keys[7], p, _scale_mat(s, s), g, eye)

    p_rot = 1 - math.sqrt(max(1 - p, 0.0)) if isinstance(p, float) else 1 - jnp.sqrt(
        jnp.maximum(1 - p, 0.0)
    )
    r = jax.random.uniform(keys[8], (batch,), minval=-math.pi, maxval=math.pi)
    g = _random_apply(keys[9], p_rot, _rotate_mat(-r), g, eye)

    s = jnp.exp(jax.random.normal(keys[10], (batch,)) * (0.2 * math.log(2)))
    g = _random_apply(keys[11], p, _scale_mat(s, 1 / s), g, eye)

    r = jax.random.uniform(keys[12], (batch,), minval=-math.pi, maxval=math.pi)
    g = _random_apply(keys[13], p_rot, _rotate_mat(-r), g, eye)

    t = jax.random.normal(keys[14], (batch,)) * 0.125
    g = _random_apply(keys[15], p, _translate_mat(t, t), g, eye)
    return g


def sample_color(rng, p, batch):
    """[B,4,4] color transforms (reference sample_color, :210-241)."""
    keys = jax.random.split(rng, 10)
    eye = jnp.tile(jnp.eye(4), (batch, 1, 1))
    c = eye
    v = 1.0 / math.sqrt(3.0)
    axis = jnp.array([v, v, v, 0.0])

    b_ = jax.random.normal(keys[0], (batch,)) * 0.2
    m = jnp.tile(jnp.eye(4), (batch, 1, 1))
    m = m.at[:, 0, 3].set(b_).at[:, 1, 3].set(b_).at[:, 2, 3].set(b_)
    c = _random_apply(keys[1], p, m, c, eye)

    s = jnp.exp(jax.random.normal(keys[2], (batch,)) * (0.5 * math.log(2)))
    m = jnp.tile(jnp.eye(4), (batch, 1, 1))
    m = m.at[:, 0, 0].set(s).at[:, 1, 1].set(s).at[:, 2, 2].set(s)
    c = _random_apply(keys[3], p, m, c, eye)

    flip = jax.random.randint(keys[4], (batch,), 0, 2).astype(jnp.float32)
    outer = jnp.outer(axis, axis)
    m = jnp.eye(4) - 2 * outer[None] * flip[:, None, None]
    c = _random_apply(keys[5], p, m, c, eye)

    theta = jax.random.uniform(keys[6], (batch,), minval=-math.pi, maxval=math.pi)
    u = jnp.array([v, v, v])
    cross = jnp.array([[0, -v, v], [v, 0, -v], [-v, v, 0]])
    outer3 = jnp.outer(u, u)
    ct = jnp.cos(theta)[:, None, None]
    st = jnp.sin(theta)[:, None, None]
    rot = ct * jnp.eye(3)[None] + st * cross[None] + (1 - ct) * outer3[None]
    m = jnp.tile(jnp.eye(4), (batch, 1, 1))
    m = m.at[:, :3, :3].set(rot)
    c = _random_apply(keys[7], p, m, c, eye)

    s = jnp.exp(jax.random.normal(keys[8], (batch,)) * math.log(2))
    m = outer[None] + (jnp.eye(4)[None] - outer[None]) * s[:, None, None]
    c = _random_apply(keys[9], p, m, c, eye)
    return c


def _grid_sample_zeros(img: jax.Array, gx: jax.Array, gy: jax.Array) -> jax.Array:
    """Bilinear sample NHWC at normalized coords (align_corners=False),
    zeros outside — torch grid_sample semantics."""
    b, h, w, c = img.shape
    px = ((gx + 1) * w - 1) * 0.5
    py = ((gy + 1) * h - 1) * 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def gather(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        bidx = jnp.arange(b)[:, None, None]
        vals = img[bidx, yi_c, xi_c]  # [B,H,W,C]
        return vals * inside[..., None].astype(img.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _fold_reflect(u: jax.Array, n: int) -> jax.Array:
    """Reflect-tile a normalized coordinate into the image frame.

    ``u`` in the original frame's align_corners=False convention (±1 =
    outer pixel edges); reflection is about the edge pixel CENTERS
    ±(1 - 1/n), matching torch F.pad(mode='reflect') tiling — so sampling
    the folded coordinate inside the frame equals sampling an arbitrarily
    large reflect pad, which is the reference's dynamic-pad behavior
    (non_leaking.py:288-313) without materializing the pad."""
    c = 1.0 - 1.0 / n
    t = jnp.mod(u + c, 4.0 * c)
    return jnp.where(t <= 2.0 * c, t, 4.0 * c - t) - c


def apply_affine(img: jax.Array, g: jax.Array) -> jax.Array:
    """Geometric warp with SYM6 antialiasing (reference random_apply_affine,
    :316-371). A FIXED pad = h//4 + filter support is materialized (static
    shapes under jit); pre-image coordinates beyond it are reflect-FOLDED
    back into the frame (see _fold_reflect) — equivalent content to the
    reference's per-batch dynamic reflect pad, up to the (near-symmetric)
    SYM6 filter's treatment at the fold seam. Unlike the reference we never
    resample the affine when its pad exceeds the image (its retry loop);
    those ultra-tail transforms get reflect-tiled content instead."""
    b, h, w, _ = img.shape
    kernel = jnp.asarray(np.outer(SYM6, SYM6))
    kernel_flip = jnp.flip(kernel, (0, 1))
    len_k = len(SYM6)
    pad_k = (len_k + 1) // 2
    pad = h // 4

    img_pad = jnp.pad(
        img,
        ((0, 0), (pad + pad_k, pad + pad_k), (pad + pad_k, pad + pad_k), (0, 0)),
        mode="reflect",
    )
    w_p = img_pad.shape[2] - len_k + 1
    h_p = img_pad.shape[1] - len_k + 1

    img_2x = upfirdn2d(img_pad, kernel_flip, up=2)
    h2, w2 = img_2x.shape[1], img_2x.shape[2]

    # output grid in the original image's normalized frame (reference
    # make_grid box), mapped through G^{-1}, then renormalized to the
    # padded frame (reference :337-355).
    x_lin = jnp.linspace(-2 * pad / w - 1, 2 * (w_p - pad) / w - 1, w2)
    y_lin = jnp.linspace(-2 * pad / h - 1, 2 * (h_p - pad) / h - 1, h2)
    gx0 = jnp.broadcast_to(x_lin[None, None, :], (b, h2, w2))
    gy0 = jnp.broadcast_to(y_lin[None, :, None], (b, h2, w2))
    ones = jnp.ones_like(gx0)
    coords = jnp.stack([gx0, gy0, ones], axis=-1)  # [B,h2,w2,3]

    g_inv = jnp.linalg.inv(g)[:, :2, :]  # [B,2,3]
    warped = jnp.einsum("bhwk,bjk->bhwj", coords, g_inv)  # [B,h2,w2,2]
    # inside the materialized pad: sample it directly (exact, filter-
    # consistent). Beyond it: reflect-fold into the frame — the same
    # content a larger reflect pad would hold (first mirror and onward).
    cover_x = 1.0 + 2.0 * (pad - 1) / w
    cover_y = 1.0 + 2.0 * (pad - 1) / h
    wx_r = warped[..., 0]
    wy_r = warped[..., 1]
    wx_f = jnp.where(jnp.abs(wx_r) <= cover_x, wx_r, _fold_reflect(wx_r, w))
    wy_f = jnp.where(jnp.abs(wy_r) <= cover_y, wy_r, _fold_reflect(wy_r, h))
    gx = wx_f * (w / w_p) + ((w + 2 * pad) / w_p - 1)
    gy = wy_f * (h / h_p) + ((h + 2 * pad) / h_p - 1)

    img_affine = _grid_sample_zeros(img_2x, gx, gy)
    img_down = upfirdn2d(img_affine, kernel, down=2)
    return img_down[:, pad : pad + h, pad : pad + w, :]


def apply_color(img: jax.Array, c: jax.Array) -> jax.Array:
    """Per-pixel 3x3 matmul + offset, NHWC (reference apply_color)."""
    mat = c[:, :3, :3].astype(img.dtype)
    add = c[:, :3, 3].astype(img.dtype)
    return jnp.einsum("bhwc,bjc->bhwj", img, mat) + add[:, None, None, :]


def augment(img: jax.Array, p: jax.Array, rng: jax.Array) -> jax.Array:
    """The full ADA pipeline (reference augment, :394-398)."""
    k_g, k_gs, k_c, k_cs = jax.random.split(rng, 4)
    g = sample_affine(k_g, p, img.shape[0], img.shape[1], img.shape[2])
    img = apply_affine(img, g)
    c = sample_color(k_c, p, img.shape[0])
    return apply_color(img, c)


def ada_p_update(
    p: jax.Array,
    r_t: jax.Array,
    ada_target: float,
    n_pred: int,
    ada_length: float,
) -> jax.Array:
    """p <- clip(p + sign(r_t - target) * (ada_target/ada_length) * n_pred,
    0, 1).

    Reference: ada_aug_step = ada_target / ada_length
    (generator_trainer.py:335) applied as sign * ada_aug_step * n_pred
    (:684). Per-step variant: the reference accumulates sign statistics
    until n_pred > 255 then takes one big step; updating every D step with
    n_pred = batch has the same expected rate with finer granularity."""
    step = ada_target / ada_length
    return jnp.clip(p + jnp.sign(r_t - ada_target) * (step * n_pred), 0.0, 1.0)
