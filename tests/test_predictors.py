"""Structural + gradient tests for every frozen predictor: random weights,
small batch, native input size. Checks the registry interface contract
(feature list shapes, last-layer distance matrix, predict output) and that
gradients flow through the predictor INTO the image (the contrastive losses
backprop through frozen nets into G — SURVEY.md §7.3)."""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

BATCH = 2


def run_predictor(mod_name, config, img_size, expect_last_shape):
    mod = importlib.import_module(f"gan_control_tpu.losses.predictors.{mod_name}")
    model = mod.make_model(config)
    params = mod.init_params(model, jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, img_size, img_size, 3)) * 0.3
    feats = jax.jit(lambda p, x: mod.features(model, p, x))(params, images)
    assert isinstance(feats, (list, tuple)) and len(feats) >= 1
    last = feats[-1]
    assert last.shape[0] == BATCH
    if expect_last_shape is not None:
        assert last.shape[1:] == expect_last_shape, last.shape
    dist = mod.last_layer_dist(last)
    assert dist.shape == (BATCH, BATCH)
    assert np.all(np.isfinite(np.asarray(dist)))
    return mod, model, params, images


def test_arcface():
    mod, model, params, images = run_predictor(
        "arcface", {"center_crop": None}, 64, (512,)
    )
    emb = mod.features(model, params, images)[-1]
    np.testing.assert_allclose(
        np.sum(np.square(np.asarray(emb)), axis=1), 1.0, rtol=1e-4
    )  # l2-normalized

    # gradient flows through the frozen net into the image
    g = jax.grad(
        lambda x: jnp.sum(mod.features(model, params, x)[-1])
    )(images)
    assert float(jnp.max(jnp.abs(g))) > 0


def test_hopenet():
    mod, model, params, images = run_predictor(
        "hopenet", {}, 64, (3, 66)
    )
    pred = mod.predict(model, params, images)
    assert pred.shape == (BATCH, 3)
    assert np.all(np.abs(np.asarray(pred)) <= 99.0)


def test_dex_age():
    mod, model, params, images = run_predictor(
        "dex_age", {"center_crop": None}, 64, (101,)
    )
    age = mod.predict(model, params, images)
    assert age.shape == (BATCH,)
    assert np.all((np.asarray(age) >= 0) & (np.asarray(age) <= 100))


def test_esr9():
    mod, model, params, images = run_predictor(
        "esr9", {"center_crop": None}, 96, (9, 8)
    )
    cls = mod.predict(model, params, images)
    assert cls.shape == (BATCH,)
    assert np.all((np.asarray(cls) >= 0) & (np.asarray(cls) < 8))


def test_face3dmm():
    mod, model, params, images = run_predictor(
        "face3dmm", {"center_crop": None}, 64, (257,)
    )
    vec = mod.features(model, params, images)[-1]
    gamma = mod.extract_feature(vec, "gamma")
    assert gamma.shape == (BATCH, 27)
    angles = mod.extract_feature(vec, "angles")
    assert angles.shape == (BATCH, 3)


def test_hair_pspnet():
    mod, model, params, images = run_predictor(
        "hair_pspnet", {}, 64, (256, 256, 4)
    )
    color = mod.predict(model, params, images)
    assert color.shape == (BATCH, 3)
    # mask channel is binary
    f = mod.features(model, params, images)[0]
    mask = np.asarray(f[..., 3])
    assert set(np.unique(mask)).issubset({0.0, 1.0})


def test_vgg_style():
    mod, model, params, images = run_predictor(
        "vgg_style", {"resize_to": 64, "center_crop": None}, 64, (512, 512)
    )
    feats = mod.features(model, params, images)
    assert len(feats) == 4  # gram per slice
    for g, ch in zip(feats, (64, 128, 256, 512)):
        assert g.shape == (BATCH, ch, ch)


def test_dogfacenet():
    mod, model, params, images = run_predictor(
        "dogfacenet", {"center_crop": None}, 64, (32,)
    )
    emb = np.asarray(mod.features(model, params, images)[-1])
    np.testing.assert_allclose(np.sum(np.square(emb), axis=1), 1.0, rtol=1e-4)


def test_imagenet_cls():
    mod, model, params, images = run_predictor(
        "imagenet_cls", {"center_crop": None}, 64, (512,)
    )
    cls = mod.predict(model, params, images)
    assert cls.shape == (BATCH,)
