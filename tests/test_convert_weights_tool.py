"""tools/convert_weights.py end-to-end: converts what it finds, reports what
is missing, writes goldens + msgpack, --validate round-trips, and the loss
registry consumes the msgpack output without torch."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import convert_weights as cw  # noqa: E402

from test_weight_conversion2 import make_torch_vgg16_features  # noqa: E402


def _make_root(tmp_path):
    root = tmp_path / "pretrained_models"
    root.mkdir()
    torch.manual_seed(21)
    feats = make_torch_vgg16_features(31)
    wrapper = torch.nn.Module()
    wrapper.features = feats
    torch.save(wrapper.state_dict(), root / "vgg16-397923af.pth")
    return root


@pytest.mark.slow
def test_convert_tool_end_to_end(tmp_path, capsys):
    root = _make_root(tmp_path)
    rc = cw.main(["--root", str(root)])
    assert rc == 0
    out = capsys.readouterr().out
    # vgg16 found -> style_loss (and lpips backbone needs lin weights, missing)
    assert "converting style_loss" in out
    assert "MISSING" in out and "embedding_loss" in out

    out_dir = root / "converted"
    mp = out_dir / "style_loss.msgpack"
    assert mp.exists()
    goldens = json.loads((out_dir / "goldens.json").read_text())
    assert "style_loss" in goldens
    assert goldens["style_loss"]["source_sha256"]
    assert len(goldens["style_loss"]["golden"]["first8"]) == 8

    # validate passes against the stored goldens
    rc = cw.main(["--root", str(root), "--validate"])
    assert rc == 0
    assert "OK      style_loss" in capsys.readouterr().out

    # corrupt the golden -> validate fails
    goldens["style_loss"]["golden"]["mean"] += 1.0
    (out_dir / "goldens.json").write_text(json.dumps(goldens))
    rc = cw.main(["--root", str(root), "--validate"])
    assert rc == 1


@pytest.mark.slow
def test_registry_loads_msgpack(tmp_path):
    """A config model_path pointing at the tool's .msgpack output loads the
    converted params (bit-identical to on-the-fly torch conversion)."""
    from gan_control_tpu.losses.predictors import vgg_style
    from gan_control_tpu.losses.registry import build_attr_losses

    root = _make_root(tmp_path)
    assert cw.main(["--root", str(root), "--only", "style_loss"]) == 0
    mp = root / "converted" / "style_loss.msgpack"

    tc = {
        "style_loss": {
            "enabled": True,
            "model_path": str(mp),
            "same_group_name": "style",
            "last_layer_weight": 1.0,
            "intermediate_layers_weights": [1.0, 1.0, 1.0],
            "lower_thres": [0.0, 0.0, 0.0],
            "upper_thres": [1.0, 1.0, 1.0],
            "last_lower_thres": 0.0,
            "last_upper_thres": 1.0,
            "focus_on_list": ["same_as_last_layer"] * 4,
            "intermediate_criterion_as_last_layer": True,
        }
    }
    specs, params = build_attr_losses(tc)
    assert len(specs) == 1 and specs[0].name == "style_loss"

    model = vgg_style.make_model({"center_crop": None})
    direct = vgg_style.convert_torch_weights(model, str(root / "vgg16-397923af.pth"))
    loaded_leaf = params["style_loss"]["params"]["conv0"]["weight"]
    direct_leaf = direct["params"]["conv0"]["weight"]
    np.testing.assert_array_equal(np.asarray(loaded_leaf), np.asarray(direct_leaf))

    # and the loaded params drive the feature fn
    img = jnp.zeros((2, 64, 64, 3))
    feats = specs[0].feature_fn(params["style_loss"], img)
    assert feats[-1].shape[0] == 2


def test_verify_sha_pins_and_manifest(tmp_path, capsys):
    """--verify-sha: filename-pinned checkpoints are enforced (our fake
    vgg16 fails its published pin), unpinned ones are recorded into
    sha256s.json and enforced against the recording on the next run."""
    root = _make_root(tmp_path)
    # an unpinned checkpoint: hopenet
    (root / "hopenet_robust_alpha1.pkl").write_bytes(b"fake-hopenet-weights")

    rc = cw.main(["--root", str(root), "--verify-sha"])
    out = capsys.readouterr().out
    assert rc == 1  # fake vgg16 violates its 397923af pin
    assert "MISMATCH style_loss" in out
    assert "OK      orientation_loss" in out and "[recorded]" in out

    manifest = json.loads((root / "converted" / "sha256s.json").read_text())
    assert "orientation_loss" in manifest
    assert len(manifest["orientation_loss"]["sha256"]) == 64
    assert "style_loss" not in manifest  # mismatches are not recorded

    # tamper with the recorded file -> second run flags it
    (root / "hopenet_robust_alpha1.pkl").write_bytes(b"tampered")
    rc = cw.main(["--root", str(root), "--verify-sha"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "MISMATCH orientation_loss" in out


# ---------------------------------------------------------------------------
# The four quirky REAL checkpoint containers (VERDICT r4 item 5): hopenet's
# .pkl, the esr_9 directory layout, the caffe-exported DEX key names, and
# the TF-converted R-Net naming — synthesized state_dicts with the exact
# container quirks, run through the FULL convert -> golden -> validate flow.
# ---------------------------------------------------------------------------


def _rand(rng, *shape):
    return torch.from_numpy(rng.standard_normal(shape).astype("float32"))


def _put_conv(rng, sd, name, o, i, k, bias=True):
    sd[f"{name}.weight"] = _rand(rng, o, i, k, k) * 0.05
    if bias:
        sd[f"{name}.bias"] = _rand(rng, o) * 0.05


def _put_bn(rng, sd, prefix, ch):
    sd[f"{prefix}.weight"] = 1.0 + _rand(rng, ch) * 0.1
    sd[f"{prefix}.bias"] = _rand(rng, ch) * 0.1
    sd[f"{prefix}.running_mean"] = _rand(rng, ch) * 0.1
    sd[f"{prefix}.running_var"] = 0.75 + 0.5 * torch.rand(ch)


def _hopenet_state_dict(rng):
    """torchvision-v1 ResNet-50 trunk + 3 bin heads (the real
    hopenet_robust_alpha1.pkl is a torch-pickled state_dict despite the
    .pkl extension — reference hopenet_skeleton.py:61)."""
    sd = {}
    _put_conv(rng, sd, "conv1", 64, 3, 7, bias=False)
    _put_bn(rng, sd, "bn1", 64)
    inp = 64
    for s, n in enumerate([3, 4, 6, 3]):
        planes = 64 * 2**s
        for b in range(n):
            t = f"layer{s + 1}.{b}"
            _put_conv(rng, sd, f"{t}.conv1", planes, inp, 1, bias=False)
            _put_bn(rng, sd, f"{t}.bn1", planes)
            _put_conv(rng, sd, f"{t}.conv2", planes, planes, 3, bias=False)
            _put_bn(rng, sd, f"{t}.bn2", planes)
            _put_conv(rng, sd, f"{t}.conv3", planes * 4, planes, 1, bias=False)
            _put_bn(rng, sd, f"{t}.bn3", planes * 4)
            if b == 0:
                _put_conv(rng, sd, f"{t}.downsample.0", planes * 4, inp, 1,
                          bias=False)
                _put_bn(rng, sd, f"{t}.downsample.1", planes * 4)
            inp = planes * 4
    for h in ("fc_yaw", "fc_pitch", "fc_roll"):
        sd[f"{h}.weight"] = _rand(rng, 66, 2048) * 0.05
        sd[f"{h}.bias"] = _rand(rng, 66) * 0.05
    return sd


def _esr9_dir(rng, root):
    """Reference esr_9 layout: Net-Base-Shared_Representations.pt +
    Net-Branch_{1..9}.pt (esr9_model.ESR.__init__)."""
    d = root / "esr_9"
    d.mkdir()

    def block(chans, fc=False):
        sd = {}
        for c, (i, o, k) in enumerate(chans, start=1):
            _put_conv(rng, sd, f"conv{c}", o, i, k)
            _put_bn(rng, sd, f"bn{c}", o)
        if fc:
            sd["fc.weight"] = _rand(rng, 8, 512) * 0.05
            sd["fc.bias"] = _rand(rng, 8) * 0.05
        return sd

    torch.save(
        block([(3, 64, 5), (64, 128, 3), (128, 128, 3), (128, 128, 3)]),
        d / "Net-Base-Shared_Representations.pt",
    )
    for i in range(1, 10):
        torch.save(
            block([(128, 128, 3), (128, 256, 3), (256, 256, 3),
                   (256, 512, 3)], fc=True),
            d / f"Net-Branch_{i}.pt",
        )
    return d


def _dex_state_dict(rng):
    """Caffe-exported VGG-16 with DASHED conv names ('conv1-1.weight') —
    the converter must apply the reference's '-'->'_' key rewrite
    (deep_age_skeleton.py:79-81)."""
    sd = {}
    cfg = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
    inp = 3
    for b, (ch, n) in enumerate(cfg):
        for c in range(n):
            _put_conv(rng, sd, f"conv{b + 1}-{c + 1}", ch, inp, 3)
            inp = ch
    sd["fc6.weight"] = _rand(rng, 4096, 25088) * 0.01
    sd["fc6.bias"] = _rand(rng, 4096) * 0.01
    sd["fc7.weight"] = _rand(rng, 4096, 4096) * 0.01
    sd["fc7.bias"] = _rand(rng, 4096) * 0.01
    sd["fc8_101.weight"] = _rand(rng, 101, 4096) * 0.01
    sd["fc8_101.bias"] = _rand(rng, 101) * 0.01
    return sd


def _rnet_state_dict(rng):
    """TF-converted R-Net naming: block{b}.unit_{u}.* with conv_shortcut
    only on start units, and the tf_fc/add_bais head fields the pb
    converter writes (reference face3dmm_recon/models/pb.py:193-206)."""
    sd = {}
    _put_conv(rng, sd, "conv1", 64, 3, 7, bias=False)
    _put_bn(rng, sd, "bn1", 64)
    blocks = ((64, 256, 1, True), (128, 512, 2, True), (256, 1024, 4, True),
              (512, 2048, 2, False))
    inp = 64
    for b, (mid, out, n_mid, has_end) in enumerate(blocks):
        units = ["unit_1"] + [f"unit_{u + 2}" for u in range(n_mid)]
        if has_end:
            units.append(f"unit_{n_mid + 2}")
        for u, uname in enumerate(units):
            t = f"block{b + 1}.{uname}"
            cin = inp if u == 0 else out
            _put_conv(rng, sd, f"{t}.conv1", mid, cin, 1, bias=False)
            _put_bn(rng, sd, f"{t}.bn1", mid)
            _put_conv(rng, sd, f"{t}.conv2", mid, mid, 3, bias=False)
            _put_bn(rng, sd, f"{t}.bn2", mid)
            _put_conv(rng, sd, f"{t}.conv3", out, mid, 1, bias=False)
            _put_bn(rng, sd, f"{t}.bn3", out)
            if uname == "unit_1":
                _put_conv(rng, sd, f"{t}.conv_shortcut", out, cin, 1,
                          bias=False)
                _put_bn(rng, sd, f"{t}.bn_shortcut", out)
        inp = out
    for name, dim in (("id", 80), ("ex", 64), ("tex", 80), ("angles", 3),
                      ("gamma", 27), ("xy", 2), ("z", 1)):
        sd[f"{name}.tf_fc.weight"] = _rand(rng, dim, 2048, 1, 1) * 0.05
        sd[f"{name}.tf_fc.bias"] = _rand(rng, dim) * 0.05
        sd[f"{name}.add_bais"] = _rand(rng, dim) * 0.05
    return sd


@pytest.mark.slow
def test_convert_tool_four_container_formats(tmp_path, capsys):
    import numpy as _np

    rng = _np.random.default_rng(42)
    root = tmp_path / "pretrained_models"
    root.mkdir()
    torch.save(_hopenet_state_dict(rng), root / "hopenet_robust_alpha1.pkl")
    _esr9_dir(rng, root)
    torch.save(_dex_state_dict(rng), root / "dex_imdb_wiki.pt")
    (root / "face3dmm_recon").mkdir()
    torch.save(_rnet_state_dict(rng),
               root / "face3dmm_recon" / "pytorch_converted_model.pt")

    only = ["orientation_loss", "expression_loss", "age_loss",
            "recon_3d_loss"]
    rc = cw.main(["--root", str(root), "--only"] + only)
    out = capsys.readouterr().out
    assert rc == 0, out
    for name in only:
        assert f"converting {name}" in out, out
        assert (root / "converted" / f"{name}.msgpack").exists()

    goldens = json.loads((root / "converted" / "goldens.json").read_text())
    for name in only:
        g = goldens[name]["golden"]
        assert all(np.isfinite(v) for v in g["first8"]), (name, g)
        assert goldens[name]["source_sha256"]
    # the esr_9 DIRECTORY hashes deterministically (sorted file walk)
    assert len(goldens["expression_loss"]["source_sha256"]) == 64

    # validate round-trips every container from the msgpack alone
    rc = cw.main(["--root", str(root), "--validate", "--only"] + only)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert out.count("OK") >= 4, out
