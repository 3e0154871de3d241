"""Weight-converter parity, part 2 (VERDICT r1 item 3): esr9, face3dmm,
hair_pspnet, vgg_style, imagenet_cls, FAN, SFD, LPIPS.

Same pattern as test_weight_conversion.py: build torch models with the
REFERENCE's module naming (torchvision is absent on this box, so the
oracles are hand-built with identical ops and state-dict keys), random
weights, convert with our converters, compare forward outputs on identical
inputs. Reference files cited per test."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)


# ---------------------------------------------------------------------------
# torch resnet building blocks (torchvision layout, shared by two oracles)
# ---------------------------------------------------------------------------


class TorchBottleneck(nn.Module):
    def __init__(self, inp, planes, stride=1):
        super().__init__()
        out = planes * 4
        self.conv1 = nn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inp, out, 1, stride, bias=False), nn.BatchNorm2d(out)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        return F.relu(self.bn3(self.conv3(y)) + idt)


class TorchBasicBlock(nn.Module):
    def __init__(self, inp, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inp != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inp, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(y)) + idt)


def make_layer(block, inp, planes, n, stride):
    exp = 4 if block is TorchBottleneck else 1
    blocks = [block(inp, planes, stride)]
    blocks += [block(planes * exp, planes) for _ in range(n - 1)]
    return nn.Sequential(*blocks)


# ---------------------------------------------------------------------------
# ESR-9 (reference losses/facial_features_esr/esr9_model.py)
# ---------------------------------------------------------------------------


class TorchESRBase(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 5, 1)
        self.conv2 = nn.Conv2d(64, 128, 3, 1)
        self.conv3 = nn.Conv2d(128, 128, 3, 1)
        self.conv4 = nn.Conv2d(128, 128, 3, 1)
        self.bn1 = nn.BatchNorm2d(64)
        self.bn2 = nn.BatchNorm2d(128)
        self.bn3 = nn.BatchNorm2d(128)
        self.bn4 = nn.BatchNorm2d(128)
        self.pool = nn.MaxPool2d(2, 2)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.pool(F.relu(self.bn2(self.conv2(x))))
        x = F.relu(self.bn3(self.conv3(x)))
        return self.pool(F.relu(self.bn4(self.conv4(x))))


class TorchESRBranch(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(128, 128, 3, 1)
        self.conv2 = nn.Conv2d(128, 256, 3, 1)
        self.conv3 = nn.Conv2d(256, 256, 3, 1)
        self.conv4 = nn.Conv2d(256, 512, 3, 1, 1)
        self.bn1 = nn.BatchNorm2d(128)
        self.bn2 = nn.BatchNorm2d(256)
        self.bn3 = nn.BatchNorm2d(256)
        self.bn4 = nn.BatchNorm2d(512)
        self.fc = nn.Linear(512, 8)
        self.fc_dimensional = nn.Linear(8, 2)
        self.pool = nn.MaxPool2d(2, 2)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.pool(F.relu(self.bn2(self.conv2(x))))
        x = F.relu(self.bn3(self.conv3(x)))
        x = F.relu(self.bn4(self.conv4(x))).mean(dim=(2, 3))
        return self.fc(x)


@pytest.mark.slow
def test_esr9_conversion_parity(tmp_path):
    """Shared base + 9 branches, one .pt per module in a directory
    (reference esr9_model.ESR.__init__ loading layout)."""
    from gan_control_tpu.losses.predictors import esr9

    torch.manual_seed(5)
    base = TorchESRBase().eval()
    branches = [TorchESRBranch().eval() for _ in range(9)]
    randomize_bn(base)
    for b in branches:
        randomize_bn(b)
    d = tmp_path / "esr_9"
    d.mkdir()
    torch.save(base.state_dict(), d / "Net-Base-Shared_Representations.pt")
    for i, b in enumerate(branches):
        torch.save(b.state_dict(), d / f"Net-Branch_{i + 1}.pt")

    model = esr9.make_model({"center_crop": None})
    params = esr9.convert_torch_weights(model, str(d))

    x = torch.rand(2, 3, 96, 96)
    with torch.no_grad():
        shared = base(x)
        want = torch.stack([b(shared) for b in branches], dim=1).numpy()
    got_shared, got = model.module.apply(params, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(
        np.asarray(got_shared), to_nhwc(shared), rtol=2e-2, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-3)


# ---------------------------------------------------------------------------
# Deep3DFaceRecon R-Net (reference models/pytorch_3d_recon_model.py — the
# TF-v1-style resnet with stride-2-LAST EndBlocks, the most
# conversion-fragile net in the suite)
# ---------------------------------------------------------------------------


class TStart(nn.Module):
    def __init__(self, i, m, o):
        super().__init__()
        self.conv1 = nn.Conv2d(i, m, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m, eps=1.001e-5)
        self.conv2 = nn.Conv2d(m, m, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(m, eps=1.001e-5)
        self.conv3 = nn.Conv2d(m, o, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(o, eps=1.001e-5)
        self.conv_shortcut = nn.Conv2d(i, o, 1, bias=False)
        self.bn_shortcut = nn.BatchNorm2d(o, eps=1.001e-5)

    def forward(self, x):
        r = F.relu(self.bn1(self.conv1(x)))
        r = F.relu(self.bn2(self.conv2(r)))
        r = self.bn3(self.conv3(r))
        return F.relu(r + self.bn_shortcut(self.conv_shortcut(x)))


class TMid(nn.Module):
    def __init__(self, i, m, o):
        super().__init__()
        self.conv1 = nn.Conv2d(i, m, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m, eps=1.001e-5)
        self.conv2 = nn.Conv2d(m, m, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(m, eps=1.001e-5)
        self.conv3 = nn.Conv2d(m, o, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(o, eps=1.001e-5)

    def forward(self, x):
        r = F.relu(self.bn1(self.conv1(x)))
        r = F.relu(self.bn2(self.conv2(r)))
        return F.relu(self.bn3(self.conv3(r)) + x)


class TEnd(nn.Module):
    def __init__(self, i, m, o):
        super().__init__()
        self.conv1 = nn.Conv2d(i, m, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m, eps=1.001e-5)
        self.conv2 = nn.Conv2d(m, m, 3, stride=2, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(m, eps=1.001e-5)
        self.conv3 = nn.Conv2d(m, o, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(o, eps=1.001e-5)
        self.maxpool = nn.MaxPool2d(1, 2)

    def forward(self, x):
        r = F.relu(self.bn1(self.conv1(x)))
        r = F.relu(self.bn2(self.conv2(r)))
        return F.relu(self.bn3(self.conv3(r)) + self.maxpool(x))


class TTfFc(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.tf_fc = nn.Conv2d(i, o, 1)
        self.add_bais = nn.Parameter(torch.randn(o))

    def forward(self, x):
        return self.tf_fc(x).squeeze(3).squeeze(2) + self.add_bais


class TorchRecon3D(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64, eps=1.001e-5)

        def block(i, m, o, n_mid, has_end):
            units = nn.Module()
            units.unit_1 = TStart(i, m, o)
            for u in range(n_mid):
                setattr(units, f"unit_{u + 2}", TMid(o, m, o))
            if has_end:
                setattr(units, f"unit_{n_mid + 2}", TEnd(o, m, o))
            return units

        self.block1 = block(64, 64, 256, 1, True)
        self.block2 = block(256, 128, 512, 2, True)
        self.block3 = block(512, 256, 1024, 4, True)
        self.block4 = block(1024, 512, 2048, 2, False)
        for name, dim in (("id", 80), ("ex", 64), ("tex", 80), ("angles", 3),
                          ("gamma", 27), ("xy", 2), ("z", 1)):
            setattr(self, name, TTfFc(2048, dim))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(F.pad(x, (0, 1, 0, 1)), 3, 2)
        for b in (self.block1, self.block2, self.block3, self.block4):
            for u in range(1, 8):
                if hasattr(b, f"unit_{u}"):
                    x = getattr(b, f"unit_{u}")(x)
        x = F.adaptive_avg_pool2d(x, (1, 1))
        outs = [getattr(self, n)(x)
                for n in ("id", "ex", "tex", "angles", "gamma", "xy", "z")]
        return torch.cat(outs, dim=1)


@pytest.mark.slow
def test_face3dmm_conversion_parity(tmp_path):
    from gan_control_tpu.losses.predictors import face3dmm

    torch.manual_seed(6)
    tm = TorchRecon3D().eval()
    randomize_bn(tm)
    path = tmp_path / "recon3d.pt"
    torch.save(tm.state_dict(), path)

    model = face3dmm.make_model({"center_crop": None})
    params = face3dmm.convert_torch_weights(model, str(path))

    # fully-convolutional: 112 keeps the CPU forward cheap; BGR x255-scale
    # inputs as the skeleton produces
    x = torch.rand(1, 3, 112, 112) * 255.0
    with torch.no_grad():
        want = tm(x).numpy()
    got = np.asarray(model.module.apply(params, jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# PSPNet-ResNet101 hair segmentation (reference losses/hair_loss/hair_model.py)
# ---------------------------------------------------------------------------


class TorchPSPNet(nn.Module):
    def __init__(self):
        super().__init__()
        trunk = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(),
            nn.MaxPool2d(3, 2, 1),
            make_layer(TorchBottleneck, 64, 64, 3, 1),
            make_layer(TorchBottleneck, 256, 128, 4, 2),
            make_layer(TorchBottleneck, 512, 256, 23, 2),
        )
        self.base_network = nn.Module()
        self.base_network.features = trunk
        self.psp = nn.Module()
        self.psp.pooling_layers = nn.ModuleList(
            [
                nn.Sequential(nn.AdaptiveAvgPool2d(s), nn.Conv2d(1024, 256, 1))
                for s in (1, 2, 3, 6)
            ]
        )
        for j, (i, o) in enumerate(((2048, 256), (256, 64), (64, 64))):
            up = nn.Module()
            up.conv = nn.Sequential(
                nn.Conv2d(i, o, 3, padding=1, bias=False),
                nn.BatchNorm2d(o),
                nn.ReLU(),
            )
            setattr(self, f"up_{j + 1}", up)
        self.final = nn.Sequential(nn.Conv2d(64, 1, 1))

    def forward(self, x):
        h, w = x.size(2), x.size(3)
        f = self.base_network.features(x)
        fh, fw = f.size(2), f.size(3)
        feats = [f]
        for pl in self.psp.pooling_layers:
            feats.append(
                F.interpolate(pl(f), size=(fh, fw), mode="bilinear",
                              align_corners=False)
            )
        p = torch.cat(feats, dim=1)
        for j in range(1, 4):
            p = F.interpolate(p, scale_factor=2, mode="bilinear",
                              align_corners=False)
            p = getattr(self, f"up_{j}").conv(p)
        if p.size(2) != h:
            p = F.interpolate(p, size=(h, w), mode="bilinear",
                              align_corners=False)
        return self.final(p)


@pytest.mark.slow
def test_hair_pspnet_conversion_parity(tmp_path):
    from gan_control_tpu.losses.predictors import hair_pspnet

    torch.manual_seed(7)
    tm = TorchPSPNet().eval()
    randomize_bn(tm)
    path = tmp_path / "pspnet.pth"
    torch.save({"weight": tm.state_dict()}, path)

    model = hair_pspnet.make_model({})
    params = hair_pspnet.convert_torch_weights(model, str(path))

    x = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        want = to_nhwc(tm(x))
    got = np.asarray(model.module.apply(params, jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


# ---------------------------------------------------------------------------
# VGG-16 gram style (reference losses/stayle/style_skeleton.py:39-73)
# ---------------------------------------------------------------------------


def make_torch_vgg16_features(upto=31):
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
           "M", 512, 512, 512, "M"]
    layers, inp = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(inp, v, 3, padding=1), nn.ReLU()]
            inp = v
    return nn.Sequential(*layers[:upto])


@pytest.mark.slow
def test_vgg_style_conversion_parity(tmp_path):
    from gan_control_tpu.losses.predictors import vgg_style

    torch.manual_seed(8)
    feats = make_torch_vgg16_features(23).eval()  # through relu4_3
    wrapper = nn.Module()
    wrapper.features = feats
    path = tmp_path / "vgg16.pth"
    torch.save(wrapper.state_dict(), path)

    model = vgg_style.make_model({"resize_to": 64, "center_crop": None})
    params = vgg_style.convert_torch_weights(model, str(path))

    x = torch.rand(2, 3, 64, 64) * 2 - 1  # [-1,1] generator range

    def torch_grams(v):
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        h = ((v * 0.5 + 0.5) - mean) / std
        grams = []
        for i, layer in enumerate(feats):
            h = layer(h)
            if i in (3, 8, 15, 22):  # relu1_2 / 2_2 / 3_3 / 4_3
                b, c, hh, ww = h.shape
                f = h.reshape(b, c, hh * ww)
                grams.append(f @ f.transpose(1, 2) / (c * hh * ww))
        return grams

    with torch.no_grad():
        want = [g.numpy() for g in torch_grams(x)]
    got = vgg_style.features(model, params, jnp.asarray(to_nhwc(x)))
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-2, atol=2e-4)


# ---------------------------------------------------------------------------
# ImageNet ResNet-18 (reference losses/imagenet/imagenet_skeleton.py)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_imagenet_cls_conversion_parity(tmp_path):
    from gan_control_tpu.losses.predictors import imagenet_cls

    class TorchResNet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.layer1 = make_layer(TorchBasicBlock, 64, 64, 2, 1)
            self.layer2 = make_layer(TorchBasicBlock, 64, 128, 2, 2)
            self.layer3 = make_layer(TorchBasicBlock, 128, 256, 2, 2)
            self.layer4 = make_layer(TorchBasicBlock, 256, 512, 2, 2)
            self.fc = nn.Linear(512, 1000)

        def forward(self, x):
            x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            emb = x.mean(dim=(2, 3))
            return self.fc(emb), emb

    torch.manual_seed(9)
    tm = TorchResNet18().eval()
    randomize_bn(tm)
    path = tmp_path / "resnet18.pth"
    torch.save(tm.state_dict(), path)

    model = imagenet_cls.make_model({"center_crop": None})
    params = imagenet_cls.convert_torch_weights(model, str(path))

    x = torch.rand(2, 3, 224, 224)
    with torch.no_grad():
        want_logits, want_emb = tm(x)
    got_logits, got_emb = model.module.apply(params, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got_emb), want_emb.numpy(),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               rtol=2e-2, atol=2e-3)


# ---------------------------------------------------------------------------
# FAN stacked hourglass (reference face-alignment/face_alignment/models.py)
# ---------------------------------------------------------------------------


class TorchFANConvBlock(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(i)
        self.conv1 = nn.Conv2d(i, o // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(o // 2)
        self.conv2 = nn.Conv2d(o // 2, o // 4, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(o // 4)
        self.conv3 = nn.Conv2d(o // 4, o // 4, 3, padding=1, bias=False)
        self.downsample = None
        if i != o:
            self.downsample = nn.Sequential(
                nn.BatchNorm2d(i), nn.ReLU(True),
                nn.Conv2d(i, o, 1, bias=False),
            )

    def forward(self, x):
        o1 = self.conv1(F.relu(self.bn1(x)))
        o2 = self.conv2(F.relu(self.bn2(o1)))
        o3 = self.conv3(F.relu(self.bn3(o2)))
        out = torch.cat([o1, o2, o3], 1)
        res = x if self.downsample is None else self.downsample(x)
        return out + res


class TorchHourGlass(nn.Module):
    def __init__(self, depth=4, features=256):
        super().__init__()
        self.depth = depth
        for lv in range(1, depth + 1):
            self.add_module(f"b1_{lv}", TorchFANConvBlock(features, features))
            self.add_module(f"b2_{lv}", TorchFANConvBlock(features, features))
            self.add_module(f"b3_{lv}", TorchFANConvBlock(features, features))
        self.add_module("b2_plus_1", TorchFANConvBlock(features, features))

    def _fwd(self, lv, x):
        up1 = self._modules[f"b1_{lv}"](x)
        low1 = self._modules[f"b2_{lv}"](F.avg_pool2d(x, 2, 2))
        if lv > 1:
            low2 = self._fwd(lv - 1, low1)
        else:
            low2 = self._modules["b2_plus_1"](low1)
        low3 = self._modules[f"b3_{lv}"](low2)
        return up1 + F.interpolate(low3, scale_factor=2, mode="nearest")

    def forward(self, x):
        return self._fwd(self.depth, x)


class TorchFAN(nn.Module):
    def __init__(self, num_modules=2):
        super().__init__()
        self.num_modules = num_modules
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = TorchFANConvBlock(64, 128)
        self.conv3 = TorchFANConvBlock(128, 128)
        self.conv4 = TorchFANConvBlock(128, 256)
        for i in range(num_modules):
            self.add_module(f"m{i}", TorchHourGlass())
            self.add_module(f"top_m_{i}", TorchFANConvBlock(256, 256))
            self.add_module(f"conv_last{i}", nn.Conv2d(256, 256, 1))
            self.add_module(f"bn_end{i}", nn.BatchNorm2d(256))
            self.add_module(f"l{i}", nn.Conv2d(256, 68, 1))
            if i < num_modules - 1:
                self.add_module(f"bl{i}", nn.Conv2d(256, 256, 1))
                self.add_module(f"al{i}", nn.Conv2d(68, 256, 1))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)), True)
        x = F.avg_pool2d(self.conv2(x), 2, 2)
        x = self.conv4(self.conv3(x))
        previous, outputs = x, []
        for i in range(self.num_modules):
            hg = self._modules[f"m{i}"](previous)
            ll = self._modules[f"top_m_{i}"](hg)
            ll = F.relu(self._modules[f"bn_end{i}"](
                self._modules[f"conv_last{i}"](ll)), True)
            tmp = self._modules[f"l{i}"](ll)
            outputs.append(tmp)
            if i < self.num_modules - 1:
                previous = (previous + self._modules[f"bl{i}"](ll)
                            + self._modules[f"al{i}"](tmp))
        return outputs


@pytest.mark.slow
def test_fan_conversion_parity(tmp_path):
    from gan_control_tpu.alignment import fan as fan_lib

    torch.manual_seed(10)
    tm = TorchFAN(num_modules=2).eval()
    randomize_bn(tm)
    path = tmp_path / "2dfan.pth"
    torch.save(tm.state_dict(), path)

    params = fan_lib.convert_torch_weights(str(path), num_modules=2)
    net = fan_lib.FANNet(num_modules=2)

    x = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        want = [to_nhwc(o) for o in tm(x)]
    got = net.apply(params, jnp.asarray(to_nhwc(x)))
    assert len(got) == 2
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=5e-2, atol=5e-3)


# ---------------------------------------------------------------------------
# S3FD detector (reference face-alignment/.../sfd/net_s3fd.py)
# ---------------------------------------------------------------------------


class TorchS3FD(nn.Module):
    def __init__(self):
        super().__init__()
        chans = {
            "conv1_1": (3, 64), "conv1_2": (64, 64),
            "conv2_1": (64, 128), "conv2_2": (128, 128),
            "conv3_1": (128, 256), "conv3_2": (256, 256), "conv3_3": (256, 256),
            "conv4_1": (256, 512), "conv4_2": (512, 512), "conv4_3": (512, 512),
            "conv5_1": (512, 512), "conv5_2": (512, 512), "conv5_3": (512, 512),
        }
        for n, (i, o) in chans.items():
            setattr(self, n, nn.Conv2d(i, o, 3, padding=1))
        self.fc6 = nn.Conv2d(512, 1024, 3, padding=3)
        self.fc7 = nn.Conv2d(1024, 1024, 1)
        self.conv6_1 = nn.Conv2d(1024, 256, 1)
        self.conv6_2 = nn.Conv2d(256, 512, 3, stride=2, padding=1)
        self.conv7_1 = nn.Conv2d(512, 128, 1)
        self.conv7_2 = nn.Conv2d(128, 256, 3, stride=2, padding=1)
        for n, c, s in (("conv3_3_norm", 256, 10.0), ("conv4_3_norm", 512, 8.0),
                        ("conv5_3_norm", 512, 5.0)):
            mod = nn.Module()
            mod.weight = nn.Parameter(torch.full((c,), s))
            setattr(self, n, mod)
        heads = [("conv3_3_norm", 256, 4), ("conv4_3_norm", 512, 2),
                 ("conv5_3_norm", 512, 2), ("fc7", 1024, 2),
                 ("conv6_2", 512, 2), ("conv7_2", 256, 2)]
        for n, c, nconf in heads:
            setattr(self, f"{n}_mbox_conf", nn.Conv2d(c, nconf, 3, padding=1))
            setattr(self, f"{n}_mbox_loc", nn.Conv2d(c, 4, 3, padding=1))

    @staticmethod
    def l2norm(x, w):
        norm = x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10
        return x / norm * w.view(1, -1, 1, 1)

    def forward(self, x):
        h = F.relu(self.conv1_2(F.relu(self.conv1_1(x))))
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.conv2_2(F.relu(self.conv2_1(h))))
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.conv3_3(F.relu(self.conv3_2(F.relu(self.conv3_1(h))))))
        f3_3 = h
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.conv4_3(F.relu(self.conv4_2(F.relu(self.conv4_1(h))))))
        f4_3 = h
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.conv5_3(F.relu(self.conv5_2(F.relu(self.conv5_1(h))))))
        f5_3 = h
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.fc7(F.relu(self.fc6(h))))
        ffc7 = h
        h = F.relu(self.conv6_2(F.relu(self.conv6_1(h))))
        f6_2 = h
        h = F.relu(self.conv7_2(F.relu(self.conv7_1(h))))
        f7_2 = h
        f3_3 = self.l2norm(f3_3, self.conv3_3_norm.weight)
        f4_3 = self.l2norm(f4_3, self.conv4_3_norm.weight)
        f5_3 = self.l2norm(f5_3, self.conv5_3_norm.weight)
        cls1 = self.conv3_3_norm_mbox_conf(f3_3)
        bmax = torch.max(torch.max(cls1[:, 0:1], cls1[:, 1:2]), cls1[:, 2:3])
        cls1 = torch.cat([bmax, cls1[:, 3:4]], dim=1)
        outs = [(cls1, self.conv3_3_norm_mbox_loc(f3_3))]
        for f, n in ((f4_3, "conv4_3_norm"), (f5_3, "conv5_3_norm"),
                     (ffc7, "fc7"), (f6_2, "conv6_2"), (f7_2, "conv7_2")):
            outs.append((getattr(self, f"{n}_mbox_conf")(f),
                         getattr(self, f"{n}_mbox_loc")(f)))
        return outs


@pytest.mark.slow
def test_sfd_conversion_parity(tmp_path):
    from gan_control_tpu.alignment import sfd as sfd_lib

    torch.manual_seed(12)
    tm = TorchS3FD().eval()
    with torch.no_grad():
        for n in ("conv3_3_norm", "conv4_3_norm", "conv5_3_norm"):
            getattr(tm, n).weight.add_(torch.randn_like(getattr(tm, n).weight) * 0.3)
    path = tmp_path / "s3fd.pth"
    torch.save(tm.state_dict(), path)

    params = sfd_lib.convert_torch_weights(str(path))
    net = sfd_lib.S3FD()

    x = torch.randn(1, 3, 128, 128) * 50  # mean-subtracted pixel scale
    with torch.no_grad():
        want = tm(x)
    got = net.apply(params, jnp.asarray(to_nhwc(x)))
    assert len(got) == 6
    for (gc, gl), (wc, wl) in zip(got, want):
        np.testing.assert_allclose(np.asarray(gc), to_nhwc(wc), rtol=5e-2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(gl), to_nhwc(wl), rtol=5e-2, atol=5e-2)


# ---------------------------------------------------------------------------
# LPIPS (reference projection/lpips/networks_basic.py PNetLin, vgg variant)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_lpips_conversion_parity(tmp_path):
    from gan_control_tpu.projection import lpips as lpips_lib

    torch.manual_seed(13)
    feats = make_torch_vgg16_features(30).eval()  # through relu5_3
    wrapper = nn.Module()
    wrapper.features = feats
    vgg_path = tmp_path / "vgg16.pth"
    torch.save(wrapper.state_dict(), vgg_path)

    lin = {
        f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1)
        for i, c in enumerate((64, 128, 256, 512, 512))
    }
    lin_path = tmp_path / "lpips_vgg.pth"
    torch.save(lin, lin_path)

    params = lpips_lib.convert_torch_weights(str(vgg_path), str(lin_path))

    x0 = torch.rand(2, 3, 64, 64) * 2 - 1
    x1 = torch.rand(2, 3, 64, 64) * 2 - 1

    def torch_lpips(a, b):
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def backbone(v):
            h = (v - shift) / scale
            outs = []
            for i, layer in enumerate(feats):
                h = layer(h)
                if i in (3, 8, 15, 22, 29):
                    outs.append(h)
            return outs

        def unit(f):
            n = f.pow(2).sum(dim=1, keepdim=True).sqrt()
            return f / (n + 1e-10)

        total = torch.zeros(a.shape[0])
        for li, (fa, fb) in enumerate(zip(backbone(a), backbone(b))):
            d = (unit(fa) - unit(fb)) ** 2
            w = lin[f"lin{li}.model.1.weight"]
            total = total + F.conv2d(d, w).mean(dim=(2, 3)).squeeze(1)
        return total

    with torch.no_grad():
        want = torch_lpips(x0, x1).numpy()
    got = np.asarray(
        lpips_lib.lpips_distance(params, jnp.asarray(to_nhwc(x0)),
                                 jnp.asarray(to_nhwc(x1)))
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-4)


# ---------------------------------------------------------------------------
# ResNetDepth — face-alignment 3D z net (reference models.py:199-261)
# ---------------------------------------------------------------------------


class TorchResNetDepth(nn.Module):
    """Reference layout: 71-channel stem, torchvision-named stages, fc."""

    def __init__(self, layers=(1, 1, 1, 1), num_classes=68):
        super().__init__()
        self.conv1 = nn.Conv2d(3 + 68, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = make_layer(TorchBottleneck, 64, 64, layers[0], 1)
        self.layer2 = make_layer(TorchBottleneck, 256, 128, layers[1], 2)
        self.layer3 = make_layer(TorchBottleneck, 512, 256, layers[2], 2)
        self.layer4 = make_layer(TorchBottleneck, 1024, 512, layers[3], 2)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = F.avg_pool2d(x, 7)  # NOT global: single 7x7 window on 8x8
        return self.fc(x.flatten(1))


@pytest.mark.slow
def test_resnet_depth_conversion_parity(tmp_path):
    """convert_torch_weights handles the real container quirks: a
    {'state_dict': ...} wrapper whose keys carry the DataParallel
    'module.' prefix (reference api.py:86-91)."""
    from gan_control_tpu.alignment import depth as depth_lib

    torch.manual_seed(11)
    layers = (1, 1, 1, 1)
    tm = TorchResNetDepth(layers).eval()
    randomize_bn(tm)
    path = tmp_path / "depth.pth"
    torch.save(
        {"state_dict": {f"module.{k}": v for k, v in tm.state_dict().items()}},
        path,
    )

    params = depth_lib.convert_torch_weights(str(path), layers=layers)
    net = depth_lib.ResNetDepth(layers=layers)

    x = torch.rand(1, 71, 256, 256)
    with torch.no_grad():
        want = tm(x).numpy()
    got = np.asarray(net.apply(params, jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
