"""Weight-converter parity: build torch models with the REFERENCE's module
naming, random weights, convert with our converters, and compare forward
outputs torch-vs-flax on identical inputs. Exercises the conv/linear
transposes and the NCHW->NHWC flatten reordering that every converter
relies on."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.slow
def test_dex_vgg_conversion_parity(tmp_path):
    """DEX VGG-16 (reference deep_age_model.VGG field names)."""
    from gan_control_tpu.losses.predictors import dex_age

    class TorchVGG(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
                     (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
                     (512, 512), (512, 512), (512, 512)]
            names = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
                     "conv3_2", "conv3_3", "conv4_1", "conv4_2", "conv4_3",
                     "conv5_1", "conv5_2", "conv5_3"]
            for (i, o), n in zip(chans, names):
                setattr(self, n, nn.Conv2d(i, o, 3, padding=1))
            self.fc6 = nn.Linear(25088, 4096)
            self.fc7 = nn.Linear(4096, 4096)
            self.fc8_101 = nn.Linear(4096, 101)

        def forward(self, x):
            import torch.nn.functional as F

            for block in (["conv1_1", "conv1_2"], ["conv2_1", "conv2_2"],
                          ["conv3_1", "conv3_2", "conv3_3"],
                          ["conv4_1", "conv4_2", "conv4_3"],
                          ["conv5_1", "conv5_2", "conv5_3"]):
                for n in block:
                    x = F.relu(getattr(self, n)(x))
                x = F.max_pool2d(x, 2, 2)
            x = x.view(x.size(0), -1)
            x = F.relu(self.fc6(x))
            x = F.relu(self.fc7(x))
            return self.fc8_101(x)

    torch.manual_seed(0)
    tm = TorchVGG().eval()
    path = tmp_path / "dex.pt"
    torch.save(tm.state_dict(), path)

    model = dex_age.make_model({"center_crop": None})
    params = dex_age.convert_torch_weights(model, str(path))

    x = torch.randn(2, 3, 224, 224) * 10  # caffe-scale inputs
    with torch.no_grad():
        want = tm(x).numpy()
    got = np.asarray(model.module.apply(params, jnp.asarray(to_nhwc(x)))[-1])
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


@pytest.mark.slow
def test_dogfacenet_conversion_parity(tmp_path):
    """DogFaceNet (reference pytorch_dogfacenet_model field names)."""
    from gan_control_tpu.losses.predictors import dogfacenet as dfn

    class TorchRes(nn.Module):
        def __init__(self, i, o, pad="reg"):
            super().__init__()
            self.pad0 = nn.ZeroPad2d((1, 1, 1, 1) if pad == "reg" else (0, 1, 0, 1))
            self.conv0 = nn.Conv2d(i, o, 3, stride=2, bias=False)
            self.bn0 = nn.BatchNorm2d(o)
            self.conv1 = nn.Conv2d(o, o, 3, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(o)
            self.conv2 = nn.Conv2d(o, o, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(o)

        def forward(self, x):
            import torch.nn.functional as F

            r = self.bn0(F.relu(self.conv0(self.pad0(x))))
            r = r + self.bn1(F.relu(self.conv1(r)))
            return r + self.bn2(F.relu(self.conv2(r)))

    class TorchDFN(nn.Module):
        def __init__(self):
            super().__init__()
            self.pad0 = nn.ZeroPad2d((2, 4, 2, 4))
            self.conv0 = nn.Conv2d(3, 16, 7, stride=2, bias=False)
            self.bn0 = nn.BatchNorm2d(16)
            self.res_block1 = TorchRes(16, 16)
            self.res_block2 = TorchRes(16, 32)
            self.res_block3 = TorchRes(32, 64, pad="b3")
            self.res_block4 = TorchRes(64, 128)
            self.res_block5 = TorchRes(128, 512)
            self.fc = nn.Linear(512, 32, bias=False)

        def forward(self, x):
            import torch.nn.functional as F

            x = self.bn0(F.relu(self.conv0(self.pad0(x))))
            x = F.max_pool2d(x, 3)
            for i in range(1, 6):
                x = getattr(self, f"res_block{i}")(x)
            x = x.mean(dim=(2, 3))
            x = self.fc(x)
            return x / x.norm(dim=1, keepdim=True)

    torch.manual_seed(1)
    tm = TorchDFN().eval()
    # non-trivial BN stats
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    path = tmp_path / "dfn.pt"
    torch.save(tm.state_dict(), path)

    model = dfn.make_model({"center_crop": None})
    params = dfn.convert_torch_weights(model, str(path))

    x = torch.rand(2, 3, 224, 224)
    with torch.no_grad():
        want = tm(x).numpy()
    got = np.asarray(model.module.apply(params, jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_hopenet_conversion_parity(tmp_path):
    """Hopenet = ResNet-50 trunk (torchvision v1.5 layout, built manually —
    torchvision is absent here) + 3 bin heads; validates the shared
    convert_trunk used by hopenet / hair_pspnet / imagenet_cls."""
    from gan_control_tpu.losses.predictors import hopenet as hp

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
            import torch.nn.functional as F

            idt = x if self.downsample is None else self.downsample(x)
            y = F.relu(self.bn1(self.conv1(x)))
            y = F.relu(self.bn2(self.conv2(y)))
            return F.relu(self.bn3(self.conv3(y)) + idt)

    def make_layer(inp, planes, n, stride):
        blocks = [TorchBottleneck(inp, planes, stride)]
        blocks += [TorchBottleneck(planes * 4, planes) for _ in range(n - 1)]
        return nn.Sequential(*blocks)

    class TorchHopenet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.layer1 = make_layer(64, 64, 3, 1)
            self.layer2 = make_layer(256, 128, 4, 2)
            self.layer3 = make_layer(512, 256, 6, 2)
            self.layer4 = make_layer(1024, 512, 3, 2)
            self.fc_yaw = nn.Linear(2048, 66)
            self.fc_pitch = nn.Linear(2048, 66)
            self.fc_roll = nn.Linear(2048, 66)

        def forward(self, x):
            import torch.nn.functional as F

            x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = x.mean(dim=(2, 3))
            return torch.stack(
                [self.fc_yaw(x), self.fc_pitch(x), self.fc_roll(x)], dim=1
            )

    torch.manual_seed(2)
    tm = TorchHopenet().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    path = tmp_path / "hopenet.pkl"
    torch.save(tm.state_dict(), path)

    model = hp.make_model({})
    params = hp.convert_torch_weights(model, str(path))

    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        want = tm(x).numpy()
    got = np.asarray(model.module.apply(params, jnp.asarray(to_nhwc(x)))[-1])
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


@pytest.mark.slow
def test_arcface_conversion_parity(tmp_path):
    """IR-SE-50 (reference arc_face_model field names: input_layer /
    body.{i}.res_layer / shortcut_layer / output_layer) — validates the
    SE blocks, PReLU, MaxPool(1,stride) shortcuts, and the 512*7*7
    flatten reorder in out_fc."""
    from gan_control_tpu.losses.predictors import arcface as af

    class SE(nn.Module):
        def __init__(self, ch, red=16):
            super().__init__()
            self.avg_pool = nn.AdaptiveAvgPool2d(1)
            self.fc1 = nn.Conv2d(ch, ch // red, 1, bias=False)
            self.relu = nn.ReLU()
            self.fc2 = nn.Conv2d(ch // red, ch, 1, bias=False)
            self.sigmoid = nn.Sigmoid()

        def forward(self, x):
            a = self.sigmoid(self.fc2(self.relu(self.fc1(self.avg_pool(x)))))
            return x * a

    class IRSE(nn.Module):
        def __init__(self, inp, depth, stride):
            super().__init__()
            if inp == depth:
                self.shortcut_layer = nn.MaxPool2d(1, stride)
            else:
                self.shortcut_layer = nn.Sequential(
                    nn.Conv2d(inp, depth, 1, stride, bias=False),
                    nn.BatchNorm2d(depth),
                )
            self.res_layer = nn.Sequential(
                nn.BatchNorm2d(inp),
                nn.Conv2d(inp, depth, 3, 1, 1, bias=False), nn.PReLU(depth),
                nn.Conv2d(depth, depth, 3, stride, 1, bias=False),
                nn.BatchNorm2d(depth), SE(depth),
            )

        def forward(self, x):
            return self.res_layer(x) + self.shortcut_layer(x)

    class TorchArc(nn.Module):
        def __init__(self):
            super().__init__()
            self.input_layer = nn.Sequential(
                nn.Conv2d(3, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64),
                nn.PReLU(64),
            )
            mods = []
            for depth, units in ((64, 3), (128, 4), (256, 14), (512, 3)):
                inp = {64: 64, 128: 64, 256: 128, 512: 256}[depth]
                mods.append(IRSE(inp, depth, 2))
                mods += [IRSE(depth, depth, 1) for _ in range(units - 1)]
            self.body = nn.Sequential(*mods)
            self.output_layer = nn.Sequential(
                nn.BatchNorm2d(512), nn.Dropout(0.0), nn.Flatten(),
                nn.Linear(512 * 7 * 7, 512), nn.BatchNorm1d(512),
            )

        def forward(self, x):
            y = self.output_layer(self.body(self.input_layer(x)))
            return y / y.norm(dim=1, keepdim=True)

    torch.manual_seed(3)
    tm = TorchArc().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    path = tmp_path / "arc.pth"
    torch.save(tm.state_dict(), path)

    model = af.make_model({"center_crop": None})
    params = af.convert_torch_weights(model, str(path))

    x = torch.rand(2, 3, 112, 112) * 2 - 1
    with torch.no_grad():
        want = tm(x).numpy()
    got = np.asarray(model.module.apply(params, jnp.asarray(to_nhwc(x)))[-1])
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)
