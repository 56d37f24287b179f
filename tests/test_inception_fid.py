"""Parity of the optional InceptionV3 FID feature path vs a torch oracle.

The reference's FID intends InceptionV3 features but ships a broken
import (Train/basicsr/metrics/fid.py:7 -> absent archs/inception.py);
no pretrained weights exist here (zero egress), so the oracle is a
freshly-built torch InceptionV3 (the standard torchvision/pytorch-fid
topology, FID-variant pooling) with seeded random weights and running
stats — exactly the converter's input format.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class BasicConv2d(nn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = nn.Conv2d(i, o, bias=False, **kw)
        self.bn = nn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x, cip):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=cip)


class InceptionA(nn.Module):
    def __init__(self, i, pool, cip):
        super().__init__()
        self.cip = cip
        self.branch1x1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(i, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(i, pool, kernel_size=1)

    def forward(self, x):
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch1x1(x), b5, bd,
                          self.branch_pool(_avg(x, self.cip))], 1)


class InceptionB(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = BasicConv2d(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), bd,
                          F.max_pool2d(x, 3, stride=2)], 1)


class InceptionC(nn.Module):
    def __init__(self, i, c7, cip):
        super().__init__()
        self.cip = cip
        self.branch1x1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg(x, self.cip))], 1)


class InceptionD(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionE(nn.Module):
    def __init__(self, i, pool_kind, cip):
        super().__init__()
        self.pool_kind, self.cip = pool_kind, cip
        self.branch1x1 = BasicConv2d(i, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(i, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        pool = (F.max_pool2d(x, 3, stride=1, padding=1)
                if self.pool_kind == "max" else _avg(x, self.cip))
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(pool)], 1)


class TorchInceptionV3(nn.Module):
    """pytorch-fid / torchvision InceptionV3, pool3 head only."""

    def __init__(self, fid_variant=True):
        super().__init__()
        cip = not fid_variant
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32, cip)
        self.Mixed_5c = InceptionA(256, 64, cip)
        self.Mixed_5d = InceptionA(288, 64, cip)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128, cip)
        self.Mixed_6c = InceptionC(768, 160, cip)
        self.Mixed_6d = InceptionC(768, 160, cip)
        self.Mixed_6e = InceptionC(768, 192, cip)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280, "avg", cip)
        self.Mixed_7c = InceptionE(
            2048, "max" if fid_variant else "avg", cip)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


def _seeded_oracle(fid_variant=True, seed=0):
    g = torch.Generator().manual_seed(seed)
    model = TorchInceptionV3(fid_variant=fid_variant).eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(1 + 0.1 * torch.randn(m.weight.shape,
                                                     generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(
                    0.1 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(
                    (1 + 0.3 * torch.rand(m.running_var.shape,
                                          generator=g)))
    return model


@pytest.mark.parametrize("fid_variant", [True, False])
def test_inception_pool3_matches_torch(fid_variant):
    from rethink_acoustic_image_enhancement_tpu.metrics.inception import (
        convert_inception_state_dict,
        inception_pool3,
    )

    model = _seeded_oracle(fid_variant=fid_variant)
    x = np.random.default_rng(3).random((2, 299, 299, 3), np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(
            x.transpose(0, 3, 1, 2)) * 2 - 1).numpy()
    params = convert_inception_state_dict(model.state_dict())
    got = np.asarray(inception_pool3(params, x, resize=False,
                                     fid_variant=fid_variant))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_inception_resize_matches_torch_interpolate():
    """pytorch-fid resizes [0,1] inputs to 299 with bilinear
    align_corners=False; the JAX path must sample identically."""
    from rethink_acoustic_image_enhancement_tpu.metrics.inception import (
        convert_inception_state_dict,
        inception_pool3,
    )

    model = _seeded_oracle()
    x = np.random.default_rng(5).random((1, 64, 80, 3), np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t = F.interpolate(t, size=(299, 299), mode="bilinear",
                          align_corners=False)
        want = model(t * 2 - 1).numpy()
    params = convert_inception_state_dict(model.state_dict())
    got = np.asarray(inception_pool3(params, x, resize=True))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_make_inception_feature_fn_and_fid(tmp_path):
    """End-to-end: save a .pth, load via the converter, run FID between
    two folders' worth of arrays in inception space."""
    from rethink_acoustic_image_enhancement_tpu.metrics.fid import (
        extract_features,
        fid_between_feature_sets,
    )
    from rethink_acoustic_image_enhancement_tpu.metrics.inception import (
        make_inception_feature_fn,
    )

    path = str(tmp_path / "inception.pth")
    torch.save(_seeded_oracle().state_dict(), path)
    fn = make_inception_feature_fn(path, batch=4)
    assert fn.feature_space.startswith("inception-pool3(fid:")

    rng = np.random.default_rng(7)
    a = rng.random((6, 64, 64, 3), np.float32)
    b = np.clip(a + 0.2 * rng.random((6, 64, 64, 3), np.float32), 0, 1)
    fa = extract_features([a], fn)
    assert fa.shape == (6, 2048)
    d_self = fid_between_feature_sets(fa, fa)
    d_ab = fid_between_feature_sets(fa, extract_features([b], fn))
    assert abs(d_self) < 1e-6
    assert d_ab > d_self
