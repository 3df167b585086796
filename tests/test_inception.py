"""Flax InceptionV3 pool3 tower: cross-framework parity + converter tests.

torchvision is not installed in this environment, so the torch side is a
test-local replica of torchvision's ``inception_v3`` with IDENTICAL module
naming — its ``state_dict()`` keys match torchvision's exactly
(``Conv2d_1a_3x3.conv.weight``, ``Mixed_5b.branch1x1.bn.running_mean``, ...),
so converter correctness proven here transfers to real staged torchvision
weights verbatim.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from stable_diffusion_pytorch_tpu.models.inception import (  # noqa: E402
    InceptionV3Pool3,
    convert_torchvision_inception,
    load_inception_params,
)


# ----------------------- torchvision-naming replica ----------------------- #


class BasicConv2d(tnn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class InceptionA(tnn.Module):
    def __init__(self, i, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(i, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(i, pool_features, kernel_size=1)

    def forward(self, x):
        p = F.avg_pool2d(x, 3, stride=1, padding=1)
        return torch.cat(
            [
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(p),
            ],
            1,
        )


class InceptionB(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = BasicConv2d(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat(
            [
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2),
            ],
            1,
        )


class InceptionC(tnn.Module):
    def __init__(self, i, channels_7x7):
        super().__init__()
        c7 = channels_7x7
        self.branch1x1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        p = F.avg_pool2d(x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b7, bd, self.branch_pool(p)], 1)


class InceptionD(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionE(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch1x1 = BasicConv2d(i, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(i, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        p = F.avg_pool2d(x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(p)], 1)


class TorchInceptionPool3(tnn.Module):
    """inception_v3 through pool3 (fc dropped), torchvision layer naming.

    ``transform_input`` replicates torchvision's ``_transform_input`` — the
    builder forces it True whenever pretrained weights are passed, so the
    real torch extractor (utils/fid.py:InceptionFeatureExtractor) runs with
    it on.
    """

    def __init__(self, transform_input=False):
        super().__init__()
        self.transform_input = transform_input
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048)

    def forward(self, x):
        if self.transform_input:
            x_ch0 = torch.unsqueeze(x[:, 0], 1) * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            x_ch1 = torch.unsqueeze(x[:, 1], 1) * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            x_ch2 = torch.unsqueeze(x[:, 2], 1) * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = torch.cat((x_ch0, x_ch1, x_ch2), 1)
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        return torch.flatten(F.adaptive_avg_pool2d(x, (1, 1)), 1)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchInceptionPool3()
    with torch.no_grad():
        for m in model.modules():
            # variance-preserving init: torch's default conv init decays the
            # signal to a constant over 90+ layers, which would make feature
            # parity trivially true; kaiming-normal keeps features
            # input-dependent so the parity test has teeth
            if isinstance(m, tnn.Conv2d):
                tnn.init.kaiming_normal_(m.weight, nonlinearity="relu")
            # randomize BN running stats so the fold is actually exercised
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


def test_random_weight_features_are_input_dependent(torch_model):
    """Guard for the fixture itself: features must vary across images (a
    collapsed net would make the parity assertions vacuous)."""
    params = convert_torchvision_inception(torch_model.state_dict())
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (4, 299, 299, 3)).astype(np.float32)
    f = np.asarray(InceptionV3Pool3().apply(params, jnp.asarray(x)))
    assert f.std(axis=0).mean() > 1e-3 * abs(f).mean()


def test_converted_params_match_flax_structure(torch_model):
    import chex

    params = convert_torchvision_inception(torch_model.state_dict())
    ref = jax.eval_shape(
        lambda: InceptionV3Pool3().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
        )
    )
    chex.assert_trees_all_equal_shapes(params, ref)


def test_pool3_features_match_torch(torch_model):
    """Full-tower cross-framework parity on random weights: the converter +
    NHWC tower reproduce the torch pool3 features."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 299, 299, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    params = convert_torchvision_inception(torch_model.state_dict())
    ours = np.asarray(InceptionV3Pool3().apply(params, jnp.asarray(x)))
    assert ours.shape == ref.shape == (2, 2048)
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(ours / scale, ref / scale, rtol=2e-3, atol=2e-3)


def test_flax_extractor_and_fid_pipeline(torch_model, tmp_path):
    """FlaxInceptionFeatureExtractor loads a staged .pth, and fid_between on
    identical vs shifted image sets behaves (0 for identical, >0 for shifted)."""
    from stable_diffusion_pytorch_tpu.utils import fid as fid_lib

    root = tmp_path / "pretrained" / "inception"
    root.mkdir(parents=True)
    torch.save(torch_model.state_dict(), root / "inception_v3.pth")

    ex = fid_lib.FlaxInceptionFeatureExtractor(model_dir=str(tmp_path / "pretrained"))
    rng = np.random.default_rng(1)
    imgs_a = [rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32) for _ in range(8)]
    imgs_b = [np.clip(a + 0.5, -1, 1) for a in imgs_a]
    same = fid_lib.fid_between(ex, imgs_a, imgs_a, batch_size=4)
    diff = fid_lib.fid_between(ex, imgs_a, imgs_b, batch_size=4)
    # at N=8, D=2048 the rank-deficient covariance + sqrtm eps put the
    # identical-set floor at ~|0.05|, not exactly 0
    assert abs(same) < 0.5
    assert diff > abs(same) * 10


def test_load_inception_params_missing_dir(tmp_path):
    assert load_inception_params(str(tmp_path)) is None
    with pytest.raises(FileNotFoundError):
        from stable_diffusion_pytorch_tpu.utils.fid import (
            FlaxInceptionFeatureExtractor,
        )

        FlaxInceptionFeatureExtractor(model_dir=str(tmp_path))


def test_convert_tool_npz_roundtrip(torch_model, tmp_path, monkeypatch):
    """tools/convert_inception.py writes an .npz that load_inception_params
    reconstructs exactly."""
    import importlib

    pth = tmp_path / "inception_v3.pth"
    torch.save(torch_model.state_dict(), pth)
    npz = tmp_path / "pre" / "inception" / "inception_v3.npz"
    monkeypatch.setattr(
        "sys.argv", ["convert_inception.py", str(pth), str(npz)]
    )
    tool = importlib.import_module("tools.convert_inception")
    tool.main()

    loaded = load_inception_params(str(tmp_path / "pre"))
    direct = convert_torchvision_inception(torch_model.state_dict())
    la = jax.tree_util.tree_leaves(loaded)
    lb = jax.tree_util.tree_leaves(direct)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_extractor_resize_matches_torch_interpolate(torch_model, tmp_path):
    """>299px inputs exercise DOWNSCALING, where jax.image.resize's default
    antialias=True silently diverges from torch F.interpolate (canonical FID
    protocol). The extractor must pass antialias=False."""
    from stable_diffusion_pytorch_tpu.utils import fid as fid_lib

    root = tmp_path / "pretrained" / "inception"
    root.mkdir(parents=True)
    torch.save(torch_model.state_dict(), root / "inception_v3.pth")
    ex = fid_lib.FlaxInceptionFeatureExtractor(model_dir=str(tmp_path / "pretrained"))

    rng = np.random.default_rng(5)
    imgs = rng.uniform(-1, 1, (2, 512, 512, 3)).astype(np.float32)
    ours = ex(imgs)

    # the real torch extractor runs with transform_input=True (forced by the
    # torchvision builder for pretrained weights); the Flax extractor matches
    torch_model.transform_input = True
    try:
        with torch.no_grad():
            t = torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)))
            t = torch.nn.functional.interpolate(
                t, size=(299, 299), mode="bilinear", align_corners=False
            )
            ref = torch_model(t).numpy()
    finally:
        torch_model.transform_input = False
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(ours / scale, ref / scale, rtol=3e-3, atol=3e-3)


def test_extractor_applies_transform_input(torch_model, tmp_path):
    """The Flax extractor must reproduce torchvision's transform_input
    re-normalization (forced True for pretrained weights): parity against the
    torch replica WITH the transform, and a deliberate mismatch against the
    replica WITHOUT it (guards against the transform being dropped)."""
    from stable_diffusion_pytorch_tpu.utils import fid as fid_lib

    root = tmp_path / "pretrained" / "inception"
    root.mkdir(parents=True)
    torch.save(torch_model.state_dict(), root / "inception_v3.pth")
    ex = fid_lib.FlaxInceptionFeatureExtractor(model_dir=str(tmp_path / "pretrained"))

    rng = np.random.default_rng(11)
    imgs = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    ours = ex(imgs)

    t = torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)))
    torch_model.transform_input = True
    try:
        with torch.no_grad():
            ref_with = torch_model(t).numpy()
    finally:
        torch_model.transform_input = False
    with torch.no_grad():
        ref_without = torch_model(t).numpy()

    scale = max(float(np.abs(ref_with).max()), 1.0)
    np.testing.assert_allclose(ours / scale, ref_with / scale, rtol=3e-3, atol=3e-3)
    assert np.abs(ref_with - ref_without).max() / scale > 1e-2
