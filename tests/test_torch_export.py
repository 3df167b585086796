"""Flax -> reference-torch export: the inverse of utils/torch_port.py's import
direction. Proves TPU-trained checkpoints load back into the PyTorch reference
with strict=True and compute the same function (bidirectional interop)."""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.append("/root/reference")

try:
    import stable_diffusion.models.utils  # noqa: F401
    from stable_diffusion.models.autoencoder import AutoEncoderKL as RefVAE
    from stable_diffusion.models.unet import UNetModel as RefUNet

    REFERENCE_OK = True
except Exception:
    REFERENCE_OK = False

pytestmark = pytest.mark.skipif(not REFERENCE_OK, reason="reference not importable")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stable_diffusion_pytorch_tpu.models.autoencoder import (  # noqa: E402
    AutoencoderConfig,
    AutoEncoderKL,
)
from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig  # noqa: E402
from stable_diffusion_pytorch_tpu.utils.compat import CompatConfig  # noqa: E402
from stable_diffusion_pytorch_tpu.utils.torch_port import (  # noqa: E402
    convert_reference_autoencoder,
    convert_reference_unet,
    export_reference_autoencoder,
    export_reference_unet,
)

UNET_KW = dict(
    num_res_blocks=2,
    n_heads=4,
    attention_resolutions=[1, 2],
    channels_list=[16, 32],
    time_emb_dim=32,
    dropout=0.0,
    n_layers=1,
    context_dim=24,
)
COMPAT = CompatConfig(flipped_time_embedding=True, bottleneck_default_groups=True)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_unet_export_strict_load_and_parity():
    """Export OUR random-init UNet -> the torch reference loads it strict=True
    and computes the same function as our Flax model."""
    unet_cfg = UnetConfig(**UNET_KW)
    ours = UNetModel.from_config(4, 4, unet_cfg, compat=COMPAT)
    key = jax.random.PRNGKey(0)
    params = ours.init(
        key, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 7, 24)),
    )

    sd = export_reference_unet(params, unet_cfg)
    torch.manual_seed(0)
    ref = RefUNet(4, 4, SimpleNamespace(**UNET_KW)).eval()
    missing = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing.missing_keys and not missing.unexpected_keys

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    t = np.array([3, 47], np.int64)
    ctx = rng.standard_normal((2, 7, 24)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
        ).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 1))
    out = ours.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(out), theirs, rtol=5e-4, atol=5e-4)


def test_unet_roundtrip_identity():
    """export -> convert recovers the exact parameter tree."""
    unet_cfg = UnetConfig(**UNET_KW)
    ours = UNetModel.from_config(4, 4, unet_cfg)
    params = ours.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 7, 24)),
    )
    sd = export_reference_unet(params, unet_cfg)
    back = convert_reference_unet(sd, unet_cfg, 4)
    _tree_equal(params, back)


def test_vae_export_strict_load_and_roundtrip():
    kw = dict(
        in_channels=3,
        latent_channels=4,
        out_channels=3,
        autoencoder_channels_list=[8, 16],
        autoencoder_num_res_blocks=2,
        groups=4,
        kl_weight=1.0,
    )
    vae_cfg = AutoencoderConfig(**kw)
    ours = AutoEncoderKL.from_config(vae_cfg, compat=COMPAT)
    params = ours.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 3)))

    sd = export_reference_autoencoder(params, vae_cfg)
    torch.manual_seed(1)
    ref = RefVAE(SimpleNamespace(**kw)).eval()
    res = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in sd.items()},
        strict=True,
    )
    assert not res.missing_keys and not res.unexpected_keys

    back = convert_reference_autoencoder(sd, vae_cfg)
    _tree_equal(params, back)

    # decode parity through the loaded reference
    rng = np.random.default_rng(2)
    lat = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    with torch.no_grad():
        theirs = ref.decode(
            torch.from_numpy(np.transpose(lat, (0, 3, 1, 2)).copy())
        ).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 1))
    out = ours.apply(params, jnp.asarray(lat), method=ours.decode)
    np.testing.assert_allclose(np.asarray(out), theirs, rtol=5e-4, atol=5e-4)


def test_export_cli(tmp_path, monkeypatch):
    """tools/export_torch.py end-to-end from a real trainer checkpoint."""
    from stable_diffusion_pytorch_tpu.utils.checkpoint import save_checkpoint

    unet_cfg = UnetConfig(**UNET_KW)
    ours = UNetModel.from_config(4, 4, unet_cfg)
    params = ours.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 7, 24)),
    )
    save_checkpoint(str(tmp_path / "ckpt" / "checkpoint-5"), {"params": params})

    sys.path.insert(0, "tools")
    import export_torch

    out = str(tmp_path / "unet.pt")
    export_torch.main([
        "--checkpoint", str(tmp_path / "ckpt"),
        "--export-model", "unet",
        "--output", out,
        "--num-res-blocks", "2",
        "--n-heads", "4",
        "--attention-resolutions", "1,2",
        "--channels-list", "16,32",
        "--time-emb-dim", "32",
        "--dropout", "0.0",
        "--n-layers", "1",
        "--context-dim", "24",
    ])
    sd = torch.load(out, map_location="cpu", weights_only=True)
    back = convert_reference_unet(
        {k: v.numpy() for k, v in sd.items()}, unet_cfg, 4
    )
    _tree_equal(params, back)
