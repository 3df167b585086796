"""Standing parity coverage at the reference's REAL channel widths.

The round-2 torch-parity tests ran channels [16,32]/ctx 24; the full dress
rehearsal (tools/full_scale_parity.py -> PARITY_FULLSCALE.json) proves 64x64
latents at reference config AND SD-1.5 scale. This CI test keeps the real
config (channels [160,320], 8 heads, t_emb 512, ctx 768, n_layers 2 — every
width the converter must get right) exercised on every run, at a small
spatial size so it stays minutes-cheap on CPU.
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.append("/root/reference")  # APPEND: never shadow repo-root modules

try:
    import stable_diffusion.models.utils  # noqa: F401
    from stable_diffusion.models.unet import UNetModel as RefUNet

    REFERENCE_OK = True
except Exception:
    REFERENCE_OK = False

pytestmark = pytest.mark.skipif(not REFERENCE_OK, reason="reference not importable")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig  # noqa: E402
from stable_diffusion_pytorch_tpu.utils.compat import CompatConfig  # noqa: E402
from stable_diffusion_pytorch_tpu.utils.torch_port import (  # noqa: E402
    convert_reference_unet,
)

# the reference's ACTUAL defaults (/root/reference/stable_diffusion/models/
# unet.py:30-57), spatial size reduced for CI
REAL_CFG = dict(
    num_res_blocks=2,
    n_heads=8,
    attention_resolutions=[0, 1],
    channels_list=[160, 320],
    time_emb_dim=512,
    dropout=0.1,  # inert at inference on both sides
    n_layers=2,
    context_dim=768,
)


def test_unet_parity_at_real_reference_config():
    torch.manual_seed(0)
    ref = RefUNet(4, 4, SimpleNamespace(**REAL_CFG)).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    unet_cfg = UnetConfig(**REAL_CFG)
    compat = CompatConfig(
        flipped_time_embedding=True, bottleneck_default_groups=True
    )
    ours = UNetModel.from_config(4, 4, unet_cfg, compat=compat)
    params = convert_reference_unet(sd, unet_cfg, 4)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    t = np.array([847], np.int64)
    ctx = rng.standard_normal((1, 77, 768)).astype(np.float32)

    with torch.no_grad():
        theirs = np.transpose(
            ref(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()),
                torch.from_numpy(t),
                torch.from_numpy(ctx),
            ).numpy(),
            (0, 2, 3, 1),
        )
    out = ours.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(out), theirs, rtol=5e-4, atol=5e-4)
