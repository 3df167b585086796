"""End-to-end sampling-loop parity vs the reference LatentDiffusion.sample.

Runs the COMPLETE reverse loop (CFG doubling + quirky combine + ascending
iteration + leading timesteps + DDPM posterior with scale_factor=0 so no random
draws) on the reference torch stack and on our compat-mode scan with SHARED
converted UNet weights, and requires the final latents to match.
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.append("/root/reference")  # APPEND: must not shadow repo-root modules (train_unet, scripts)

try:
    import stable_diffusion.models.utils  # noqa: F401
    from stable_diffusion.models.latent_diffusion import LatentDiffusion as RefLD
    from stable_diffusion.models.scheduler import DDPMScheduler as RefSched
    from stable_diffusion.models.unet import UNetModel as RefUNet

    REFERENCE_OK = True
except Exception:
    REFERENCE_OK = False

pytestmark = pytest.mark.skipif(not REFERENCE_OK, reason="reference not importable")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stable_diffusion_pytorch_tpu.models.latent_diffusion import (  # noqa: E402
    make_sample_fn,
)
from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule  # noqa: E402
from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig  # noqa: E402
from stable_diffusion_pytorch_tpu.utils.compat import CompatConfig  # noqa: E402
from stable_diffusion_pytorch_tpu.utils.torch_port import convert_reference_unet  # noqa: E402

CFG_KWARGS = dict(
    num_res_blocks=1,
    n_heads=4,
    attention_resolutions=[1],
    channels_list=[16, 32],
    time_emb_dim=32,
    dropout=0.0,
    n_layers=1,
    context_dim=24,
)


class FakeTextEncoder:
    """Stands in for the reference CLIPModel: returns a fixed uncond embedding
    (the reference re-encodes "" inside every step, latent_diffusion.py:55-60)."""

    def __init__(self, uncond_emb: np.ndarray):
        self.uncond = torch.from_numpy(uncond_emb)

    def tokenize(self, prompts, **kw):
        return SimpleNamespace(
            input_ids=torch.zeros((len(prompts), 7), dtype=torch.long)
        )

    def encode_text(self, ids):
        return [self.uncond.expand(ids.shape[0], -1, -1)]


def test_full_sampling_loop_parity():
    torch.manual_seed(0)
    ref_unet = RefUNet(4, 4, SimpleNamespace(**CFG_KWARGS)).eval()
    sd = {k: v.numpy() for k, v in ref_unet.state_dict().items()}

    rng = np.random.default_rng(0)
    uncond = rng.standard_normal((1, 7, 24)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, 24)).astype(np.float32)
    x_T = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)

    ddpm_cfg = SimpleNamespace(
        noise_schedule="linear", noise_steps=50, beta_start=1e-4, beta_end=0.02
    )
    ref_model = RefLD(
        ref_unet, None, FakeTextEncoder(uncond), RefSched(ddpm_cfg)
    ).eval()
    with torch.no_grad():
        ref_x0 = ref_model.sample(
            noised_sample=torch.from_numpy(np.transpose(x_T, (0, 3, 1, 2)).copy()),
            context_emb=torch.from_numpy(ctx),
            guidance_scale=7.5,
            scale_factor=0.0,   # kills the stochastic term -> deterministic
            time_steps=5,       # reference quirk: leading steps 4..0, ascending
        ).numpy()
    ref_x0 = np.transpose(ref_x0, (0, 2, 3, 1))

    unet_cfg = UnetConfig(**CFG_KWARGS)
    compat = CompatConfig(reference_compat=True).resolved()
    ours = UNetModel.from_config(4, 4, unet_cfg, compat=compat)
    params = convert_reference_unet(sd, unet_cfg, 4)
    schedule = make_schedule(DDPMConfig(noise_steps=50))
    sample = jax.jit(
        make_sample_fn(
            ours,
            schedule,
            num_steps=5,
            sampler="ddpm",
            guidance_scale=7.5,
            scale_factor=0.0,
            reference_cfg_formula=True,
            ascending_loop=True,
            leading_timesteps=True,
        )
    )
    uncond_b = jnp.broadcast_to(jnp.asarray(uncond), (2, 7, 24))
    x0 = sample(
        params, jnp.asarray(x_T), jnp.asarray(ctx), uncond_b, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(np.asarray(x0), ref_x0, rtol=2e-3, atol=2e-3)
