"""Reference-compat switches.

The PyTorch reference contains several numerics quirks (catalogued in SURVEY.md §2.4).
This framework implements the *correct* math by default and keeps each quirk behind an
explicit flag so per-step numeric parity with the reference can be reproduced when
required. ``--reference-compat`` flips all of them at once.

Quirks covered (citations into /root/reference):
- ``cfg_formula``: LatentDiffusion.pred_noise chunks the doubled batch with the names
  swapped and combines ``cond + g*(cond - uncond)`` where the tensors are actually
  ``[uncond, cond]`` (latent_diffusion.py:61-65). Net effect: ``uncond + g*(uncond - cond)``.
  Correct default: ``uncond + g*(cond - uncond)``.
- ``ascending_sample_loop``: LatentDiffusion.sample iterates timesteps 0 -> T-1
  (latent_diffusion.py:103-107) instead of T-1 -> 0.
- ``uniform_init_noise``: sampling starts from U[0,1) noise via ``torch.rand_like``
  (scripts/txt2img.py:33, train_unet.py:546) instead of N(0,1).
- ``flipped_time_embedding``: sinusoidal frequencies use a positive exponent
  ``exp(+log(10000)/half * i)`` (modules/timestep_embedding.py:93-99); the standard
  transformer embedding uses ``exp(-...)``.
- ``bottleneck_default_groups``: build_bottleneck's first ResBlock omits ``groups`` and
  silently normalizes with the ResBlock default of 2 groups (models/utils.py:112).
- ``kl_per_example0``: the VAE loss uses example 0's KL, not the batch mean
  (train_autoencoder.py:505, modules/distributions.py:15-19).
- ``train_with_cfg``: the UNet trainer regresses the CFG-combined prediction (doubled
  uncond+cond forward, guidance 7.5) against the true noise (train_unet.py:526-529)
  instead of a single conditional forward.
"""

from dataclasses import dataclass, field

from stable_diffusion_pytorch_tpu.config import BaseConfig


@dataclass
class CompatConfig(BaseConfig):
    reference_compat: bool = field(
        default=False,
        metadata={"help": "Enable ALL reference-parity quirks at once."},
    )
    cfg_formula: bool = field(
        default=False,
        metadata={"help": "Use the reference's swapped CFG combine (uncond + g*(uncond-cond))."},
    )
    ascending_sample_loop: bool = field(
        default=False,
        metadata={"help": "Run the sampling loop t ascending (0..T-1) like the reference."},
    )
    uniform_init_noise: bool = field(
        default=False,
        metadata={"help": "Initialize sampling from U[0,1) noise instead of N(0,1)."},
    )
    flipped_time_embedding: bool = field(
        default=False,
        metadata={"help": "Use the reference's sign-flipped sinusoid frequencies."},
    )
    bottleneck_default_groups: bool = field(
        default=False,
        metadata={"help": "First bottleneck ResBlock uses 2 GroupNorm groups (reference bug)."},
    )
    kl_per_example0: bool = field(
        default=False,
        metadata={"help": "VAE loss uses example 0's KL instead of the batch mean."},
    )
    train_with_cfg: bool = field(
        default=False,
        metadata={"help": "Train the UNet through the CFG-combined doubled forward like the reference."},
    )

    def resolved(self) -> "CompatConfig":
        """Return a copy with reference_compat fanning out to every individual flag."""
        if not self.reference_compat:
            return self
        return CompatConfig(
            reference_compat=True,
            cfg_formula=True,
            ascending_sample_loop=True,
            uniform_init_noise=True,
            flipped_time_embedding=True,
            bottleneck_default_groups=True,
            kl_per_example0=True,
            train_with_cfg=True,
        )
