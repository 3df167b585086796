"""stable_diffusion_pytorch_tpu — a TPU-native Stable Diffusion framework.

A from-scratch JAX/XLA/Flax/Pallas re-design of the capabilities of the PyTorch
reference ``lwb2099/stable_diffusion_pytorch``:

- CLIP text encoder (Flax, HF-weight loadable, offline fallback)
- conditional UNet (ResNet blocks + timestep embedding + self/cross attention)
- KL-regularized VAE (encoder / decoder / quant convs)
- DDPM + DDIM noise schedules (linear / cosine / cubic betas)
- classifier-free-guidance sampling as a jit-compiled ``lax.scan``
- data-parallel trainers over a ``jax.sharding.Mesh`` with XLA collectives
- Orbax checkpointing with ``checkpoint-{step}`` / ``latest`` semantics
- Pallas flash-attention and fused GroupNorm kernels on the hot path

Layout:
    models/    Flax model definitions + pure-function diffusion schedules
    ops/       Pallas TPU kernels and their XLA fallbacks
    parallel/  device mesh / sharding / distributed train-step utilities
    utils/     config system, data pipeline, checkpointing, image IO
    trainers/  the unified trainer core and its UNet / VAE specializations
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level re-exports (keeps `import stable_diffusion_pytorch_tpu`
    lightweight)."""
    lazy = {
        "load_config": ("stable_diffusion_pytorch_tpu.config", "load_config"),
        "build_models": ("stable_diffusion_pytorch_tpu.models.build", "build_models"),
        "LatentDiffusion": (
            "stable_diffusion_pytorch_tpu.models.latent_diffusion",
            "LatentDiffusion",
        ),
        "UNetModel": ("stable_diffusion_pytorch_tpu.models.unet", "UNetModel"),
        "AutoEncoderKL": (
            "stable_diffusion_pytorch_tpu.models.autoencoder",
            "AutoEncoderKL",
        ),
        "CLIPModel": ("stable_diffusion_pytorch_tpu.models.clip", "CLIPModel"),
        "make_schedule": ("stable_diffusion_pytorch_tpu.models.schedule", "make_schedule"),
        "sample": ("stable_diffusion_pytorch_tpu.pipeline", "sample"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
