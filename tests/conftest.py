"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

This is the JAX-native replacement for fake-backend distributed testing
(SURVEY.md §4): every test can build a real ``jax.sharding.Mesh`` over 8 host
devices and exercise pjit/psum/shard_map without TPU hardware.
"""

import os

# hard override: the shell environment pins JAX_PLATFORMS=axon (the tunneled
# TPU); tests must run on the virtual multi-device CPU backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup, freezing
# jax_platforms to "axon" before this file runs — override via config, which
# takes effect as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
