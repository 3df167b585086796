"""EMA shadow-parameter tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stable_diffusion_pytorch_tpu.trainers.steps import (
    TrainState,
    make_vae_train_step,
)


def test_ema_tracks_params():
    from stable_diffusion_pytorch_tpu.models.autoencoder import (
        AutoEncoderKL,
        AutoencoderConfig,
    )

    key = jax.random.PRNGKey(0)
    vae = AutoEncoderKL.from_config(
        AutoencoderConfig(autoencoder_channels_list=[8, 16], groups=4)
    )
    img = jax.random.normal(key, (2, 16, 16, 3))
    params = vae.init(key, img)
    tx = optax.adam(1e-2)
    decay = 0.5
    train_step, _ = make_vae_train_step(vae, tx, kl_weight=1e-4, ema_decay=decay)
    state = TrainState.create(params, tx, with_ema=True)

    # at init, ema == params
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    e0 = jax.tree_util.tree_leaves(state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(e0))

    jit_step = jax.jit(train_step)
    state1, _ = jit_step(state, {"pixel_values": img}, key)
    # ema_1 = decay * params_0 + (1-decay) * params_1 (since ema_0 == params_0)
    leaves_p0 = jax.tree_util.tree_leaves(params)
    leaves_p1 = jax.tree_util.tree_leaves(state1.params)
    leaves_e1 = jax.tree_util.tree_leaves(state1.ema_params)
    for a, b, e in zip(leaves_p0, leaves_p1, leaves_e1):
        np.testing.assert_allclose(
            np.asarray(e),
            decay * np.asarray(a) + (1 - decay) * np.asarray(b),
            rtol=1e-5,
            atol=1e-6,
        )


def test_no_ema_by_default():
    tx = optax.adam(1e-2)
    state = TrainState.create({"w": jnp.ones(3)}, tx)
    assert state.ema_params is None


def test_ema_gated_on_accumulation_sync_step():
    """With optax.MultiSteps(accum=K) the EMA must apply its decay exactly once
    per OPTIMIZER update, not once per micro-step (decay^K compounding bug)."""
    from stable_diffusion_pytorch_tpu.models.autoencoder import (
        AutoEncoderKL,
        AutoencoderConfig,
    )

    key = jax.random.PRNGKey(0)
    vae = AutoEncoderKL.from_config(
        AutoencoderConfig(autoencoder_channels_list=[8, 16], groups=4)
    )
    img = jax.random.normal(key, (2, 16, 16, 3))
    params = vae.init(key, img)
    accum, decay = 4, 0.5
    tx = optax.MultiSteps(optax.adam(1e-2), every_k_schedule=accum)
    train_step, _ = make_vae_train_step(
        vae, tx, kl_weight=1e-4, ema_decay=decay,
        gradient_accumulation_steps=accum,
    )
    state = TrainState.create(params, tx, with_ema=True)
    jit_step = jax.jit(train_step)

    p0 = jax.tree_util.tree_leaves(params)
    # micro-steps 1..K-1: params unchanged -> ema must stay exactly at p0
    for i in range(accum - 1):
        state, _ = jit_step(state, {"pixel_values": img}, jax.random.fold_in(key, i))
        for p, e in zip(p0, jax.tree_util.tree_leaves(state.ema_params)):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
    # sync micro-step K: one real decay application
    state, _ = jit_step(state, {"pixel_values": img}, jax.random.fold_in(key, 99))
    p1 = jax.tree_util.tree_leaves(state.params)
    for a, b, e in zip(p0, p1, jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_allclose(
            np.asarray(e),
            decay * np.asarray(a) + (1 - decay) * np.asarray(b),
            rtol=1e-5,
            atol=1e-6,
        )
