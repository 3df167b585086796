"""Trainer tests: optimizer schedules, resume math, checkpointing, e2e loops."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.trainers.args import OptimConfig
from stable_diffusion_pytorch_tpu.trainers.optim import build_lr_schedule, build_optimizer
from stable_diffusion_pytorch_tpu.trainers.steps import TrainState
from stable_diffusion_pytorch_tpu.utils.checkpoint import (
    CheckpointManager,
    find_latest_checkpoint,
    resume_train_state_math,
)


def test_lr_schedule_linear_warmup_decay():
    sched = build_lr_schedule("linear", 1e-3, warmup_steps=10, total_steps=110)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(sched(60)), 5e-4, rtol=1e-3)
    np.testing.assert_allclose(float(sched(110)), 0.0, atol=1e-9)


def test_lr_schedule_kinds():
    for kind in ["linear", "cosine", "constant", "constant_with_warmup", "polynomial"]:
        sched = build_lr_schedule(kind, 1e-3, 5, 50)
        assert np.isfinite(float(sched(25)))
    with pytest.raises(ValueError):
        build_lr_schedule("bogus", 1e-3, 5, 50)


def test_resume_train_state_math_matches_reference_formulas():
    """train_unet.py:284-312 arithmetic."""
    # 20 batches/epoch, accum 4 -> 5 update steps/epoch; resume at step 12
    r = resume_train_state_math(
        num_batches_per_epoch=20,
        gradient_accumulation_steps=4,
        max_train_steps=50,
        max_train_epochs=100,
        resumed_global_step=12,
    )
    assert r["num_update_steps_per_epoch"] == 5
    assert r["max_train_epochs"] == 10  # ceil(50/5)
    assert r["start_epoch"] == 2  # 12 // 5
    assert r["resume_step"] == 12 % 5 * 4  # == 8 micro-batches
    # max_train_steps None -> epochs * steps_per_epoch
    r2 = resume_train_state_math(20, 4, None, 3, 0)
    assert r2["max_train_steps"] == 15


def test_checkpoint_manager_roundtrip(tmp_path):
    class CkptCfg:
        ckpt_dir = str(tmp_path / "ckpts")
        keep_last_only = True
        resume_from_checkpoint = "latest"

    import optax

    tx = optax.adam(1e-3)
    params = {"w": jnp.arange(4.0), "b": jnp.ones((2, 2))}
    state = TrainState.create(params, tx)

    mgr = CheckpointManager(CkptCfg())
    assert mgr.resolve_resume_path() is None  # empty dir -> new run

    p1 = mgr.save(10, state)
    assert os.path.basename(p1) == "checkpoint-10"
    state2 = TrainState(
        step=state.step + 5,
        params=jax.tree_util.tree_map(lambda x: x * 2, state.params),
        opt_state=state.opt_state,
    )
    p2 = mgr.save(20, state2)
    assert not os.path.exists(p1)  # keep_last_only pruned
    assert find_latest_checkpoint(CkptCfg.ckpt_dir).endswith("checkpoint-20")

    mgr2 = CheckpointManager(CkptCfg())
    restored, step = mgr2.restore(state)
    assert step == 20
    np.testing.assert_allclose(np.asarray(restored.params["w"]), np.arange(4.0) * 2)
    assert int(restored.step) == 5


def test_unet_train_step_descends():
    """A few optimizer steps on a fixed batch must reduce the loss."""
    from stable_diffusion_pytorch_tpu.models.autoencoder import (
        AutoEncoderKL,
        AutoencoderConfig,
    )
    from stable_diffusion_pytorch_tpu.models.clip import CLIPTextTransformer
    from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule
    from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig
    from stable_diffusion_pytorch_tpu.trainers.steps import make_unet_train_step

    key = jax.random.PRNGKey(0)
    unet = UNetModel.from_config(
        4, 8, UnetConfig(channels_list=[16, 32], n_heads=4, time_emb_dim=32, n_layers=1)
    )
    vae = AutoEncoderKL.from_config(
        AutoencoderConfig(autoencoder_channels_list=[8, 16], groups=4)
    )
    clip = CLIPTextTransformer(d_model=768, n_layers=1, n_heads=4, intermediate=64)

    img = jax.random.normal(key, (2, 16, 16, 3))
    ids = jnp.zeros((2, 77), jnp.int32)
    unet_params = unet.init(
        key, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768))
    )
    vae_params = vae.init(key, img[:1])
    clip_params = clip.init(key, ids[:1])

    import optax

    tx = optax.adam(1e-3)
    sched = make_schedule(DDPMConfig(noise_steps=20))
    train_step, eval_step = make_unet_train_step(unet, clip, vae, sched, tx)
    jit_step = jax.jit(train_step)

    state = TrainState.create(unet_params, tx)
    batch = {"pixel_values": img, "input_ids": ids}
    uncond = jnp.full((77,), 49407, jnp.int32)
    losses = []
    for i in range(8):
        state, metrics = jit_step(state, clip_params, vae_params, batch, uncond, key)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert losses[-1] < losses[0], f"loss did not descend: {losses}"
    # eval step runs and is finite
    ev = eval_step(state.params, clip_params, vae_params, batch, uncond, key)
    assert np.isfinite(float(ev))


def test_unet_train_step_latent_cache_path():
    """Training from cached VAE latents (BASELINE.json config #5) skips the VAE."""
    from stable_diffusion_pytorch_tpu.models.clip import CLIPTextTransformer
    from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule
    from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig
    from stable_diffusion_pytorch_tpu.trainers.steps import make_unet_train_step
    import optax

    key = jax.random.PRNGKey(0)
    unet = UNetModel.from_config(
        4, 8, UnetConfig(channels_list=[16, 32], n_heads=4, time_emb_dim=32, n_layers=1)
    )
    clip = CLIPTextTransformer(d_model=768, n_layers=1, n_heads=4, intermediate=64)
    ids = jnp.zeros((2, 77), jnp.int32)
    unet_params = unet.init(
        key, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768))
    )
    clip_params = clip.init(key, ids[:1])
    tx = optax.adam(1e-3)
    sched = make_schedule(DDPMConfig(noise_steps=20))
    train_step, eval_step = make_unet_train_step(unet, clip, None, sched, tx)
    state = TrainState.create(unet_params, tx)
    batch = {"latents": jax.random.normal(key, (2, 8, 8, 4)), "input_ids": ids}
    state, metrics = jax.jit(train_step)(
        state, clip_params, None, batch, jnp.full((77,), 49407, jnp.int32), key
    )
    assert np.isfinite(float(metrics["loss"]))

    # moments path: the posterior sample is drawn INSIDE the step from the
    # per-step key — different keys must see different latent draws (the
    # round-1 host-side sampling drew the identical latent every epoch)
    mbatch = {
        "moments": jax.random.normal(key, (2, 8, 8, 8)),
        "input_ids": ids,
    }
    uncond = jnp.full((77,), 49407, jnp.int32)
    l_a = float(eval_step(state.params, clip_params, None, mbatch, uncond, key))
    l_a2 = float(eval_step(state.params, clip_params, None, mbatch, uncond, key))
    l_b = float(
        eval_step(
            state.params, clip_params, None, mbatch, uncond,
            jax.random.PRNGKey(123),
        )
    )
    assert np.isfinite(l_a) and l_a == l_a2, "same key must be deterministic"
    assert l_a != l_b, "different keys must draw different posterior samples"


def test_vae_train_step_descends():
    from stable_diffusion_pytorch_tpu.models.autoencoder import (
        AutoEncoderKL,
        AutoencoderConfig,
    )
    from stable_diffusion_pytorch_tpu.trainers.steps import make_vae_train_step
    import optax

    key = jax.random.PRNGKey(0)
    vae = AutoEncoderKL.from_config(
        AutoencoderConfig(autoencoder_channels_list=[8, 16], groups=4)
    )
    img = jax.random.normal(key, (2, 16, 16, 3)) * 0.5
    params = vae.init(key, img)
    tx = optax.adam(1e-3)
    train_step, eval_step = make_vae_train_step(vae, tx, kl_weight=1e-4)
    jit_step = jax.jit(train_step)
    state = TrainState.create(params, tx)
    batch = {"pixel_values": img}
    losses = []
    for i in range(8):
        state, metrics = jit_step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(float(eval_step(state.params, batch, key)))


def test_gradient_accumulation_multisteps():
    """MultiSteps: params only change every k micro-steps."""
    # constant schedule: the default linear warmup starts at lr=0, which would
    # make the first applied update a no-op and mask the accumulation behavior
    cfg = OptimConfig(learning_rate=1e-2, max_grad_norm=1.0, scheduler_type="constant")
    tx = build_optimizer(cfg, max_train_steps=100, gradient_accumulation_steps=2)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)

    def grad_of(p):
        return {"w": p["w"] * 0 + 1.0}

    import optax

    updates, state = tx.update(grad_of(params), state, params)
    p1 = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(params["w"]))  # no-op
    updates, state = tx.update(grad_of(p1), state, p1)
    p2 = optax.apply_updates(p1, updates)
    assert not np.allclose(np.asarray(p2["w"]), np.asarray(p1["w"]))  # applied


def test_non_main_process_gets_null_tracker(tmp_path, monkeypatch):
    """Multi-host gating: only process 0 opens the metrics stream / wandb; other
    hosts get a no-op sink (reference logs on the main rank only,
    train_unet.py:111-142). Injected via jax.process_index."""
    from stable_diffusion_pytorch_tpu.config import load_config
    from stable_diffusion_pytorch_tpu.models.autoencoder import (
        AutoEncoderKL,
        AutoencoderConfig,
    )
    from stable_diffusion_pytorch_tpu.models.bpe import CLIPBPETokenizer
    from stable_diffusion_pytorch_tpu.trainers.trainer import AutoencoderTrainer
    from stable_diffusion_pytorch_tpu.utils.data import (
        DatasetConfig,
        SyntheticTextImageDataset,
    )
    from stable_diffusion_pytorch_tpu.utils.tracking import NullTracker, Tracker

    _, cfg = load_config(
        ["--autoencoder-channels-list", "8,16", "--groups", "4",
         "--resolution", "16", "--train-batch-size", "1", "--eval-batch-size", "1",
         "--log-interval", "0", "--num-devices", "1",
         "--logging-dir", str(tmp_path / "logs")]
    )
    dcfg = DatasetConfig(dataset="synthetic", resolution=16)
    tok = CLIPBPETokenizer()
    ds = SyntheticTextImageDataset(dcfg, "train", tok, num_rows=2)
    vae = AutoEncoderKL.from_config(AutoencoderConfig(
        autoencoder_channels_list=[8, 16], groups=4))
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))

    def build(proc_idx):
        monkeypatch.setattr(jax, "process_index", lambda: proc_idx)
        return AutoencoderTrainer(vae, params, cfg, ds, None)

    main = build(0)
    assert isinstance(main.tracker, Tracker) and main.is_main_process
    worker = build(1)
    assert isinstance(worker.tracker, NullTracker) and not worker.is_main_process
    # the no-op sink accepts the full surface without touching disk
    worker.tracker.set_persistent(synthetic_fallback=True)
    worker.tracker.log({"train_loss": 1.0}, step=1)
    worker.tracker.log_images({"x": np.zeros((4, 4, 3), np.uint8)}, step=1)
    worker.tracker.finish()


def test_gns_grads_analytic():
    """Half-batch GNS estimator on an analytic linear-regression loss: with the
    two halves IDENTICAL, g1 == g2 so S == 0 and G^2 == |g|^2 exactly; the
    averaged grads equal the full-batch gradient."""
    import optax

    from stable_diffusion_pytorch_tpu.trainers.steps import _gns_grads

    w = jnp.asarray([1.0, -2.0])
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    batch = {"x": jnp.concatenate([x, x], axis=0)}  # two identical halves

    def loss(params, b, key):
        pred = b["x"] @ params
        return jnp.mean(pred**2)

    def grad_fn(b, k):
        return jax.value_and_grad(loss)(w, b, k)

    loss_v, grads, extras = _gns_grads(grad_fn, batch, jax.random.PRNGKey(0))
    full_l, full_g = jax.value_and_grad(loss)(w, batch, None)
    np.testing.assert_allclose(float(loss_v), float(full_l), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(full_g), rtol=1e-6)
    np.testing.assert_allclose(float(extras["gns_s"]), 0.0, atol=1e-4)
    np.testing.assert_allclose(
        float(extras["gns_g2"]), float(optax.global_norm(full_g)) ** 2, rtol=1e-5
    )


def test_gns_grads_detects_noise():
    """With heterogeneous halves the noise-scale numerator S must be > 0 and
    G^2 stays an unbiased |true grad|^2 estimate (here: exact, since the two
    half-gradients average to the full gradient)."""
    from stable_diffusion_pytorch_tpu.trainers.steps import _gns_grads

    w = jnp.asarray([1.0])
    batch = {"x": jnp.asarray([[1.0], [1.0], [5.0], [5.0]])}

    def loss(params, b, key):
        return jnp.mean((b["x"] @ params) ** 2)

    def grad_fn(b, k):
        return jax.value_and_grad(loss)(w, b, k)

    _, grads, extras = _gns_grads(grad_fn, batch, jax.random.PRNGKey(0))
    full_g = jax.grad(loss)(w, batch, None)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(full_g), rtol=1e-6)
    assert float(extras["gns_s"]) > 0.0


def test_noise_offset_and_input_perturbation_reach_the_loss():
    """The offset-noise and input-perturbation knobs must change the computed
    loss for the SAME PRNG key (i.e. they are actually wired into q-sampling),
    and 0.0 must reproduce the baseline exactly."""
    import optax

    from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule
    from stable_diffusion_pytorch_tpu.trainers.steps import make_unet_train_step

    class ZeroModel:
        dtype = jnp.float32

        def apply(self, params, x, t, ctx):
            return jnp.zeros_like(x)

    key = jax.random.PRNGKey(7)
    sched = make_schedule(DDPMConfig(noise_steps=20))
    latents = jax.random.normal(key, (4, 8, 8, 4))
    batch = {"latents": latents, "context_emb": jnp.zeros((4, 77, 8))}
    uncond = jnp.zeros((77, 8))
    tx = optax.sgd(0.0)

    def loss_with(**kw):
        train_step, _ = make_unet_train_step(
            ZeroModel(), None, None, sched, tx,
            train_with_cfg=False, cfg_dropout_prob=0.0, **kw,
        )
        state = TrainState.create({"w": jnp.zeros(())}, tx)
        _, m = jax.jit(train_step)(state, None, None, batch, uncond, key)
        return float(m["loss"])

    base = loss_with()
    assert loss_with(noise_offset=0.0, input_perturbation=0.0) == base
    # with a zero model the loss IS E[target^2]; offset noise inflates the
    # target's variance, so the loss must rise
    off = loss_with(noise_offset=0.5)
    assert off > base * 1.05, (off, base)
    # input perturbation changes only the model INPUT x_t, and the model
    # ignores its input -> loss must be IDENTICAL to baseline
    ip = loss_with(input_perturbation=0.5)
    assert ip == base, (ip, base)

    class EchoXModel:
        dtype = jnp.float32

        def apply(self, params, x, t, ctx):
            return x

    def loss_echo(**kw):
        train_step, _ = make_unet_train_step(
            EchoXModel(), None, None, sched, tx,
            train_with_cfg=False, cfg_dropout_prob=0.0, **kw,
        )
        state = TrainState.create({"w": jnp.zeros(())}, tx)
        _, m = jax.jit(train_step)(state, None, None, batch, uncond, key)
        return float(m["loss"])

    # ...but through an input-sensitive model it must change the loss
    assert loss_echo(input_perturbation=0.5) != loss_echo()


def test_optimizer_state_dtypes_per_config():
    """Optimizer-state storage per config: the default fused AdamW keeps
    f32 moments, --adam-mu-dtype bf16 narrows the first moment (variance
    stays f32), --use-8bit-adam stores int8 block-quantized codes, and
    --no-fused-adamw falls back to the optax chain layout."""
    from stable_diffusion_pytorch_tpu.trainers.adam8bit import _QTensor
    from stable_diffusion_pytorch_tpu.trainers.args import OptimConfig
    from stable_diffusion_pytorch_tpu.trainers.fused_adamw import FusedAdamWState
    from stable_diffusion_pytorch_tpu.trainers.optim import build_optimizer
    from stable_diffusion_pytorch_tpu.trainers.steps import _optimizer_step

    params = {"w": jnp.ones((8, 8), jnp.float32)}
    grads = {"w": jnp.full((8, 8), 0.5, jnp.float32)}

    def run(cfg):
        tx = build_optimizer(cfg, max_train_steps=10)
        state = tx.init(params)
        new_params, state2 = _optimizer_step(tx, grads, state, params)
        moved = float(jnp.abs(new_params["w"] - params["w"]).max()) > 0.0
        return tx, state2, moved

    # default: fused, f32 moments
    tx, s2, moved = run(OptimConfig(scheduler_type="constant"))
    assert isinstance(s2, FusedAdamWState)
    assert s2.mu["w"].dtype == jnp.float32 and s2.nu["w"].dtype == jnp.float32
    assert moved

    # bf16 first moment, f32 variance
    _, s2, moved = run(
        OptimConfig(adam_mu_dtype="bf16", scheduler_type="constant")
    )
    assert s2.mu["w"].dtype == jnp.bfloat16 and s2.nu["w"].dtype == jnp.float32
    assert moved

    # true 8-bit: int8 block-quantized codes + f32 per-block scales
    _, s2, moved = run(
        OptimConfig(use_8bit_adam=True, scheduler_type="constant")
    )
    adam_state = s2[1][0]  # chain(clip, adamw_8bit) -> ScaleByAdam8bitState
    assert isinstance(adam_state.mu["w"], _QTensor)
    assert adam_state.mu["w"].q.dtype == jnp.int8
    assert adam_state.mu["w"].scale.dtype == jnp.float32
    assert moved

    # optax fallback keeps the chain(clip, adamw) state layout
    tx, s2, moved = run(
        OptimConfig(no_fused_adamw=True, scheduler_type="constant")
    )
    assert not hasattr(tx, "apply")
    assert s2[1][0].mu["w"].dtype == jnp.float32
    assert moved
