"""Unified trainer core + UNet / VAE specializations.

The reference duplicates ~550 LoC between its two trainers
(/root/reference/train_unet.py:51-565, train_autoencoder.py:62-529); here one
``Trainer`` core owns the loop, optimizer, checkpointing, resume replay, eval
cadence, metric/image logging, and data-parallel placement, while two small
subclasses define the jitted step functions and image logging.

TPU-native loop design:
- ONE jitted train step per micro-batch (frozen encoders + q-sample + fwd/bwd +
  AdamW inside XLA); gradient accumulation via optax.MultiSteps inside the same
  program — no Python-side accumulation state;
- batch sharded over the ``data`` mesh axis, params replicated, optimizer state
  optionally ZeRO-sharded (--shard-optimizer-state);
- explicit PRNG: the per-micro-step key is fold_in(seed, micro_step), so a
  resumed run replays the identical noise/timestep stream (the reference gets
  this only implicitly by re-seeding + skipping batches).

Reference semantics kept: per-processor batch size meaning
(cfg.train.train_batch_size is PER DEVICE, train_unet.py:320-324), global_step
counts optimizer steps, checkpoint-{step} dirs + "latest" resume + replay math,
keep_last_only, eval cadence including the VAE trainer's off-by-one
((global_step+1) % log_interval, train_autoencoder.py:430 vs train_unet.py:420,
SURVEY §2.4 item 12), 10% CFG dropout, loss curves in float32.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_pytorch_tpu.models.build import resolve_dtype
from stable_diffusion_pytorch_tpu.parallel import mesh as mesh_lib
from stable_diffusion_pytorch_tpu.trainers.optim import build_optimizer, lr_at_step
from stable_diffusion_pytorch_tpu.trainers.steps import (
    TrainState,
    make_textual_inversion_train_step,
    make_unet_train_step,
    make_vae_train_step,
)
from stable_diffusion_pytorch_tpu.utils.checkpoint import (
    CheckpointManager,
    resume_train_state_math,
)
from stable_diffusion_pytorch_tpu.utils.data import DataLoader
from stable_diffusion_pytorch_tpu.utils.tracking import (
    NullTracker,
    Tracker,
    get_logger,
)


class Trainer:
    """Shared loop/ckpt/eval/logging core. Subclasses set ``run_name``,
    implement ``_build`` (models, state, jitted steps) and ``log_images``."""

    run_name = "trainer"
    eval_cadence_offset = 0  # unet: step % k == 0; vae subclass uses (step+1) % k

    def __init__(self, cfg, train_dataset, eval_dataset, logger=None,
                 train_collate=None):
        assert train_dataset is not None, "must specify a training dataset"
        assert eval_dataset is not None or cfg.train.log_interval <= 0, (
            "if passed log_interval > 0, you must specify an evaluation dataset"
        )
        self.cfg = cfg
        self._train_collate = train_collate
        self.logger = logger or get_logger(self.run_name)
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset

        tp = getattr(cfg.parallel, "tensor_parallel", 1) or 1
        self.mesh = mesh_lib.get_mesh(cfg.parallel.num_devices, model_parallel=tp)
        self.tensor_parallel = tp
        if tp > 1:
            # Pallas kernels are GSPMD-opaque: route the flash kernel through
            # shard_map with heads split over the model axis
            from stable_diffusion_pytorch_tpu.ops.attention import set_tp_mesh

            set_tp_mesh(self.mesh)
        self.num_devices = self.mesh.shape[mesh_lib.DATA_AXIS]
        self.dtype = resolve_dtype(cfg.parallel.mixed_precision)

        # per-processor batch size semantics (train_unet.py:320-324); on a
        # multi-host pod each process loads its own disjoint shard of rows
        from stable_diffusion_pytorch_tpu.parallel.distributed import host_shard_info

        shard_id, num_shards = host_shard_info()
        self.global_train_batch = cfg.train.train_batch_size * self.num_devices
        self.global_eval_batch = cfg.train.eval_batch_size * self.num_devices

        # async decode+prefetch per dataloader_num_workers
        # (/root/reference/train_unet.py:152-167 worker semantics)
        num_workers = int(getattr(cfg.dataset, "dataloader_num_workers", 0) or 0)
        self.train_loader = DataLoader(
            train_dataset,
            batch_size=self.global_train_batch // num_shards,
            shuffle=True,
            seed=cfg.train.seed,
            collate=train_collate,
            shard_id=shard_id,
            num_shards=num_shards,
            num_workers=num_workers,
        )
        self.eval_loader = (
            DataLoader(
                eval_dataset,
                batch_size=self.global_eval_batch // num_shards,
                shuffle=False,
                seed=cfg.train.seed,
                shard_id=shard_id,
                num_shards=num_shards,
                num_workers=num_workers,
            )
            if eval_dataset is not None
            else None
        )

        self.ckpt_manager = CheckpointManager(cfg.checkpoint)
        # main-process gating: on a multi-host pod only process 0 opens the
        # wandb run / JSONL stream (reference logs on the main rank only,
        # train_unet.py:111-142); other hosts get a no-op sink
        self.is_main_process = jax.process_index() == 0
        self.tracker = (
            Tracker(cfg.log, self.run_name, config=cfg.to_dict())
            if self.is_main_process
            else NullTracker()
        )
        # auditable degradation: a synthetic-fallback dataset marks every
        # metrics record so a misconfigured data path cannot masquerade as a
        # real-data run
        self._synthetic_fallback = bool(
            getattr(train_dataset, "synthetic_fallback", False)
            or getattr(eval_dataset, "synthetic_fallback", False)
        )
        if self._synthetic_fallback:
            self.tracker.set_persistent(synthetic_fallback=True)

        self.tx = build_optimizer(
            cfg.optim,
            max_train_steps=cfg.train.max_train_steps,
            gradient_accumulation_steps=cfg.train.gradient_accumulation_steps,
            # ZeRO-sharded state: lets the 8-bit optimizer run its fused
            # Pallas kernel per-shard (shard_map over the same placement)
            mesh=self.mesh if cfg.parallel.shard_optimizer_state else None,
        )

        self._build()  # subclass: models, state, jitted steps

    # ------------------------------------------------------------------ #
    # subclass surface
    # ------------------------------------------------------------------ #

    def _build(self) -> None:
        raise NotImplementedError

    def _train_step(self, batch: Dict[str, Any], key) -> Dict[str, Any]:
        raise NotImplementedError

    def _eval_step(self, batch: Dict[str, Any], key) -> jnp.ndarray:
        raise NotImplementedError

    def log_images(self, global_step: int) -> None:
        pass

    # ------------------------------------------------------------------ #
    # shared machinery
    # ------------------------------------------------------------------ #

    def _place_state(self, state: TrainState) -> TrainState:
        """Params replicated, FSDP-sharded, or tensor-parallel; optimizer state
        optionally ZeRO-sharded (layered on top of TP under a 2-D mesh).
        XLA/GSPMD inserts the matching collectives."""
        mesh = self.mesh
        replicate = lambda tree: jax.tree_util.tree_map(  # noqa: E731
            lambda _: mesh_lib.replicated(mesh), tree
        )
        tp = self.tensor_parallel > 1
        fsdp = getattr(self.cfg.parallel, "shard_params", False)
        zero = self.cfg.parallel.shard_optimizer_state

        if tp:
            param_sharding = mesh_lib.tp_shardings(mesh, state.params)
        elif fsdp:
            param_sharding = mesh_lib.zero_shardings(mesh, state.params)
        else:
            param_sharding = replicate(state.params)

        base_opt = (
            mesh_lib.tp_shardings(mesh, state.opt_state)
            if tp
            else replicate(state.opt_state)
        )
        if zero:
            opt_sharding = (
                mesh_lib.combine_zero(mesh, state.opt_state, base_opt)
                if tp
                else mesh_lib.zero_shardings(mesh, state.opt_state)
            )
        else:
            opt_sharding = base_opt
        # DeepSpeed CPU-offload analog (train_unet.py:101-109): optimizer
        # state lives in pinned host memory between steps; XLA streams it in
        # at the jitted update, and the loop copies the new state back out
        self._offload_opt = bool(
            getattr(self.cfg.parallel, "offload_optimizer", False)
        )
        if self._offload_opt and jax.default_backend() == "cpu" and mesh.devices.size == 1:
            # CPU "device" memory IS host RAM (offload is a no-op there), and
            # the single-device host platform lacks the placement custom-call
            self.logger.warning(
                "--offload-optimizer ignored on a single CPU device "
                "(host and device memory coincide)"
            )
            self._offload_opt = False
        if self._offload_opt:
            self._opt_dev_shardings = opt_sharding  # stream-in target inside jit
            opt_sharding = mesh_lib.host_offload_shardings(opt_sharding)
            self._opt_host_shardings = opt_sharding

        ema = state.ema_params
        if ema is not None:
            # EMA shadows shard like the ZeRO state: pure per-step elementwise
            ema_sharding = (
                mesh_lib.tp_shardings(mesh, ema)
                if tp
                else mesh_lib.zero_shardings(mesh, ema)
            )
            ema = jax.device_put(ema, ema_sharding)
        return TrainState(
            step=jax.device_put(state.step, mesh_lib.replicated(mesh)),
            params=jax.device_put(state.params, param_sharding),
            opt_state=jax.device_put(state.opt_state, opt_sharding),
            ema_params=ema,
        )

    def _jit_step(self, train_step):
        """jit a ``(state, *args) -> (state, metrics)`` step. With
        ``--offload-optimizer`` the optimizer state arrives in pinned host
        memory; ops cannot mix memory spaces, so the wrapper streams it to
        device shardings at entry (XLA overlaps the transfer with the
        forward/backward). The loop evicts the new state back to host."""

        def step(state, *args):
            if getattr(self, "_offload_opt", False):
                state = state.replace(
                    opt_state=jax.device_put(
                        state.opt_state, self._opt_dev_shardings
                    )
                )
            return train_step(state, *args)

        return jax.jit(step, donate_argnums=(0,))

    # --- chained dispatch (--steps-per-dispatch) --------------------------- #
    # The axon TPU runtime charges a per-dispatch constant (~20 ms blocking
    # dispatch + ~28 ms loss-scalar roundtrip, measured via SD_TRAIN_PROFILE
    # at reference scale — docs/PERFORMANCE.md). Chaining n train steps into
    # one program via lax.scan amortizes both. No reference analog: torch
    # necessarily launches one step per Python iteration.

    _jit_train_chain = None

    def _chain_args(self):
        """(pre, post) arg tuples spliced around the batch in the raw step
        signature ``train_step(state, *pre, batch, *post, key)``."""
        return (), ()

    def _build_chain(self, train_step):
        """jit a ``(state, pre, post, batches, base_key, m0) -> (state,
        stacked_metrics)`` program scanning the per-step ``train_step`` over
        the leading axis of ``batches``. Per-step PRNG keys are derived
        in-program as ``fold_in(base_key, m0 + i)`` — bit-identical to the
        host-side per-step path. ``m0`` is a traced scalar so chunk position
        never triggers a recompile."""

        def chained(state, pre, post, batches, base_key, m0):
            def body(s, xs):
                b, i = xs
                k = jax.random.fold_in(base_key, m0 + i)
                s2, m = train_step(s, *pre, b, *post, k)
                return s2, m

            n = jax.tree_util.tree_leaves(batches)[0].shape[0]
            return jax.lax.scan(body, state, (batches, jnp.arange(n)))

        return jax.jit(chained, donate_argnums=(0,))

    def _train_chunk(self, batches, base_key, m0: int):
        """Run one chained dispatch; returns metrics stacked [n_steps]."""
        pre, post = self._chain_args()
        self.state, metrics = self._jit_train_chain(
            self.state, pre, post, batches, base_key, jnp.int32(m0)
        )
        return metrics

    def _micro_steps(self, epoch_iter, *, skip_until, micro_step0, accum,
                     ckpt_steps, max_train_steps, base_key, step_timer,
                     phases):
        """Yield per-micro-step metrics for one epoch.

        With ``--steps-per-dispatch n > 1``, chains n optimizer steps
        (n * accum micro steps) into ONE XLA program whenever no host-visible
        boundary — checkpoint save, eval cadence, termination, epoch end —
        falls strictly inside the chunk, and pulls the chunk's stacked scalar
        metrics to host in ONE transfer. Boundaries and epoch remainders fall
        back to the per-step program (exactly 2 compiled train programs).
        The chained program derives the identical fold_in(seed, micro_step)
        keys in-program, so loss streams are bit-comparable across paths.
        """
        cfg = self.cfg
        spd = int(getattr(cfg.train, "steps_per_dispatch", 1) or 1)
        chain_ok = (
            spd > 1
            and self._jit_train_chain is not None
            and not getattr(self, "_offload_opt", False)
        )
        chunk_micros = spd * accum
        log_interval = cfg.train.log_interval
        micro = micro_step0
        buf: list = []
        it = enumerate(epoch_iter)
        exhausted = False

        def chunk_safe(m: int) -> bool:
            if m % accum != 0:  # align chunks to optimizer-step boundaries
                return False
            g = m // accum  # completed optimizer steps
            if g + spd > max_train_steps:
                return False
            for G in range(g + 1, g + spd):
                if (
                    isinstance(ckpt_steps, int)
                    and ckpt_steps > 0
                    and G % ckpt_steps == 0
                ):
                    return False
                if (
                    log_interval
                    and log_interval > 0
                    and (G + self.eval_cadence_offset) % log_interval == 0
                ):
                    return False
            return True

        while True:
            want = chunk_micros if (chain_ok and chunk_safe(micro)) else 1
            t_fetch0 = time.perf_counter()
            while len(buf) < want and not exhausted:
                try:
                    s, b = next(it)
                except StopIteration:
                    exhausted = True
                    break
                if s < skip_until:
                    continue
                buf.append(b)
            # loader wall, part of the yielded per-step wall so that
            # samples_per_sec reflects true throughput incl. input-bound
            # stalls (phase-level attribution to 'fetch' happens inside the
            # timed_iter wrapper around epoch_iter)
            fetch_dt = time.perf_counter() - t_fetch0
            if not buf:
                return

            if want > 1 and len(buf) >= chunk_micros:
                batch_list, buf = buf[:chunk_micros], buf[chunk_micros:]
                t0 = time.perf_counter()
                if phases is not None:
                    place_cm = phases.phase("place")
                    place_cm.__enter__()
                try:
                    # host-side stack counts as placement work
                    stacked = {
                        k: np.stack([bb[k] for bb in batch_list])
                        for k in batch_list[0]
                        if isinstance(batch_list[0][k], np.ndarray)
                    }
                    placed = mesh_lib.put_batch_chunk(self.mesh, stacked)
                finally:
                    if phases is not None:
                        place_cm.__exit__(None, None, None)
                t_disp0 = time.perf_counter()
                metrics = self._train_chunk(placed, base_key, micro)
                host = jax.device_get(metrics)  # one pull per chunk
                t_end = time.perf_counter()
                per_disp = (t_end - t_disp0) / chunk_micros
                per_wall = (fetch_dt + (t_end - t0)) / chunk_micros
                # the FIRST chained dispatch includes the XLA compile, which
                # would otherwise smear chunk_micros compile-inflated samples
                # past StepTimer/PhaseTimer's small warmup — skip the whole
                # first chunk so summary_ms reflects steady state
                chain_warm = getattr(self, "_chain_warm", False)
                self._chain_warm = True
                if not chain_warm:
                    # keep the compile-inflated first chunk separately so a
                    # run that fits in ONE chunk still reports step timing
                    # (marked as such) instead of an empty summary
                    self._chain_first_per_disp = per_disp
                for i in range(chunk_micros):
                    if chain_warm:
                        step_timer.add(per_disp)
                        if phases is not None:
                            phases.add("dispatch", per_disp)
                    micro += 1
                    yield {k: v[i] for k, v in host.items()}, per_wall
            else:
                batch = buf.pop(0)
                if want > 1 and not getattr(self, "_single_warm", False):
                    # a chained run falling back to single-step dispatch
                    # (trailing partial chunk / boundary break) compiles a
                    # SECOND program mid-run; drop that sample so p50/mean
                    # reflect steady state (the fixed warmup=2 was consumed
                    # by the chain phase long ago)
                    self._single_warm = True
                    step_timer.skip_next()
                    if phases is not None:
                        phases.skip_next("dispatch")
                t0 = time.perf_counter()
                key = jax.random.fold_in(base_key, micro)
                if phases is not None:
                    with phases.phase("place"):
                        placed = self._place_batch(batch)
                else:
                    placed = self._place_batch(batch)
                if phases is not None:
                    step_cm = phases.phase("dispatch")
                    step_cm.__enter__()
                try:
                    with step_timer:
                        metrics = self._train_step(placed, key)
                        if getattr(self, "_offload_opt", False):
                            # evict the new moments to pinned host RAM; the
                            # next step's jit streams them back in (device HBM
                            # holds no optimizer state between steps)
                            self.state = self.state.replace(
                                opt_state=jax.device_put(
                                    self.state.opt_state,
                                    self._opt_host_shardings,
                                )
                            )
                        jax.block_until_ready(metrics["loss"])
                finally:
                    if phases is not None:
                        step_cm.__exit__(None, None, None)
                micro += 1
                yield metrics, fetch_dt + (time.perf_counter() - t0)

    def _place_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        usable = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        return mesh_lib.put_batch(self.mesh, usable)

    def _resume(self) -> dict:
        state, resumed_step = self.ckpt_manager.restore(self.state)
        if state is not None:
            self.state = state
            self.logger.info(
                f"Resuming from checkpoint at global step {resumed_step}"
            )
        elif self.cfg.checkpoint.resume_from_checkpoint:
            self.logger.info(
                f"Checkpoint '{self.cfg.checkpoint.resume_from_checkpoint}' does "
                "not exist. Starting a new training run."
            )
        return resume_train_state_math(
            num_batches_per_epoch=len(self.train_loader),
            gradient_accumulation_steps=self.cfg.train.gradient_accumulation_steps,
            max_train_steps=self.cfg.train.max_train_steps,
            max_train_epochs=self.cfg.train.max_train_epochs,
            resumed_global_step=resumed_step,
        )

    def train(self) -> None:
        cfg = self.cfg
        replay = self._resume()
        max_train_steps = replay["max_train_steps"]
        max_train_epochs = replay["max_train_epochs"]
        global_step = replay["global_step"]
        start_epoch = replay["start_epoch"]
        resume_step = replay["resume_step"]
        accum = cfg.train.gradient_accumulation_steps
        resumed = global_step > 0

        ckpt_steps = cfg.checkpoint.checkpointing_steps
        if ckpt_steps is not None and str(ckpt_steps).isdigit():
            ckpt_steps = int(ckpt_steps)

        total_bs = self.global_train_batch * accum
        self.logger.info("****************Start Training******************")
        self.logger.info(f"Total training data: {len(self.train_dataset)}")
        if self.eval_dataset is not None:
            self.logger.info(f"Total eval data: {len(self.eval_dataset)}")
        self.logger.info(f"Total update steps: {max_train_steps}")
        self.logger.info(f"Total Epochs: {max_train_epochs}")
        self.logger.info(f"Total Batch size: {total_bs}")
        self.logger.info(f"Devices: {self.num_devices} ({jax.default_backend()})")
        self.logger.info(f"Resume from epoch={start_epoch}, step={resume_step}")
        self.logger.info("**********************************************")

        from stable_diffusion_pytorch_tpu.utils.profiling import (
            PhaseTimer,
            StepTimer,
        )

        base_key = jax.random.PRNGKey(cfg.train.seed)
        micro_step = global_step * accum
        window_losses = []
        window_wall = 0.0  # summed per-step wall within the accum window
        step_timer = StepTimer(warmup=2)  # skip compile steps
        # SD_TRAIN_PROFILE=1: attribute wall time to host phases (loader
        # fetch / place / dispatch / loss sync) — the reference-scale
        # device-vs-wall gap analysis in docs/PERFORMANCE.md
        phases = (
            PhaseTimer(warmup=2)
            if os.environ.get("SD_TRAIN_PROFILE", "") == "1"
            else None
        )
        done = False
        # observability extensions (beyond the reference): EMA-smoothed
        # gradient-noise-scale and running-statistics loss-spike detection
        gns_s_ema, gns_g2_ema, gns_count = 0.0, 0.0, 0
        spike_thr = float(getattr(cfg.log, "spike_threshold", 0.0) or 0.0)
        loss_mean, loss_var, spike_count = None, 0.0, 0

        for epoch in range(start_epoch, max_train_epochs):
            if done:
                break
            self.train_loader.set_epoch(epoch)
            epoch_iter = (
                phases.timed_iter(self.train_loader, "fetch")
                if phases is not None
                else self.train_loader
            )
            # resume skip (train_unet.py:349-358) is handled by the stepper
            stepper = self._micro_steps(
                epoch_iter,
                skip_until=(
                    resume_step if (resumed and epoch == start_epoch) else -1
                ),
                micro_step0=micro_step,
                accum=accum,
                ckpt_steps=ckpt_steps,
                max_train_steps=max_train_steps,
                base_key=base_key,
                step_timer=step_timer,
                phases=phases,
            )
            for metrics, step_wall in stepper:
                micro_step += 1
                window_losses.append(metrics["loss"])
                window_wall += step_wall

                sync = micro_step % accum == 0
                if sync:
                    global_step += 1
                    # np.asarray(loss) is the true device sync on the axon
                    # runtime (block_until_ready returns early there)
                    if phases is not None:
                        with phases.phase("sync"):
                            loss_val = float(
                                np.mean([np.asarray(l) for l in window_losses])
                            )
                    else:
                        loss_val = float(
                            np.mean([np.asarray(l) for l in window_losses])
                        )
                    window_losses = []
                    lr = lr_at_step(cfg.optim, max_train_steps, global_step)
                    # wall attributed to this window's train steps, incl.
                    # loader fetch (chunked dispatch spreads its chunk wall
                    # evenly); excludes eval/checkpoint/log time so the rate
                    # is comparable across --steps-per-dispatch settings
                    dt = window_wall
                    window_wall = 0.0
                    record = {
                        "train_loss": loss_val,
                        "lr": lr,
                        "samples_per_sec": total_bs / max(dt, 1e-9),
                        **step_timer.summary_ms(),
                        **(phases.summary_ms() if phases is not None else {}),
                    }
                    if "gns_s" in metrics:
                        # EMA-smooth the two estimator halves separately, then
                        # report the ratio B_noise = E[S]/E[G^2] (the bias
                        # corrections cancel in the ratio); warm up 5 steps
                        d = 0.95
                        gns_count += 1
                        gns_s_ema = d * gns_s_ema + (1 - d) * float(
                            np.asarray(metrics["gns_s"])
                        )
                        gns_g2_ema = d * gns_g2_ema + (1 - d) * float(
                            np.asarray(metrics["gns_g2"])
                        )
                        if gns_count >= 5 and gns_g2_ema > 0:
                            record["grad_noise_scale"] = gns_s_ema / gns_g2_ema
                    if spike_thr > 0:
                        if (
                            loss_mean is not None
                            and global_step > 10
                            and loss_var > 0
                            and loss_val
                            > loss_mean + spike_thr * (loss_var**0.5)
                        ):
                            spike_count += 1
                            record["loss_spike"] = spike_count
                            self.logger.warning(
                                f"LOSS SPIKE at step {global_step}: "
                                f"loss={loss_val:.5f} vs running "
                                f"mean={loss_mean:.5f} std={loss_var**0.5:.5f} "
                                f"(threshold {spike_thr}x)"
                            )
                        if loss_mean is None:
                            loss_mean = loss_val
                        else:
                            dm = 0.98
                            delta = loss_val - loss_mean
                            loss_mean += (1 - dm) * delta
                            loss_var = dm * (loss_var + (1 - dm) * delta * delta)
                    self.tracker.log(record, step=global_step)
                    if global_step % 10 == 0 or global_step <= 3:
                        self.logger.info(
                            f"step {global_step}/{max_train_steps} "
                            f"loss={loss_val:.5f} lr={lr:.2e} "
                            f"({total_bs / max(dt, 1e-9):.1f} samples/s)"
                        )
                    if (
                        isinstance(ckpt_steps, int)
                        and ckpt_steps > 0
                        and global_step % ckpt_steps == 0
                    ):
                        path = self.ckpt_manager.save(global_step, self.state)
                        self.logger.info(f"Saved state to {path}")

                # ---------------- evaluation ---------------- #
                # runs BEFORE the termination check so a run whose final step
                # lands on the eval cadence still gets its final eval/image log
                # (the reference evaluates before terminating, train_unet.py:416-450)
                if (
                    sync
                    and global_step > 0
                    and cfg.train.log_interval > 0
                    and (global_step + self.eval_cadence_offset)
                    % cfg.train.log_interval
                    == 0
                ):
                    self.evaluate(global_step)
                    if cfg.log.log_image and self.is_main_process:
                        self.log_images(global_step)

                if global_step >= max_train_steps:
                    done = True
                    break

            # epoch checkpointing (fixing the reference's stale-path bug,
            # train_unet.py:469-481)
            if ckpt_steps == "epoch":
                path = self.ckpt_manager.save(global_step, self.state, epoch=epoch)
                self.logger.info(f"Saved state to {path}")

        if phases is not None:
            # StepTimer stats included so the one-line breakdown carries the
            # headline step_ms_p50 (tools/hw_session.py parses this line for
            # the chained-dispatch A/B)
            summary = {**step_timer.summary_ms(), **phases.summary_ms()}
            if not summary and getattr(self, "_chain_first_per_disp", None):
                summary = {
                    "step_ms_p50_compile_inflated": (
                        self._chain_first_per_disp * 1e3
                    )
                }
            if summary:
                self.logger.info(
                    "SD_TRAIN_PROFILE phase breakdown (ms): "
                    + ", ".join(f"{k}={v:.1f}" for k, v in summary.items())
                )
        self.tracker.finish()

    def evaluate(self, global_step: int) -> Optional[float]:
        if self.eval_loader is None:
            return None
        self.logger.info(f"Evaluate on eval dataset [len: {len(self.eval_dataset)}]")
        losses = []
        key = jax.random.PRNGKey(self.cfg.train.seed + 1)
        for i, batch in enumerate(self.eval_loader):
            losses.append(
                np.asarray(
                    self._eval_step(self._place_batch(batch), jax.random.fold_in(key, i))
                )
            )
        if not losses:
            return None
        eval_loss = float(np.mean(losses))
        self.logger.info(f"global step {global_step}: eval_loss: {eval_loss}")
        self.tracker.log({"eval_loss": eval_loss}, step=global_step)
        return eval_loss


class UNetTrainer(Trainer):
    """Latent-diffusion fine-tuning: frozen CLIP + frozen VAE, trainable UNet
    (train_unet.py:51-565)."""

    run_name = "train_unet"
    eval_cadence_offset = 0

    def __init__(self, model, cfg, train_dataset, eval_dataset, logger=None,
                 compat=None, train_collate=None):
        self.model = model
        self.compat = compat
        super().__init__(
            cfg, train_dataset, eval_dataset, logger, train_collate=train_collate
        )

    def _build(self) -> None:
        cfg = self.cfg
        compat = self.compat
        model = self.model

        if (
            bool(model.noise_scheduler.alphas_cumprod[-1] <= 0.0)
            and getattr(cfg.train, "prediction_type", "epsilon") == "epsilon"
        ):
            raise ValueError(
                "--zero-terminal-snr trains a timestep with SNR 0, where the "
                "eps objective is degenerate (the target IS the input); use "
                "--prediction-type v_prediction (Lin et al. 2023 §3.1)"
            )

        lora_rank = int(getattr(cfg.train, "lora_rank", 0) or 0)
        self._lora_transform = None
        trainable_params = model.unet_params
        if lora_rank > 0:
            from stable_diffusion_pytorch_tpu.models import lora as lora_lib

            alpha = float(getattr(cfg.train, "lora_alpha", 0.0) or 0.0) or lora_rank
            self._lora_scale = alpha / lora_rank
            self._lora_base = mesh_lib.put_replicated(self.mesh, model.unet_params)
            trainable_params = lora_lib.init_lora(
                jax.random.PRNGKey(cfg.train.seed),
                model.unet_params,
                lora_rank,
                getattr(cfg.train, "lora_targets", "attn"),
            )
            base = self._lora_base
            scale = self._lora_scale
            self._lora_transform = lambda lp: lora_lib.merge_lora(base, lp, scale)
            if self.logger:
                self.logger.info(
                    f"LoRA rank {lora_rank} (alpha {alpha:g}, "
                    f"targets {getattr(cfg.train, 'lora_targets', 'attn')}): "
                    f"{lora_lib.lora_param_count(trainable_params):,} trainable "
                    "params; base UNet frozen"
                )

        train_step, eval_step = make_unet_train_step(
            model.unet,
            model.text_encoder.module,
            model.autoencoder,
            model.noise_scheduler,
            self.tx,
            guidance_scale=cfg.train.guidance_scale,
            train_with_cfg=bool(compat and compat.train_with_cfg),
            reference_cfg_formula=bool(compat and compat.cfg_formula),
            cfg_dropout_prob=float(getattr(cfg.train, "cfg_dropout_prob", 0.1)),
            whole_batch_cfg_dropout=bool(compat and compat.reference_compat),
            ema_decay=cfg.train.ema_decay,
            random_flip=bool(
                cfg.dataset.random_flip
                and getattr(cfg.dataset, "device_preprocess", False)
            ),
            gradient_accumulation_steps=cfg.train.gradient_accumulation_steps,
            grad_noise_scale=bool(
                getattr(cfg.log, "log_grad_noise_scale", False)
            ),
            prediction_type=getattr(cfg.train, "prediction_type", "epsilon"),
            snr_gamma=float(getattr(cfg.train, "snr_gamma", 0.0) or 0.0),
            noise_offset=float(getattr(cfg.train, "noise_offset", 0.0) or 0.0),
            input_perturbation=float(
                getattr(cfg.train, "input_perturbation", 0.0) or 0.0
            ),
            param_transform=self._lora_transform,
            prior_loss_weight=(
                float(getattr(cfg.train, "prior_loss_weight", 0.0) or 0.0)
                if getattr(cfg.train, "with_prior_preservation", False)
                else 0.0
            ),
        )
        self._jit_train = self._jit_step(train_step)
        self._jit_eval = jax.jit(eval_step)
        self._jit_train_chain = self._build_chain(train_step)

        self.state = self._place_state(
            TrainState.create(
                trainable_params, self.tx, with_ema=cfg.train.ema_decay > 0
            )
        )
        self.clip_params = mesh_lib.put_replicated(self.mesh, model.text_encoder.params)
        self.vae_params = mesh_lib.put_replicated(self.mesh, model.autoencoder_params)
        uncond_tokens = jnp.asarray(model.text_encoder.tokenize([""]).input_ids[0])
        self.uncond_eval = mesh_lib.put_replicated(self.mesh, uncond_tokens)
        if getattr(self.train_dataset, "has_text_cache", False):
            # cached-text pipeline: the train uncond slot carries the "" EMBEDDING
            # (eval batches are uncached pixels+ids and keep the token path)
            self.uncond_train = mesh_lib.put_replicated(
                self.mesh, jnp.asarray(self.train_dataset.uncond_emb)
            )
        else:
            self.uncond_train = self.uncond_eval

    def _chain_args(self):
        return (self.clip_params, self.vae_params), (self.uncond_train,)

    def _train_step(self, batch, key):
        self.state, metrics = self._jit_train(
            self.state, self.clip_params, self.vae_params, batch,
            self.uncond_train, key,
        )
        return metrics

    def _eval_step(self, batch, key):
        return self._jit_eval(
            self.state.params, self.clip_params, self.vae_params, batch,
            self.uncond_eval, key,
        )

    def log_images(self, global_step: int) -> None:
        """Sample an image at the reference's eval prompt (train_unet.py:452-465),
        with 50-step DDIM instead of the reference's full 1000-step loop."""
        from stable_diffusion_pytorch_tpu.pipeline import sample as sample_pipeline

        if self._lora_transform is not None:
            self.model.unet_params = jax.device_get(
                self._lora_transform(self.state.params)
            )
        else:
            self.model.unet_params = jax.device_get(self.state.params)
        prompt = "a white cat wearing a hat"
        outs = sample_pipeline(
            self.model,
            image_size=self.cfg.dataset.resolution,
            prompt=prompt,
            time_steps=50,
            guidance_scale=self.cfg.train.guidance_scale,
            save_dir="output",
            sampler="ddim",
            seed=self.cfg.train.seed,
            name="unet_sample",
        )
        self.tracker.log_images({"sampled image": outs[0]}, step=global_step)


class TextualInversionTrainer(Trainer):
    """Textual inversion (Gal et al. 2022): everything frozen except K learned
    embedding vectors for a placeholder token. No reference counterpart.

    The script must have called ``model.text_encoder.add_textual_inversion``
    before constructing the trainer (it defines the sentinel ids the datasets'
    tokenization already used)."""

    run_name = "train_textual_inversion"
    eval_cadence_offset = 0

    def __init__(self, model, cfg, train_dataset, eval_dataset, logger=None):
        self.model = model
        super().__init__(cfg, train_dataset, eval_dataset, logger)

    def _build(self) -> None:
        cfg = self.cfg
        model = self.model
        te = model.text_encoder
        assert te._ti is not None, (
            "call model.text_encoder.add_textual_inversion(...) before "
            "building the TextualInversionTrainer"
        )
        self._placeholder, pids, vectors = te._ti

        train_step, eval_step = make_textual_inversion_train_step(
            model.unet,
            te.module,
            model.autoencoder,
            model.noise_scheduler,
            self.tx,
            placeholder_ids=pids,
            ema_decay=cfg.train.ema_decay,
            gradient_accumulation_steps=cfg.train.gradient_accumulation_steps,
        )
        self._jit_train = self._jit_step(train_step)
        self._jit_eval = jax.jit(eval_step)
        self._jit_train_chain = self._build_chain(train_step)

        self.state = self._place_state(
            TrainState.create(
                {"ti": jnp.asarray(vectors, jnp.float32)},
                self.tx,
                with_ema=cfg.train.ema_decay > 0,
            )
        )
        self.unet_params = mesh_lib.put_replicated(self.mesh, model.unet_params)
        self.clip_params = mesh_lib.put_replicated(self.mesh, te.params)
        self.vae_params = mesh_lib.put_replicated(self.mesh, model.autoencoder_params)

        if self.is_main_process:
            # sidecar so sampling can rebuild the tokenizer mapping
            import json

            os.makedirs(cfg.checkpoint.ckpt_dir, exist_ok=True)
            with open(
                os.path.join(cfg.checkpoint.ckpt_dir, "textual_inversion.json"), "w"
            ) as f:
                json.dump(
                    {
                        "placeholder_token": self._placeholder,
                        "num_vectors": int(len(pids)),
                    },
                    f,
                )

    def _chain_args(self):
        return (self.unet_params, self.clip_params, self.vae_params), ()

    def _train_step(self, batch, key):
        self.state, metrics = self._jit_train(
            self.state, self.unet_params, self.clip_params, self.vae_params,
            batch, key,
        )
        return metrics

    def _eval_step(self, batch, key):
        return self._jit_eval(
            self.state.params, self.unet_params, self.clip_params,
            self.vae_params, batch, key,
        )

    def log_images(self, global_step: int) -> None:
        from stable_diffusion_pytorch_tpu.pipeline import sample as sample_pipeline

        self.model.text_encoder.set_textual_inversion_vectors(
            jax.device_get(self.state.params["ti"])
        )
        outs = sample_pipeline(
            self.model,
            image_size=self.cfg.dataset.resolution,
            prompt=f"a photo of a {self._placeholder}",
            time_steps=50,
            guidance_scale=self.cfg.train.guidance_scale,
            save_dir="output",
            sampler="ddim",
            seed=self.cfg.train.seed,
            name="ti_sample",
        )
        self.tracker.log_images({"sampled image": outs[0]}, step=global_step)


class ControlNetTrainer(Trainer):
    """ControlNet training (Zhang et al. 2023): frozen UNet/VAE/CLIP, trainable
    control branch initialized as a copy of the UNet encoder. No reference
    counterpart (ecosystem analog: diffusers train_controlnet.py)."""

    run_name = "train_controlnet"
    eval_cadence_offset = 0

    def __init__(self, model, controlnet_module, cfg, train_dataset,
                 eval_dataset, logger=None, train_collate=None):
        self.model = model
        self.controlnet = controlnet_module
        super().__init__(
            cfg, train_dataset, eval_dataset, logger, train_collate=train_collate
        )

    def _build(self) -> None:
        from stable_diffusion_pytorch_tpu.models.controlnet import (
            ControlledUNetModel,
            init_controlnet_from_unet,
        )
        from stable_diffusion_pytorch_tpu.trainers.steps import (
            make_controlnet_train_step,
        )

        cfg = self.cfg
        model = self.model
        res = cfg.dataset.resolution
        lat = model.latent_shape(1, res)

        cn_params = self.controlnet.init(
            jax.random.PRNGKey(cfg.train.seed),
            jnp.zeros(lat, jnp.float32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, model.text_encoder.max_seq_len, 768), jnp.float32),
            jnp.zeros((1, res, res, self.controlnet.hint_channels), jnp.float32),
        )
        # the paper's warm start: the control branch begins as the (possibly
        # pretrained) UNet encoder
        cn_params = init_controlnet_from_unet(model.unet_params, cn_params)

        controlled = ControlledUNetModel(unet=model.unet, controlnet=self.controlnet)
        train_step, eval_step = make_controlnet_train_step(
            controlled,
            model.text_encoder.module,
            model.autoencoder,
            model.noise_scheduler,
            self.tx,
            cfg_dropout_prob=float(getattr(cfg.train, "cfg_dropout_prob", 0.5)),
            ema_decay=cfg.train.ema_decay,
            gradient_accumulation_steps=cfg.train.gradient_accumulation_steps,
        )
        self._jit_train = self._jit_step(train_step)
        self._jit_eval = jax.jit(eval_step)
        self._jit_train_chain = self._build_chain(train_step)

        self.state = self._place_state(
            TrainState.create(cn_params, self.tx, with_ema=cfg.train.ema_decay > 0)
        )
        self.unet_params = mesh_lib.put_replicated(self.mesh, model.unet_params)
        self.clip_params = mesh_lib.put_replicated(self.mesh, model.text_encoder.params)
        self.vae_params = mesh_lib.put_replicated(self.mesh, model.autoencoder_params)
        uncond_tokens = jnp.asarray(model.text_encoder.tokenize([""]).input_ids[0])
        self.uncond = mesh_lib.put_replicated(self.mesh, uncond_tokens)

    def _chain_args(self):
        return (self.unet_params, self.clip_params, self.vae_params), (
            self.uncond,
        )

    def _train_step(self, batch, key):
        self.state, metrics = self._jit_train(
            self.state, self.unet_params, self.clip_params, self.vae_params,
            batch, self.uncond, key,
        )
        return metrics

    def _eval_step(self, batch, key):
        return self._jit_eval(
            self.state.params, self.unet_params, self.clip_params,
            self.vae_params, batch, self.uncond, key,
        )

    def log_images(self, global_step: int) -> None:
        """Sample steered by the first eval row's hint."""
        from stable_diffusion_pytorch_tpu.utils.data import detransform, to_img

        model = self.model
        model.attach_controlnet(self.controlnet, jax.device_get(self.state.params))
        row = self.eval_dataset[0]
        hint = jnp.asarray(row["hint"])[None]
        ctx = model.encode_prompts([row.get("text", "")])
        key = jax.random.PRNGKey(self.cfg.train.seed)
        noise = jax.random.normal(
            key, model.latent_shape(1, self.cfg.dataset.resolution),
            model.unet.dtype,
        )
        x0 = model.sample(
            noised_sample=noise,
            context_emb=ctx.astype(model.unet.dtype),
            guidance_scale=self.cfg.train.guidance_scale,
            time_steps=50,
            sampler="ddim",
            key=key,
            control_hint=hint,
        )
        img = np.asarray(model.decode_latent(x0).astype(jnp.float32))[0]
        digit = detransform(img)
        to_img(digit, output_path="output", name="controlnet_sample")
        self.tracker.log_images({"sampled image": digit}, step=global_step)


class AutoencoderTrainer(Trainer):
    """KL-VAE training (train_autoencoder.py:62-529) with the broken reference
    loss path fixed by default (batch-mean KL; see CompatConfig.kl_per_example0)."""

    run_name = "train_autoencoder"
    eval_cadence_offset = 1  # (global_step + 1) % log_interval, SURVEY §2.4 item 12

    def __init__(
        self, vae_module, vae_params, cfg, train_dataset, eval_dataset,
        test_images=None, logger=None, compat=None,
    ):
        self.vae_module = vae_module
        self.init_vae_params = vae_params
        self.compat = compat
        self.test_images = test_images or []
        super().__init__(cfg, train_dataset, eval_dataset, logger)

    def _build(self) -> None:
        train_step, eval_step = make_vae_train_step(
            self.vae_module,
            self.tx,
            kl_weight=self.cfg.model.autoencoder.kl_weight,
            kl_per_example0=bool(self.compat and self.compat.kl_per_example0),
            ema_decay=self.cfg.train.ema_decay,
            random_flip=bool(
                self.cfg.dataset.random_flip
                and getattr(self.cfg.dataset, "device_preprocess", False)
            ),
            gradient_accumulation_steps=self.cfg.train.gradient_accumulation_steps,
            grad_noise_scale=bool(
                getattr(self.cfg.log, "log_grad_noise_scale", False)
            ),
        )
        self._jit_train = self._jit_step(train_step)
        self._jit_eval = jax.jit(eval_step)
        self._jit_train_chain = self._build_chain(train_step)
        self.state = self._place_state(
            TrainState.create(
                self.init_vae_params, self.tx, with_ema=self.cfg.train.ema_decay > 0
            )
        )

    def _train_step(self, batch, key):
        self.state, metrics = self._jit_train(self.state, batch, key)
        return metrics

    def _eval_step(self, batch, key):
        return self._jit_eval(self.state.params, batch, key)

    def recon(self, image: np.ndarray) -> np.ndarray:
        """Reconstruct one [-1,1] HWC image -> HWC uint8
        (train_autoencoder.py:509-516)."""
        from stable_diffusion_pytorch_tpu.utils.data import detransform

        img = jnp.asarray(image)[None]
        recon, _ = self.vae_module.apply(
            self.state.params, img, sample_key=jax.random.PRNGKey(0)
        )
        return detransform(np.asarray(recon.astype(jnp.float32)))

    def log_images(self, global_step: int) -> None:
        from stable_diffusion_pytorch_tpu.utils.data import detransform, to_img

        if not self.test_images:
            return
        recons = [self.recon(img) for img in self.test_images]
        os.makedirs("output", exist_ok=True)
        to_img(recons[0], output_path="output", name="autoencoder")
        self.tracker.log_images(
            {
                "original_imgs": [detransform(i) for i in self.test_images],
                "recon_imgs": recons,
            },
            step=global_step,
        )
